package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf-multiplier for the EMPIRICAL scale validation (BENCH_sf1): replicates
  * the driver's sf0.1 corpus `factor`× into a new directory, preserving the
  * join graph and data shapes so every query still makes sense:
  *
  *  - dims (region, nation, customer, supplier, part) copy through —
  *    lineitem/orders foreign keys into them stay valid, and at real scale
  *    dimension growth is sublinear anyway;
  *  - fact keys remap as key*factor+rep, applied to BOTH sides of every
  *    intra-fact join (l_orderkey ↔ o_orderkey), so join fan-outs scale
  *    linearly instead of quadratically;
  *  - document text gets a per-replica suffix token and embeddings a
  *    per-replica perturbation of one component, so dedup/ANN selectivity
  *    scales instead of collapsing into factor-sized duplicate groups
  *    (x05 would otherwise report every row a dup — a different workload);
  *  - events keep their timestamps (densification, the realistic growth
  *    mode for a fixed observation window).
  *
  * Usage: ScaleUp <srcSfDir> <dstDir> [factor=10]. The artifact consumer
  * is `Bench` with SPARK_GRAFT_SF_DIR=<dstDir>.
  */
object ScaleUp {

  private def reps(spark: SparkSession, factor: Int) = {
    val col = explode(array((0 until factor).map(lit): _*)).as("rep")
    (df: DataFrame) => df.withColumn("rep", col)
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rep = reps(spark, factor)
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      write(read(t), t)

    write(rep(read("orders"))
      .withColumn("o_orderkey", col("o_orderkey") * factor + col("rep"))
      .drop("rep"), "orders")
    write(rep(read("lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") * factor + col("rep"))
      .drop("rep"), "lineitem")
    write(rep(read("events"))
      .withColumn("event_id", col("event_id") * factor + col("rep"))
      .drop("rep"), "events")
    write(rep(read("documents"))
      .withColumn("doc_id", col("doc_id") * factor + col("rep"))
      .withColumn("text",
        when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zrep"), col("rep"))))
      .withColumn("n_chars", length(col("text")))
      .drop("rep"), "documents")
    write(rep(read("embeddings"))
      .withColumn("vec_id", col("vec_id") * factor + col("rep"))
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + col("rep").cast("float") * lit(0.001f))
            .otherwise(x)))
      .drop("rep"), "embeddings")

    println(s"scaled $src -> $dst x$factor")
    spark.stop()
  }
}
