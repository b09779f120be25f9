package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.engine.Browser
import graft.model.{Aggregate, CubeModel, Dimension, Measure}

/** Cube declarations over the driver's deterministic TPC-H-ish testdata
  * (TESTDATA.md). The engine is model-driven (SURVEY.md §7.1), so the same
  * Browser that serves OpenAPC cubes serves these; they mirror the openapc
  * cube's shape (flat dims + sum/count/avg/stddev/count_distinct — see
  * FIXTURES.md §5).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Schema-adaptive `ts` normalizer for the events table. The driver's
    * testdata has shipped `events.ts` under two physical encodings:
    * TIMESTAMP(NANOS), which Spark reads as a raw long (under
    * spark.sql.legacy.parquet.nanosAsLong — set in every session builder
    * here) and must be truncated nanos→micros with integer division (a
    * double division would lose precision: epoch-nanos ≈ 1.7e18 > 2^53);
    * and standard TIMESTAMP(micros), which Spark reads as TimestampType
    * directly. Branch on the observed schema instead of hard-wiring one.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // All engine sessions pin spark.sql.session.timeZone=UTC, so this
        // cast is wall-clock preserving and matches DuckDB's naive read.
        // TimestampType is required downstream (watermarks, unix_micros).
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** `ts` as an epoch-micros long column, whichever physical encoding the
    * parquet file uses (see [[normalizeEventTs]]).
    */
  def eventTsMicros(df: DataFrame): org.apache.spark.sql.Column =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(table(spark, dir, "events"))
}

object TestCubes {
  import Tables.table

  /** `l_shipyear` plays the role of the reference's `period` dimension — the
    * single rangeable dim (HOWTO.md:77-79). Cast to int on both sides of the
    * oracle (DuckDB `year()` returns BIGINT).
    */
  def lineitemDf(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .withColumn("l_shipyear", year(col("l_shipdate")).cast(IntegerType))

  val lineitemModel: CubeModel = CubeModel(
    name = "lineitem",
    table = "lineitem",
    label = "Lineitem facts",
    dimensions = Seq(
      Dimension("l_returnflag"),
      Dimension("l_linestatus"),
      Dimension("l_suppkey"),
      Dimension("l_partkey"),
      Dimension("l_orderkey"),
      Dimension("l_linenumber"),
      Dimension("l_shipyear", rangeable = true)),
    measures = Seq(
      Measure("l_extendedprice", decimalScale = Some(2)),
      Measure("l_quantity", decimalScale = Some(2)),
      Measure("l_discount", decimalScale = Some(2))),
    aggregates = Seq(
      Aggregate("price_sum", "sum", Some("l_extendedprice")),
      Aggregate("n_items", "count", None),
      Aggregate("price_avg", "avg", Some("l_extendedprice")),
      Aggregate("price_stddev", "stddev", Some("l_extendedprice")),
      Aggregate("n_orders", "count_distinct", Some("l_orderkey")),
      Aggregate("qty_sum", "sum", Some("l_quantity"))),
    // NOT declared unique: the synthetic corpus violates TPC-H's
    // (orderkey, linenumber) primary-key contract (~20% duplicate keys),
    // so facts pagination keeps the full-width tie-break for determinism
    factKey = Seq("l_orderkey", "l_linenumber"))

  def lineitem(spark: SparkSession, dir: String): Browser =
    new Browser(lineitemModel, lineitemDf(spark, dir))

  val ordersModel: CubeModel = CubeModel(
    name = "orders",
    table = "orders",
    label = "Order facts",
    dimensions = Seq(
      Dimension("o_orderstatus"),
      Dimension("o_orderpriority"),
      Dimension("o_custkey"),
      Dimension("o_orderkey"),
      Dimension("o_year", rangeable = true)),
    measures = Seq(Measure("o_totalprice", decimalScale = Some(2))),
    aggregates = Seq(
      Aggregate("total_sum", "sum", Some("o_totalprice")),
      Aggregate("n_rows", "count", None),
      Aggregate("total_avg", "avg", Some("o_totalprice")),
      Aggregate("total_stddev", "stddev", Some("o_totalprice")),
      Aggregate("n_custs", "count_distinct", Some("o_custkey"))),
    // TPC-H contract: o_orderkey is the orders primary key
    factKey = Seq("o_orderkey"), factKeyUnique = true)

  def ordersDf(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")).cast(IntegerType))

  def orders(spark: SparkSession, dir: String): Browser =
    new Browser(ordersModel, ordersDf(spark, dir))
}
