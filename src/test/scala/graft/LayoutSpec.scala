package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sources.Layout

/** The layout utilities must demonstrably change what the scan READS, not
  * just where files land: point lookups over the range-sorted layout prune
  * to a couple of row groups; partition layout prunes directories.
  */
class LayoutSpec extends SparkSpec {

  /** Rows the parquet reader actually produced (post row-group pruning). */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect() // execute so metrics populate
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.getOrElse(fail("no FileSourceScanExec in plan"))
  }

  test("range-sorted layout: point lookup reads a fraction of the rows") {
    val li = Tables.table(spark, sf("sf0.01"), "lineitem")
    val total = li.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
    // unsorted baseline: same small row groups, random key order
    li.orderBy(rand(7)).coalesce(1).write
      .option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(s"$tmp/unsorted")
    Layout.writeSorted(li, s"$tmp/sorted", Seq("l_orderkey"),
      numFiles = 2, targetRowGroupBytes = 64 * 1024)
    val key = li.select(max(col("l_orderkey"))).collect().head.getLong(0)
    def lookup(path: String): Long =
      scanOutputRows(spark.read.parquet(path).filter(col("l_orderkey") === key))
    val sortedRead = lookup(s"$tmp/sorted")
    val unsortedRead = lookup(s"$tmp/unsorted")
    // the sorted layout must skip most row groups; the unsorted one cannot
    assert(sortedRead < total / 4,
      s"sorted read $sortedRead of $total — row-group pruning not effective")
    assert(sortedRead < unsortedRead,
      s"sorted=$sortedRead !< unsorted=$unsortedRead")
    // both layouts agree on the answer
    assert(spark.read.parquet(s"$tmp/sorted").filter(col("l_orderkey") === key).count() ==
      li.filter(col("l_orderkey") === key).count())
  }

  test("partitioned layout: partition pruning drops directories from the scan") {
    val li = Tables.table(spark, sf("sf0.01"), "lineitem")
      .withColumn("l_shipyear", year(col("l_shipdate")))
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toString
    Layout.writePartitioned(li, s"$tmp/by_year", Seq("l_shipyear"))
    val q = spark.read.parquet(s"$tmp/by_year").filter(col("l_shipyear") === 1994)
    q.collect()
    val plan = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collectLeaves().collectFirst { case s: FileSourceScanExec => s }.get
    // partition filter present and only one partition directory selected
    assert(scan.partitionFilters.nonEmpty, "no partition filters on scan")
    assert(scan.relation.location.inputFiles.length >
      scan.metrics("numFiles").value,
      "scan did not prune partitions")
    assert(q.count() == li.filter(col("l_shipyear") === 1994).count())
  }

  test("bucketed layout: equi-join on the bucket key runs with NO shuffle") {
    val li = Tables.table(spark, sf("sf0.01"), "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val ord = Tables.table(spark, sf("sf0.01"), "orders")
      .select("o_orderkey", "o_orderpriority")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    Layout.writeBucketed(li, "spec_li_b", s"$tmp/li", "l_orderkey", 4,
      Seq("l_orderkey"))
    Layout.writeBucketed(ord, "spec_ord_b", s"$tmp/ord", "o_orderkey", 4,
      Seq("o_orderkey"))
    // forbid broadcast so the join would OTHERWISE shuffle both sides
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val joined = spark.table("spec_li_b")
        .join(spark.table("spec_ord_b"), col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join still shuffles:\n$plan")
      // and the result is the plain-join result
      assert(joined.count() ==
        li.join(ord, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS spec_li_b")
      spark.sql("DROP TABLE IF EXISTS spec_ord_b")
    }
  }

  test("z-ordered layout prunes on BOTH dims; single-sort prunes on one") {
    val li = Tables.table(spark, sf("sf0.01"), "lineitem")
    val tmp = java.nio.file.Files.createTempDirectory("graft-z").toString
    Layout.writeSorted(li, s"$tmp/by_okey", Seq("l_orderkey"),
      numFiles = 2, targetRowGroupBytes = 64 * 1024)
    Layout.writeZOrdered(li, s"$tmp/z", Seq("l_orderkey", "l_partkey"),
      numFiles = 2, targetRowGroupBytes = 64 * 1024)
    val total = li.count()
    // a ~6% RANGE band per dim: with random values every row group of the
    // wrong-sorted layout intersects the band (no pruning possible), while
    // z-order groups cover hyper-rectangles and skip most of them
    val pmax = li.select(max(col("l_partkey"))).collect().head.getLong(0)
    val omax = li.select(max(col("l_orderkey"))).collect().head.getLong(0)
    def band(path: String, c: String, lo: Long, hi: Long): Long =
      scanOutputRows(spark.read.parquet(path)
        .filter(col(c) >= lo && col(c) <= hi))
    val (pLo, pHi) = (pmax - pmax / 16, pmax)
    val (oLo, oHi) = (omax - omax / 16, omax)
    // the single-sort layout cannot prune a band on the second dim ...
    assert(band(s"$tmp/by_okey", "l_partkey", pLo, pHi) > (total * 3) / 4,
      "unexpected: orderkey-sorted layout pruned a partkey band")
    // ... the z-order prunes bands on BOTH dims
    val zPart = band(s"$tmp/z", "l_partkey", pLo, pHi)
    val zOrd = band(s"$tmp/z", "l_orderkey", oLo, oHi)
    assert(zPart < total / 2, s"z partkey band read $zPart of $total")
    assert(zOrd < total / 2, s"z orderkey band read $zOrd of $total")
    // and the data survives the rewrite intact
    assert(spark.read.parquet(s"$tmp/z").count() == total)
    assert(spark.read.parquet(s"$tmp/z")
      .filter(col("l_partkey").between(pLo, pHi)).count() ==
      li.filter(col("l_partkey").between(pLo, pHi)).count())
  }

  test("quantile z-order prunes a dense-region band that equal-width cannot") {
    // heavy-tailed dim: 90% of rows in [0, 100), 10% flung to ~1e10.
    // Equal-width buckets over [0, max] put ALL dense rows in bucket 0 —
    // a band inside the dense region then reads ~everything; quantile
    // boundaries subdivide the dense mass and restore pruning.
    val li = Tables.table(spark, sf("sf0.01"), "lineitem")
      .withColumn("skewed",
        when(col("l_orderkey") % 10 === 0,
          (col("l_orderkey") % 1000) * 10000000L)
          .otherwise(col("l_orderkey") % 100))
    val total = li.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft-zq").toString
    Layout.writeZOrdered(li, s"$tmp/eq", Seq("skewed", "l_partkey"),
      numFiles = 2, targetRowGroupBytes = 64 * 1024)
    Layout.writeZOrdered(li, s"$tmp/q", Seq("skewed", "l_partkey"),
      numFiles = 2, targetRowGroupBytes = 64 * 1024, quantileBuckets = true)
    def band(path: String): Long =
      scanOutputRows(spark.read.parquet(path)
        .filter(col("skewed") >= 10 && col("skewed") <= 20))
    val eqRead = band(s"$tmp/eq")
    val qRead = band(s"$tmp/q")
    assert(qRead < total / 2, s"quantile z-order read $qRead of $total")
    assert(qRead < eqRead,
      s"quantile ($qRead) did not beat equal-width ($eqRead) on the skewed dim")
    // the rewrite preserves the data and the answer
    assert(spark.read.parquet(s"$tmp/q").count() == total)
    assert(spark.read.parquet(s"$tmp/q")
      .filter(col("skewed").between(10, 20)).count() ==
      li.filter(col("skewed").between(10, 20)).count())
  }

  test("ensureBucketed adopts an existing layout without rewriting") {
    val li = Tables.table(spark, sf("sf0.001"), "lineitem")
      .select("l_orderkey", "l_quantity")
    val tmp = java.nio.file.Files.createTempDirectory("graft-adopt").toString
    Layout.ensureBucketed(spark, li, "spec_adopt", s"$tmp/t", "l_orderkey", 4)
    val written = new java.io.File(s"$tmp/t").listFiles().map(_.lastModified).max
    // simulate a NEW session: catalog entry gone, files remain
    spark.sql("DROP TABLE spec_adopt")
    Layout.ensureBucketed(spark,
      fail("df must not be evaluated on the adopt path"),
      "spec_adopt", s"$tmp/t", "l_orderkey", 4)
    try {
      val t = spark.table("spec_adopt")
      assert(t.count() == li.count())
      // the adopted table still carries bucket metadata: a groupBy on the
      // bucket key must not shuffle
      t.groupBy("l_orderkey").count().collect()
      val plan = t.groupBy("l_orderkey").count()
        .queryExecution.executedPlan
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(shuffles.isEmpty, s"adopted table lost bucketing:\n$plan")
      // and no rewrite happened
      assert(new java.io.File(s"$tmp/t").listFiles().map(_.lastModified).max
        == written)
    } finally spark.sql("DROP TABLE IF EXISTS spec_adopt")
  }
}
