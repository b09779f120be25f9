package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Physical-layout utilities — the storage side of the engine's scale story
  * (SURVEY.md §4 "physical notes"): the reference stores heap tables with
  * no indexes (/root/reference/assets_generator.py:241-249), so even DOI
  * point lookups scan everything (HOWTO.md:93-104). Columnar parquet plus
  * deliberate layout replaces indexes:
  *
  *  - **Range-sorted layout** (`writeSorted`): repartitionByRange + sort
  *    within partitions on the lookup key. Every parquet row group then
  *    covers a narrow key interval, so a point/range predicate prunes to
  *    1-2 row groups via min/max stats — the sub-linear path for the
  *    doi_lookup-style cube (A2). No index structure to maintain: the
  *    sort IS the index.
  *  - **Partitioned layout** (`writePartitioned`): directory partitioning
  *    for low-cardinality dims (period, institution) — partition pruning
  *    removes whole directories from the scan (the per-institution cube
  *    materialization, assets_generator.py:678-702, without row copies).
  *
  * `targetRowGroupBytes` tunes pruning granularity: smaller groups prune
  * finer at the cost of more footer metadata (default 128 MB is right for
  * 100 TB scans; tests shrink it to force many groups on tiny data).
  */
object Layout {

  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Int = 0, targetRowGroupBytes: Long = 0L): Unit = {
    val ranged =
      if (numFiles > 0) df.repartitionByRange(numFiles, sortCols.map(col): _*)
      else df.repartitionByRange(sortCols.map(col): _*)
    val w = ranged.sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
    (if (targetRowGroupBytes > 0)
      w.option("parquet.block.size", targetRowGroupBytes) else w)
      .parquet(path)
  }

  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
