package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the reference's nested-JSON ETL caches
  * (assets_generator.py:358-374; structures built at
  * springer_compact_coverage.py:120-132,182-213). The caches are keyed by
  * dynamic identifiers (journal id / issn / doi), so schema inference is
  * useless — we read whole-file text and explode explicit `MapType`s into
  * flat DataFrames, which is what every downstream join wants anyway.
  */
object JsonCaches {

  private def wholeFileJson(spark: SparkSession, path: String, t: DataType): DataFrame =
    spark.read.option("wholetext", true).text(path)
      .select(from_json(col("value"), t).as("j"))

  /** `coverage_stats.json`:
    * `{journal_id -> {title, years -> {year -> {num_journal_total_articles,
    * num_journal_oa_articles}}}}` (springer_compact_coverage.py:120-132)
    * → (journal_id, title, year, num_journal_total_articles, num_journal_oa_articles).
    */
  def coverageStats(spark: SparkSession, path: String): DataFrame = {
    val statsT = StructType(Seq(
      StructField("num_journal_total_articles", LongType),
      StructField("num_journal_oa_articles", LongType)))
    val t = MapType(StringType, StructType(Seq(
      StructField("title", StringType),
      StructField("years", MapType(StringType, statsT)))))
    wholeFileJson(spark, path, t)
      .select(explode(col("j")).as(Seq("journal_id", "info")))
      .select(col("journal_id"), col("info.title").as("title"),
        explode(col("info.years")).as(Seq("year", "stats")))
      .select(col("journal_id"), col("title"), col("year"),
        col("stats.num_journal_total_articles").as("num_journal_total_articles"),
        col("stats.num_journal_oa_articles").as("num_journal_oa_articles"))
  }

  /** `article_pubdates.json`: `{journal_id -> {doi -> pub_year}}`
    * (springer_compact_coverage.py:182-213) → (journal_id, doi, pub_year).
    */
  def articlePubYears(spark: SparkSession, path: String): DataFrame = {
    val t = MapType(StringType, MapType(StringType, StringType))
    wholeFileJson(spark, path, t)
      .select(explode(col("j")).as(Seq("journal_id", "dois")))
      .select(col("journal_id"), explode(col("dois")).as(Seq("doi", "pub_year")))
  }

  /** `journal_ids.json`: `{issn -> journal_id}` — the pre-resolved landing-page
    * lookups of springer_compact_coverage.py:321-339 (the HTTP fallback stays
    * outside the engine, SURVEY.md B20). → (issn, journal_id).
    */
  def journalIds(spark: SparkSession, path: String): DataFrame =
    wholeFileJson(spark, path, MapType(StringType, StringType))
      .select(explode(col("j")).as(Seq("issn", "journal_id")))
}
