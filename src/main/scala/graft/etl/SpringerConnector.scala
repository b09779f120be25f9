package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PARSING half of the reference's SpringerLink connector (SURVEY.md
  * B21) as a batch job over pre-fetched inputs.
  *
  * The reference interleaves network fetches with parsing
  * (springer_compact_coverage.py:341-374 result-count pages, 247-293
  * per-year CSV fetch + concat). The fetch half is out-of-engine by
  * design (SURVEY §2.B); everything AFTER the bytes arrive — regex count
  * extraction, title unescape, OA/total pivot, per-year CSV concat with
  * header dedup — is pure dataflow and runs here as Spark jobs over a
  * directory of fetched artifacts.
  *
  * Scale shape: both jobs are one pass over a file listing with no
  * shuffle until the final (tiny) per-journal pivot — a connector refresh
  * over the whole Springer catalogue (~3k journals × years × {oa, total})
  * is at most ~100k small files, read partition-parallel. Parse failures
  * are DATA, not exceptions: the reference collects per-journal
  * ValueErrors and keeps going (`ERROR_MSGS`,
  * springer_compact_coverage.py:107-113); the batch equivalent routes
  * unparseable pages to [[SearchPages.failures]] so one mangled page
  * cannot kill a fleet-wide refresh.
  */
object SpringerConnector {

  /** Parsed search-result pages split into the coverage rows and the
    * failed lookups (the reference's ERROR_MSGS analogue).
    */
  final case class SearchPages(coverage: DataFrame, failures: DataFrame)

  // springer_compact_coverage.py:17 — the results-count <h1>; count may
  // carry thousands separators ("1,234")
  private val CountRe =
    "(?is)<h1 id=\"number-of-search-results-and-search-terms\">\\s*<strong>([\\d,]+)</strong>"
  // springer_compact_coverage.py:18 — the journal title link under the
  // "searching within the Journal" message
  private val TitleRe =
    "(?is)<p class=\"message\">You are now only searching within the Journal</p>\\s*" +
      "<p class=\"title\">\\s*<a href=\"/journal/\\d+\">(.*?)</a>"

  /** The entities SpringerLink journal titles actually carry — the
    * reference unescapes with HTMLParser (:370-371); a replace chain over
    * the HTML4 core set (+ the numeric apostrophe) keeps this a codegen'd
    * expression instead of a per-row UDF. `&amp;` must decode LAST or it
    * would re-decode the output of the other entities.
    */
  private[etl] def htmlUnescape(c: Column): Column = {
    val named = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    named.foldLeft(c) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) }
  }

  /** Results count from one fetched page: comma-stripped long, null when
    * the page doesn't carry the <h1> (the :360-366 extraction; reused by
    * the b21 oracle query so the gated expression IS the connector's).
    */
  def extractCount(html: Column): Column = {
    val s = regexp_extract(html, CountRe, 1)
    when(s =!= "", regexp_replace(s, ",", "").cast("long"))
  }

  /** Journal title from one fetched page, entity-decoded; null when the
    * title block is missing (:367-373).
    */
  def extractTitle(html: Column): Column = {
    val s = regexp_extract(html, TitleRe, 1)
    when(s =!= "", htmlUnescape(s))
  }

  /** Parse a directory of pre-fetched search-result pages into the
    * coverage-stats table [[CubeBuilder]] B16 consumes.
    *
    * File naming contract (what the out-of-engine fetcher writes):
    * `<journal_id>_<year>_<oa|total>.html` — the three query parameters
    * the reference bakes into each search URL
    * (springer_compact_coverage.py:22-23), made durable so the parse is
    * reproducible without the network.
    *
    * Output matches [[JsonCaches.coverageStats]] column-for-column:
    * (journal_id, title, year, num_journal_total_articles,
    * num_journal_oa_articles). Pages whose count or title regex fails
    * (the reference's ValueError at :366/:373) land in `failures` with a
    * reason instead.
    */
  def parseSearchPages(spark: SparkSession, pagesDir: String): SearchPages = {
    val raw = spark.read.option("wholetext", true)
      .option("pathGlobFilter", "*.html")
      .text(pagesDir)
      .select(
        regexp_extract(input_file_name(), "([^/]+)\\.html$", 1).as("page_key"),
        col("value"))
      .select(
        regexp_extract(col("page_key"), "^(\\d+)_(\\d{4})_(oa|total)$", 1).as("journal_id"),
        regexp_extract(col("page_key"), "^(\\d+)_(\\d{4})_(oa|total)$", 2).as("year"),
        regexp_extract(col("page_key"), "^(\\d+)_(\\d{4})_(oa|total)$", 3).as("kind"),
        col("page_key"), col("value"))
    val parsed = raw
      .withColumn("count", extractCount(col("value")))
      .withColumn("title", extractTitle(col("value")))
      .drop("value")
    val bad = parsed.filter(
        col("journal_id") === "" || col("count").isNull || col("title").isNull)
      .select(col("page_key"),
        when(col("journal_id") === "", "unrecognized file name")
          .when(col("count").isNull, "no results count detected")      // :366
          .otherwise("no journal title detected").as("reason"))        // :373
    // OA/total pivot: one coverage row per (journal, year) — the shape
    // _update_journal_stats writes into the cache (:120-132). Both kinds
    // must have parsed; a half-parsed pair is a failure, not a zero.
    val good = parsed.filter(col("journal_id") =!= "" &&
      col("count").isNotNull && col("title").isNotNull)
    val coverage = good
      .groupBy(col("journal_id"), col("year"))
      .agg(
        max(col("title")).as("title"),
        max(when(col("kind") === "total", col("count"))).as("num_journal_total_articles"),
        max(when(col("kind") === "oa", col("count"))).as("num_journal_oa_articles"),
        count(lit(1)).as("_n_kinds"))
    val halfPairs = coverage
      .filter(col("num_journal_total_articles").isNull ||
        col("num_journal_oa_articles").isNull)
      .select(concat(col("journal_id"), lit("_"), col("year")).as("page_key"),
        lit("missing oa or total page for the pair").as("reason"))
    SearchPages(
      coverage = coverage
        .filter(col("num_journal_total_articles").isNotNull &&
          col("num_journal_oa_articles").isNotNull)
        .select(col("journal_id"), col("title"), col("year"),
          col("num_journal_total_articles"), col("num_journal_oa_articles")),
      failures = bad.unionByName(halfPairs))
  }

  /** Per-year article CSV concat (springer_compact_coverage.py:278-293)
    * → the (journal_id, doi, pub_year) mapping
    * `_get_journal_cache_from_csv` (:247-276) derives.
    *
    * Layout contract: `<csvDir>/<journal_id>/<year>.csv`, each file a
    * SpringerLink search-results export WITH its own header row. The
    * reference concatenates the files by hand and must skip every header
    * after the first (:285-287); Spark's CSV reader handles per-file
    * headers natively, so the "header dedup" operator dissolves into the
    * source — the distributed read IS the concat.
    */
  def articleYearsFromCsvs(spark: SparkSession, csvDir: String): DataFrame =
    spark.read.option("header", true)
      .option("pathGlobFilter", "*.csv")
      .option("recursiveFileLookup", false)
      .csv(s"$csvDir/*")
      .withColumn("journal_id",
        regexp_extract(input_file_name(), "([^/]+)/[^/]+\\.csv$", 1))
      .select(col("journal_id"),
        col("Item DOI").as("doi"),
        col("Publication Year").as("pub_year"))
      .filter(col("doi").isNotNull)
      // a DOI appearing under several years collapses to the LATEST: the
      // reference walks years ascending and overwrites `cache[doi] = year`
      // (:272-275 over the :282 year-ordered concat) — dict-last-wins
      .groupBy(col("journal_id"), col("doi"))
      .agg(max(col("pub_year")).as("pub_year"))

  /** The multi-level pub-date resolution of
    * springer_compact_coverage.py:176-213 as one dataflow: for each
    * needed (journal_id, doi), level 1 is the persistent cache, level 2
    * the per-journal CSV cache; what neither holds is the REFETCH LIST —
    * the work order the out-of-engine fetcher runs next (:190-194), not
    * an in-engine lookup. Returns (resolved, missing): `resolved` carries
    * a `cache_level` column ("persistent" | "csv") so the write-back job
    * knows which rows are new to the persistent cache.
    */
  def resolvePubYears(needed: DataFrame, persistent: DataFrame,
      csvCache: DataFrame): (DataFrame, DataFrame) = {
    val keys = Seq("journal_id", "doi")
    val need = needed.select(col("journal_id"), col("doi")).distinct()
    val p = persistent.select(col("journal_id"), col("doi"),
      col("pub_year").as("_p_year"))
    val c = csvCache.select(col("journal_id"), col("doi"),
      col("pub_year").as("_c_year"))
    val joined = need.join(p, keys, "left").join(c, keys, "left")
    val resolved = joined
      .filter(col("_p_year").isNotNull || col("_c_year").isNotNull)
      .select(col("journal_id"), col("doi"),
        coalesce(col("_p_year"), col("_c_year")).as("pub_year"),
        when(col("_p_year").isNotNull, "persistent").otherwise("csv")
          .as("cache_level"))
    val missing = joined.filter(col("_p_year").isNull && col("_c_year").isNull)
      .select(col("journal_id"), col("doi"))
    (resolved, missing)
  }
}
