package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{CacheStore, CubeBuilder, SpringerConnector}

/** B21 (connector parsing half) + B22 (cache write-back): regex count
  * extraction from fetched search pages, per-year CSV concat, multi-level
  * pub-date resolution, and the checkpointed Parquet cache upsert —
  * closed with a round-trip through the REAL ETL (write-back → re-read →
  * identical springer_compact_coverage output).
  */
class SpringerConnectorSpec extends SparkSpec {

  private def write(dir: Path, name: String, content: String): Unit = {
    Files.createDirectories(dir.resolve(name).getParent)
    Files.writeString(dir.resolve(name), content.stripMargin): Unit
  }

  /** A search-results page as SpringerLink renders it (the two regex
    * targets of springer_compact_coverage.py:17-18 embedded in noise).
    */
  private def page(count: String, title: String): String =
    s"""<html><head><title>Search Results</title></head><body>
       |<div id="content">
       |<H1 id="number-of-search-results-and-search-terms">
       |  <strong>$count</strong> Result(s) for '&nbsp;'
       |</h1>
       |<p class="message">You are now only searching within the Journal</p>
       |<p class="title">
       |<a href="/journal/40746">$title</a>
       |</p>
       |</div></body></html>""".stripMargin

  test("B21: search-page parse — comma counts, entity titles, OA/total pivot, failure routing") {
    val dir = Files.createTempDirectory("graft-pages")
    // journal 40746: two years, both kinds; counts with separators; title
    // with entities (HTMLParser-unescape parity)
    write(dir, "40746_2019_total.html", page("1,234", "Annals of Q &amp; A"))
    write(dir, "40746_2019_oa.html", page("56", "Annals of Q &amp; A"))
    write(dir, "40746_2020_total.html", page("50", "Annals of Q &amp; A"))
    write(dir, "40746_2020_oa.html", page("5", "Annals of Q &amp; A"))
    // journal 11582: count page without the title block -> ValueError :373
    write(dir, "11582_2019_total.html",
      "<h1 id=\"number-of-search-results-and-search-terms\"><strong>9</strong></h1>")
    // journal 11582 oa: no count at all -> ValueError :366
    write(dir, "11582_2019_oa.html", "<html><body>server error</body></html>")
    // half pair: journal 42415 has only the total page
    write(dir, "42415_2020_total.html", page("7", "Frailty &amp; Aging"))
    // a file outside the naming contract
    write(dir, "readme_notes.html", page("1", "X"))

    val sp = SpringerConnector.parseSearchPages(spark, dir.toString)
    val cov = sp.coverage.collect().map(r => (r.getString(0), r.getString(2)) ->
      (r.getString(1), r.getLong(3), r.getLong(4))).toMap
    assert(cov.keySet == Set("40746" -> "2019", "40746" -> "2020"))
    // comma stripped (:363), entities decoded (:370-371)
    assert(cov("40746" -> "2019") == (("Annals of Q & A", 1234L, 56L)))
    assert(cov("40746" -> "2020") == (("Annals of Q & A", 50L, 5L)))
    val fails = sp.failures.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fails("11582_2019_total") == "no journal title detected")
    assert(fails("11582_2019_oa") == "no results count detected")
    assert(fails("readme_notes") == "unrecognized file name")
    assert(fails("42415_2020") == "missing oa or total page for the pair")
    assert(fails.size == 4)
  }

  test("B21: per-year CSV concat — per-file headers, year-ascending dict-last-wins, journal key from path") {
    val dir = Files.createTempDirectory("graft-csvs")
    // reference layout: one dir per journal, one SpringerLink export per
    // year, EVERY file with its own header (the reference strips all but
    // the first, :285-287)
    write(dir, "40746/2019.csv",
      """Item Title,Publication Title,Item DOI,Publication Year
        |A,Springer J,10.1007/s40746-d2,2019
        |B,Springer J,10.1007/s40746-b1,2019
        |""")
    write(dir, "40746/2020.csv",
      """Item Title,Publication Title,Item DOI,Publication Year
        |B2,Springer J,10.1007/s40746-b1,2020
        |C,Springer J,10.1007/s40746-c9,2020
        |""")
    write(dir, "10052/2019.csv",
      """Item Title,Publication Title,Item DOI,Publication Year
        |E,EPJ C,10.1140/epjc/xyz,2019
        |""")
    val m = SpringerConnector.articleYearsFromCsvs(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    // headers never leak through as data rows
    assert(!m.keySet.exists(_._2 == "Item DOI"))
    assert(m(("40746", "10.1007/s40746-d2")) == "2019")
    // b1 appears in 2019 AND 2020: the later year wins (dict overwrite)
    assert(m(("40746", "10.1007/s40746-b1")) == "2020")
    assert(m(("10052", "10.1140/epjc/xyz")) == "2019")
    assert(m.size == 4)
  }

  test("B21: multi-level pub-date resolution — persistent beats CSV, the rest is the refetch list") {
    import spark.implicits._
    val needed = Seq(("40746", "10.1007/a"), ("40746", "10.1007/b"),
      ("40746", "10.1007/c"), ("10052", "10.1140/d")).toDF("journal_id", "doi")
    val persistent = Seq(("40746", "10.1007/a", "2018"))
      .toDF("journal_id", "doi", "pub_year")
    val csvCache = Seq(("40746", "10.1007/a", "2019"), ("40746", "10.1007/b", "2020"))
      .toDF("journal_id", "doi", "pub_year")
    val (resolved, missing) = SpringerConnector.resolvePubYears(needed, persistent, csvCache)
    val r = resolved.collect()
      .map(x => x.getString(1) -> (x.getString(2), x.getString(3))).toMap
    // level 1 wins even when level 2 disagrees (:182-184 try persistent first)
    assert(r("10.1007/a") == (("2018", "persistent")))
    assert(r("10.1007/b") == (("2020", "csv")))
    val miss = missing.collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(miss == Set(("40746", "10.1007/c"), ("10052", "10.1140/d")))
  }

  test("B22: checkpointed upsert — update-wins merge, crash-safe flip, vacuum keeps current") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cache").resolve("pubdates").toString
    assert(CacheStore.read(spark, dir).isEmpty)
    val keys = Seq("journal_id", "doi")
    val g1 = CacheStore.upsert(spark, dir,
      Seq(("40746", "10.1007/a", "2018"), ("40746", "10.1007/b", "2019"))
        .toDF("journal_id", "doi", "pub_year"), keys)
    assert(g1.count() == 2)
    // second upsert: one replacement, one insert; untouched row survives
    val g2 = CacheStore.upsert(spark, dir,
      Seq(("40746", "10.1007/b", "2020"), ("10052", "10.1140/d", "2019"))
        .toDF("journal_id", "doi", "pub_year"), keys)
    val m = g2.collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(m == Map("10.1007/a" -> "2018", "10.1007/b" -> "2020",
      "10.1140/d" -> "2019"))
    // both generations exist until vacuum (in-flight readers of gen-1
    // finish); after vacuum only the current survives and reads still work
    val root = java.nio.file.Paths.get(dir)
    def gens() = { val s = Files.list(root)
      try s.filter(p => p.getFileName.toString.startsWith("gen-")).count()
      finally s.close() }
    assert(gens() == 2)
    CacheStore.vacuum(dir)
    assert(gens() == 1)
    assert(CacheStore.read(spark, dir).get.count() == 3)
  }

  test("B22 round-trip: parse pages → write-back → re-read → IDENTICAL springer_compact_coverage output") {
    val fixtures = EtlFixture.create()
    val inputsJson = CubeBuilder.readInputs(spark, fixtures.toString)
    val viaJson = CubeBuilder.build(inputsJson)
      .cubes("springer_compact_coverage").orderBy("period").collect().toSeq
    assert(viaJson.nonEmpty)

    // fetched-page fixtures that parse to EXACTLY the JSON cache's content
    // (journal 40746, 2019: 100/10, 2020: 50/5, title "Springer J")
    val pages = Files.createTempDirectory("graft-pages-rt")
    write(pages, "40746_2019_total.html", page("100", "Springer J"))
    write(pages, "40746_2019_oa.html", page("10", "Springer J"))
    write(pages, "40746_2020_total.html", page("50", "Springer J"))
    write(pages, "40746_2020_oa.html", page("5", "Springer J"))
    val parsed = SpringerConnector.parseSearchPages(spark, pages.toString)
    assert(parsed.failures.count() == 0)

    // write-back through the checkpointed cache, then rebuild the ETL with
    // the RE-READ parquet cache in place of the JSON cache
    val cacheRoot = Files.createTempDirectory("graft-cache-rt")
    val covDir = cacheRoot.resolve("coverage_stats").toString
    CacheStore.upsert(spark, covDir, parsed.coverage,
      Seq("journal_id", "year")): Unit
    val covFromCache = CacheStore.read(spark, covDir).get
    val viaParquet = CubeBuilder.build(inputsJson.copy(coverageStats = covFromCache))
      .cubes("springer_compact_coverage").orderBy("period").collect().toSeq
    assert(viaParquet == viaJson)

    // a later refresh upserts a changed 2020 count; only that row moves
    val pages2 = Files.createTempDirectory("graft-pages-rt2")
    write(pages2, "40746_2020_total.html", page("51", "Springer J"))
    write(pages2, "40746_2020_oa.html", page("6", "Springer J"))
    val refresh = SpringerConnector.parseSearchPages(spark, pages2.toString)
    CacheStore.upsert(spark, covDir, refresh.coverage,
      Seq("journal_id", "year")): Unit
    val after = CubeBuilder.build(
      inputsJson.copy(coverageStats = CacheStore.read(spark, covDir).get))
      .cubes("springer_compact_coverage")
      .orderBy("period").collect().toSeq
    val byPeriod = after.map(r => r.getAs[String]("period") -> r).toMap
    assert(byPeriod("2020").getAs[Long]("num_journal_total_articles") == 51L)
    assert(byPeriod("2020").getAs[Long]("num_journal_oa_articles") == 6L)
    assert(byPeriod("2019") == viaJson.head)
  }
}
