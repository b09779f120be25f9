package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, Row}

import graft.etl.{CubeBuilder, EtlOutputs}

/** Micro-fixture shared by EtlSpec and the e2e spec: 4 institutions (one
  * NA-cube, one non-DEU, one deal-participant, one apc-deal-only),
  * APC/TA/BPC/opt-out/additional-cost files + the three JSON caches.
  */
object EtlFixture {

  private def write(dir: Path, name: String, content: String): Unit =
    Files.writeString(dir.resolve(name), content.stripMargin.trim + "\n"): Unit

  /** Write the fixture CSV/JSON inputs into a fresh temp dir. */
  def create(): Path = {
    val dir = Files.createTempDirectory("graft-etl")
    // institutions.csv (assets_generator.py:704-721); ror as URL, NA allowed
    write(dir, "institutions.csv",
      """institution,institution_full_name,institution_cubes_name,continent,country,state,ror_id
        |Bielefeld U,Bielefeld University,bielefeld,Europe,DEU,NRW,https://ror.org/02hpadn98
        |Konstanz U,University of Konstanz,konstanz,Europe,DEU,BW,https://ror.org/0546hnb39
        |MIT,Massachusetts Institute of Technology,mit,North America,USA,MA,https://ror.org/042nb2s44
        |Wellcome,Wellcome Trust,NA,Europe,GBR,NA,NA""")
    // apc_de.csv — 18 columns (OpenApcSchemas.apcCsv)
    def apcRow(inst: String, period: String, euro: String, doi: String,
        hybrid: String, publisher: String, title: String, url: String = "NA") =
      s"$inst,$period,$euro,$doi,$hybrid,$publisher,$title,1111-1111,NA,NA,NA,cc-by,TRUE,NA,NA,NA,$url,TRUE"
    write(dir, "apc_de.csv",
      ("institution,period,euro,doi,is_hybrid,publisher,journal_full_title,issn," +
        "issn_print,issn_electronic,issn_l,license_ref,indexed_in_crossref,pmid,pmcid,ut,url,doaj\n" +
        Seq(
          apcRow("Bielefeld U", "2020", "1000.5", "10.1002/abc1", "FALSE", "EMBO", "Journal: Of Things"),
          apcRow("Bielefeld U", "2019", "800", "10.1002/abc2", "FALSE", "Wiley-Blackwell", "J2"),
          apcRow("MIT", "2020", "1200", "10.1002/abc3", "FALSE", "Wiley-Blackwell", "J3"),
          apcRow("Bielefeld U", "2020", "900", "NA", "TRUE", "Elsevier BV", "J4",
            url = "https://example.org/paper4"),
          apcRow("Konstanz U", "2021", "700", "10.1002/abc5", "FALSE", "Wiley-Blackwell", "J5"),
          apcRow("Wellcome", "2020", "1500", "10.1016/abc6", "TRUE", "Elsevier BV", "J6"))
          .mkString("\n")))
    // additional costs, wide (assets_generator.py:322-339): one parseable
    // cell (abc1/colour), one non-numeric (skipped), one unmatched doi
    write(dir, "apc_de_additional_costs.csv",
      """doi,colour charges,page charges
        |10.1002/abc1,99.9,NA
        |10.9999/zzz,50,""")
    // transformative_agreements.csv — 19 cols (OpenApcSchemas.taCsv)
    def taRow(inst: String, period: String, euro: String, doi: String,
        publisher: String, title: String, issn: String, agreement: String) =
      s"$inst,$period,$euro,$doi,TRUE,$publisher,$title,$issn,NA,NA,NA,cc-by,TRUE,NA,NA,NA,NA,FALSE,$agreement"
    val taHeader = "institution,period,euro,doi,is_hybrid,publisher,journal_full_title,issn," +
      "issn_print,issn_electronic,issn_l,license_ref,indexed_in_crossref,pmid,pmcid,ut,url,doaj,agreement"
    write(dir, "transformative_agreements.csv",
      (taHeader + "\n" + Seq(
        taRow("Bielefeld U", "2019", "600.25", "10.1002/tadoi1", "EMBO", "Some: TA J", "4444-4444", "DEAL Wiley Germany"),
        taRow("Bielefeld U", "2020", "NA", "10.1007/s40746-d2", "Springer Nature", "Springer J", "2222-2222", "Springer Compact"),
        taRow("MIT", "2019", "500", "10.1140/epjc/xyz", "Springer Nature", "EPJ C", "3333-3333", "Springer Compact"))
        .mkString("\n")))
    // opt-out files (ta-shaped; opt_out injected TRUE at assets_generator.py:386,407)
    write(dir, "deal_wiley_germany_opt_out.csv",
      (taHeader + "\n" +
        taRow("Bielefeld U", "2019", "600.25", "10.1002/opt1", "EMBO", "OptJ", "5555-5555", "DEAL Wiley Germany")))
    write(dir, "deal_springer_nature_germany_opt_out.csv", taHeader)
    // bpc.csv — 13 cols (OpenApcSchemas.bpcCsv; country added by enrichment)
    write(dir, "bpc.csv",
      """institution,period,euro,doi,backlist_oa,publisher,book_title,isbn,isbn_print,isbn_electronic,license_ref,indexed_in_crossref,doab
        |Bielefeld U,2020,300,10.99/book1,TRUE,Some Press,Book: Title,978-1,NA,NA,cc-by,TRUE,TRUE""")
    // JSON caches (springer_compact_coverage.py:120-132,182-213,321-339)
    write(dir, "coverage_stats.json",
      """{"40746": {"title": "Springer J", "years": {
        |  "2019": {"num_journal_total_articles": 100, "num_journal_oa_articles": 10},
        |  "2020": {"num_journal_total_articles": 50, "num_journal_oa_articles": 5}}}}""")
    write(dir, "article_pubdates.json",
      """{"40746": {"10.1007/s40746-d2": "2019"}}""")
    write(dir, "journal_ids.json", """{"3333-3333": "10052"}""")
    // workspace info blob (slicer.ini:11 info_file) — served verbatim at /info
    write(dir, "info.json",
      """{
        |    "name": "fixture.olap.test",
        |    "label": "Fixture OLAP",
        |    "description": "e2e fixture instance",
        |    "license": "Open Database License",
        |    "keywords": ["fixture", "APC"],
        |    "visualizers": [{"label": "Treemaps", "url": "http://treemaps.example"}]
        |}""")
    dir
  }
}

/** ETL snapshot tests over hand-written micro-fixtures — the FIXTURES.md §3
  * scenarios, each citing the reference rule it locks in (SURVEY.md §2.B).
  */
class EtlSpec extends SparkSpec {

  private lazy val outputs: EtlOutputs =
    CubeBuilder.build(CubeBuilder.readInputs(spark, EtlFixture.create().toString))

  private def cube(name: String): DataFrame = outputs.cubes(name)
  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  test("openapc: enrichment join adds country + stripped ror; titles colon-scrubbed (B5/B6/B8)") {
    val m = rows(cube("openapc").filter("doi = '10.1002/abc1'"))
    assert(m.size == 1)
    val r = m.head
    assert(r.getAs[String]("country") == "DEU")
    assert(r.getAs[String]("institution_ror") == "02hpadn98") // URL prefix stripped
    assert(r.getAs[String]("journal_full_title") == "Journal Of Things") // ':' scrubbed
    assert(cube("openapc").count() == 6)
  }

  test("combined = apc rows + cost-bearing TA rows only (B13, euro != NA)") {
    assert(cube("combined").count() == 6 + 2) // 3 TA rows, one euro=NA
    val taInCombined = rows(cube("combined").filter("doi like '10.1140%' or doi like '10.1002/tadoi%'"))
    assert(taInCombined.map(_.getAs[String]("doi")).toSet ==
      Set("10.1002/tadoi1", "10.1140/epjc/xyz"))
  }

  test("openapc_ac: base apc rows + fan-out, non-numeric cells skipped (B14)") {
    val ac = cube("openapc_ac")
    assert(ac.filter("cost_type = 'apc'").count() == 6)
    val extra = rows(ac.filter("cost_type != 'apc'"))
    assert(extra.size == 1) // only abc1/colour charges parses as float
    assert(extra.head.getAs[String]("cost_type") == "colour charges")
    assert(extra.head.getAs[Double]("euro") == 99.9)
    assert(extra.head.getAs[String]("cost_category") == "Additional Cost")
    // count vs count_distinct(publication_key): fan-out dedups back (A15)
    assert(ac.count() == 7)
    assert(ac.select("publication_key").distinct().count() == 6)
  }

  test("publication_key: doi first, url scheme-stripped fallback (B7)") {
    val k = rows(cube("openapc_ac").filter("doi = 'NA'"))
    assert(k.map(_.getAs[String]("publication_key")) == Seq("example.org/paper4"))
  }

  test("deal: 2019 halving uses banker's rounding; imprints normalized (B9/B10)") {
    val deal = cube("deal")
    // 600.25/2 = 300.125 -> python round() half-even -> 300.12 (not 300.13)
    val ta1 = rows(deal.filter("doi = '10.1002/tadoi1'"))
    assert(ta1.size == 1)
    assert(ta1.head.getAs[Double]("euro") == 300.12)
    assert(ta1.head.getAs[String]("publisher") == "Wiley-Blackwell") // EMBO normalized
    assert(ta1.head.getAs[String]("opt_out") == "FALSE")
    val opt = rows(deal.filter("doi = '10.1002/opt1'"))
    assert(opt.head.getAs[Double]("euro") == 300.12)
    assert(opt.head.getAs[String]("opt_out") == "TRUE")
  }

  test("deal eligibility: imprint ∧ DEU ∧ non-hybrid ∧ period > start year (B11/B12)") {
    val apcDeal = rows(cube("deal").filter("opt_out = 'FALSE' and doi like '10.1002/abc%'"))
    // abc1 (2020 EMBO DEU FALSE) and abc5 (2021 Konstanz) qualify;
    // abc2 (2019, not > 2019), abc3 (USA) do not
    assert(apcDeal.map(_.getAs[String]("doi")).toSet == Set("10.1002/abc1", "10.1002/abc5"))
    assert(apcDeal.forall(_.getAs[String]("publisher") == "Wiley-Blackwell"))
  }

  test("doi_lookup: euro stays string, back-link url per source cube; NA dois dropped") {
    val dl = cube("doi_lookup")
    assert(dl.schema("euro").dataType.typeName == "string")
    assert(dl.filter("doi = 'NA'").count() == 0) // paper4 excluded
    val b = rows(dl.filter("doi = '10.99/book1'"))
    assert(b.head.getAs[String]("url") ==
      "https://olap.openapc.net/cube/bpc/facts?cut=doi:10.99/book1")
    val t = rows(dl.filter("doi = '10.1002/tadoi1'"))
    assert(t.head.getAs[String]("url") ==
      "https://olap.openapc.net/cube/transformative_agreements/facts?cut=doi:10.1002/tadoi1")
    assert(rows(dl.filter("doi = '10.1002/abc1'")).head.getAs[String]("url")
      .contains("/cube/openapc/facts"))
    // bpc euro 300 survives as its raw string, not "300.0"
    assert(b.head.getAs[String]("euro") == "300")
  }

  test("springer_compact_coverage: journal-id rules, pub-year fallback, zero default (B15/B16/B20)") {
    val scc = rows(cube("springer_compact_coverage").orderBy("period"))
    // coverage cache has journal 40746 x {2019, 2020}; EPJ (cache-id 10052)
    // is not in the coverage cache -> no row (left join FROM coverage)
    assert(scc.size == 2)
    val by = scc.map(r => r.getAs[String]("period") -> r).toMap
    // the 2020 TA article's pubdate says 2019 -> counted under 2019
    assert(by("2019").getAs[Long]("num_springer_compact_articles") == 1L)
    assert(by("2020").getAs[Long]("num_springer_compact_articles") == 0L) // default
    assert(by("2019").getAs[Long]("num_journal_total_articles") == 100L)
    assert(by("2019").getAs[String]("is_hybrid") == "TRUE")
  }

  test("institutional manifest: naming, pruning, pre-prune priorities (B17/B18/B19)") {
    val m = rows(outputs.institutionalManifest)
      .map(r => (r.getAs[String]("institution"), r.getAs[String]("cube_type")) ->
        (r.getAs[String]("cube_name"), r.getAs[Int]("priority"))).toMap
    // Bielefeld: all five types, apc cube named bare, others suffixed
    assert(m(("Bielefeld U", "apc")) == ("bielefeld", 0))
    assert(m(("Bielefeld U", "apc_ac")) == ("bielefeld_apc_ac", 1)) // has colour charges
    assert(m(("Bielefeld U", "bpc")) == ("bielefeld_bpc", 2))
    assert(m(("Bielefeld U", "ta")) == ("bielefeld_ta", 3))
    assert(m(("Bielefeld U", "deal")) == ("bielefeld_deal", 4)) // opt-out participant
    // MIT: apc only — apc_ac pruned (all cost_type=apc, B18)
    assert(m.contains(("MIT", "apc")))
    assert(!m.contains(("MIT", "apc_ac")))
    // MIT has a TA row -> ta cube kept
    assert(m.contains(("MIT", "ta")))
    // Konstanz: apc-derived deal rows do NOT make it a participant -> pruned
    assert(!m.contains(("Konstanz U", "deal")))
    assert(m.contains(("Konstanz U", "apc")))
    // Wellcome: cubes_name=NA -> no institutional cubes at all
    assert(!m.keys.exists(_._1 == "Wellcome"))
  }

  test("institutional cube view equals parent filtered (assets_generator.py:696)") {
    val v = outputs.institutionalCube("apc", "Bielefeld U")
    assert(v.count() == 3)
    assert(rows(v).forall(_.getAs[String]("institution") == "Bielefeld U"))
  }

  test("validation: unknown institutions surface (B23) — none in clean fixture") {
    assert(outputs.unknownInstitutions.count() == 0)
  }

  test("readCsv decodes non-UTF-8 input given its charset (util.py:10-38 parity)") {
    // the reference's UTF8RecoderReader recodes arbitrary encodings to
    // UTF-8 before csv parsing; readCsv's encoding option is the same
    // shim — a latin-1 file with bytes invalid in UTF-8 must round-trip
    val dir = Files.createTempDirectory("graft-latin1")
    val csv = "institution,title\nMünchen U,Café: résumé\n"
    Files.write(dir.resolve("latin1.csv"),
      csv.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("institution",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("title",
        org.apache.spark.sql.types.StringType)))
    val read = CubeBuilder.readCsv(spark, dir.resolve("latin1.csv").toString,
      schema, encoding = "ISO-8859-1").collect()
    assert(read.length == 1)
    assert(read.head.getAs[String]("institution") == "München U")
    assert(read.head.getAs[String]("title") == "Café: résumé")
    // and the default UTF-8 path garbles the same bytes (proving the
    // option is load-bearing, not a no-op)
    val bad = CubeBuilder.readCsv(spark, dir.resolve("latin1.csv").toString,
      schema).collect()
    assert(bad.head.getAs[String]("institution") != "München U")
  }
}
