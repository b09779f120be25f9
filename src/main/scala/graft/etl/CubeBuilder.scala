package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.SpringerJournalId

/** Inputs to the cube-building dataflow — the Spark equivalents of the
  * reference ETL's six CSV inputs + three JSON caches
  * (assets_generator.py:31-37,358-374). All CSV frames are RAW (every column
  * string, exactly as read); euro is cast to double only when a monetary cube
  * is projected, because `doi_lookup` stores euro as string
  * (assets_generator.py:263-271) and `ta.euro` may be the "NA" sentinel.
  */
final case class EtlInputs(
    apc: DataFrame,
    bpc: DataFrame,
    ta: DataFrame,
    dealWileyOptOut: DataFrame,
    dealSpringerOptOut: DataFrame,
    institutions: DataFrame,
    additionalCostsWide: DataFrame,
    coverageStats: DataFrame,
    articlePubYears: DataFrame,
    journalIds: DataFrame)

/** Outputs: the eight static cubes (SURVEY.md §1.1), the institutional-cube
  * manifest (reference: institutional_cubes.csv, assets_generator.py:574-585),
  * and the strict-mode validation frame (unknown institutions — the
  * reference aborts on these, assets_generator.py:487-492).
  *
  * Institutional cubes are *filter views* over their parent cube — the
  * reference copies rows verbatim (assets_generator.py:696), so
  * `parent.filter($"institution" === x)` is semantically identical and costs
  * nothing until queried (SURVEY.md §1.1).
  */
final case class EtlOutputs(
    cubes: Map[String, DataFrame],
    institutionalManifest: DataFrame,
    unknownInstitutions: DataFrame) {

  /** parent cube per institutional cube type (assets_generator.py:678-702). */
  def institutionalCube(cubeType: String, institution: String): DataFrame = {
    val parent = cubeType match {
      case "apc"    => cubes("openapc")
      case "apc_ac" => cubes("openapc_ac")
      case "bpc"    => cubes("bpc")
      case "ta"     => cubes("transformative_agreements")
      case "deal"   => cubes("deal")
      case other    => throw new IllegalArgumentException(s"unknown cube type '$other'")
    }
    parent.filter(col("institution") === lit(institution))
  }
}

/** The §2.B ETL dataflow re-expressed as declarative DataFrame lineages.
  *
  * The reference streams CSV rows one at a time through an imperative loop
  * that appends each row (with per-cube mutations) to up to five in-memory
  * table buffers (assets_generator.py:320-585). Here every cube is an
  * independent filter/project/union lineage off shared, enriched source
  * frames (SURVEY.md §7.4.6) — order-free, shuffle-free except where an
  * aggregation genuinely needs one, and scalable: nothing is collected to
  * the driver, the institutions lookup join is an explicit `broadcast`, and
  * all derivations are codegen-friendly built-in expressions.
  */
object CubeBuilder {

  /** Imprint → canonical publisher (assets_generator.py:45-48). */
  val dealImprints: Map[String, Seq[String]] = Map(
    "Wiley-Blackwell" -> Seq("Wiley-Blackwell", "EMBO",
      "American Geophysical Union (AGU)",
      "International Union of Crystallography (IUCr)", "The Econometric Society"),
    "Springer Nature" -> Seq("Springer Nature", "Zhejiang University Press"))

  /** DEAL start gates (assets_generator.py:42-43): strptime(period,"%Y") >
    * Jan-1-of-start-year ⇔ period-as-int > start year.
    */
  val dealWileyStartYear = 2019
  val dealSpringerStartYear = 2020

  /** Treemap display order (assets_generator.py:40). */
  val cubePriorities: Seq[String] = Seq("apc", "apc_ac", "bpc", "ta", "deal")

  val factsDoiUrl = "https://olap.openapc.net/cube/%s/facts?cut=doi:%s"

  // ---- readers ----------------------------------------------------------

  /** Raw (all-string) CSV read with the given column set — header-keyed like
    * the reference's csv.DictReader (assets_generator.py:325). `encoding`
    * mirrors the reference's UTF8RecoderReader shim (util.py:10-38), which
    * recodes arbitrarily-encoded input to UTF-8 before parsing: Spark's
    * CSV source does the same decode natively given the charset name.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      encoding: String = "UTF-8"): DataFrame =
    spark.read.option("header", true)
      .option("encoding", encoding)
      .schema(StructType(schema.map(f => StructField(f.name, StringType, f.nullable))))
      .csv(path)

  /** Convenience loader mirroring the reference's fixed input layout. */
  def readInputs(spark: SparkSession, dir: String): EtlInputs = EtlInputs(
    apc = readCsv(spark, s"$dir/apc_de.csv", OpenApcSchemas.apcCsv),
    bpc = readCsv(spark, s"$dir/bpc.csv", OpenApcSchemas.bpcCsv),
    ta = readCsv(spark, s"$dir/transformative_agreements.csv", OpenApcSchemas.taCsv),
    dealWileyOptOut = readCsv(spark, s"$dir/deal_wiley_germany_opt_out.csv", OpenApcSchemas.taCsv),
    dealSpringerOptOut = readCsv(spark, s"$dir/deal_springer_nature_germany_opt_out.csv", OpenApcSchemas.taCsv),
    institutions = readCsv(spark, s"$dir/institutions.csv", OpenApcSchemas.institutionsCsv),
    additionalCostsWide = spark.read.option("header", true)
      .option("inferSchema", false).csv(s"$dir/apc_de_additional_costs.csv"),
    coverageStats = JsonCaches.coverageStats(spark, s"$dir/coverage_stats.json"),
    articlePubYears = JsonCaches.articlePubYears(spark, s"$dir/article_pubdates.json"),
    journalIds = JsonCaches.journalIds(spark, s"$dir/journal_ids.json"))

  // ---- small reusable transforms (§2.B operators) -----------------------

  /** B8: colon scrub — ":" removed from titles (assets_generator.py:347,431,520). */
  def scrubColons(c: Column): Column = translate(c, ":", "")

  /** B9: imprint → canonical publisher for one family (assets_generator.py:387-388). */
  def normalizeImprint(publisher: Column, canonical: String): Column =
    when(publisher.isin(dealImprints(canonical): _*), lit(canonical)).otherwise(publisher)

  /** B10: DEAL 2019 halving, banker's rounding for parity with Python's
    * round() (assets_generator.py:395-398 — round-half-even).
    */
  def halve2019(euro: Column, period: Column): Column =
    when(period === "2019", bround(euro.try_cast(DoubleType) / 2, 2).cast(StringType))
      .otherwise(euro)

  /** B7: publication key := doi, else url stripped of its scheme, else the
    * url verbatim; NULL when neither exists (the reference raises,
    * assets_generator.py:605-614 — strict mode is the separate validation
    * step, B23).
    */
  def publicationKey(doi: Column, url: Column): Column = {
    def present(c: Column) = c.isNotNull && c =!= "NA" && c =!= ""
    when(present(doi), doi)
      .when(present(url),
        when(url.rlike("^https?://"), regexp_extract(url, "^https?://(.*)$", 1))
          .otherwise(url))
      .otherwise(lit(null).cast(StringType))
  }

  /** The institutions lookup (assets_generator.py:704-721): ror URL stripped
    * to its id, 'NA' when absent; keyed by institution short name.
    */
  def institutionLookup(institutions: DataFrame): DataFrame =
    institutions.select(
      col("institution"),
      col("institution_full_name").as("_full_name"),
      col("institution_cubes_name").as("_cube_name"),
      col("continent").as("_continent"),
      col("country").as("_country"),
      col("state").as("_state"),
      when(col("ror_id").startsWith("https://ror.org/"),
        expr("substring(ror_id, 17)")).otherwise(lit("NA")).as("_ror_id"))

  /** B5: broadcast enrichment join — every fact row picks up country/ror/
    * full-name/cube-name from the (small) institutions table
    * (assets_generator.py:350,521-524). Left join: unknown institutions
    * surface in the validation frame instead of aborting the lineage.
    */
  def enrich(df: DataFrame, lookup: DataFrame): DataFrame =
    df.join(broadcast(lookup), Seq("institution"), "left")

  /** B23: strict-mode validation — institutions present in a source but
    * absent from the lookup (reference collects then aborts,
    * assets_generator.py:380,392-394,487-492).
    */
  def unknownInstitutions(sources: Seq[DataFrame], lookup: DataFrame): DataFrame =
    sources.map(_.select("institution"))
      .reduce(_ unionByName _)
      .distinct()
      .join(broadcast(lookup.select("institution")), Seq("institution"), "left_anti")

  /** B14: additional-costs wide→long unpivot (assets_generator.py:322-339):
    * one row per (doi, cost_type) keeping only parseable numeric values.
    */
  def additionalCostsLong(wide: DataFrame): DataFrame = {
    val costCols = wide.columns.filterNot(_ == "doi")
    require(costCols.nonEmpty, "additional-costs file has no cost columns")
    wide.unpivot(Array(col("doi")), costCols.map(col), "cost_type", "_euro_raw")
      .withColumn("_euro", col("_euro_raw").try_cast(DoubleType))
      .filter(col("_euro").isNotNull) // reference skips non-floats (ValueError)
      .select(col("doi"), col("cost_type"), col("_euro").cast(StringType).as("_euro"))
  }

  /** Project to a target schema: missing columns become the "NA" sentinel
    * (never null — SURVEY.md §1.2); euro cast per-schema at the end.
    */
  private def conform(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(schema.map { f =>
      val c =
        if (have.contains(f.name)) col(f.name)
        else lit("NA").cast(StringType)
      // try_cast: ANSI-safe — the "NA" sentinel (or any malformed numeric)
      // becomes null instead of failing the job (strictness is B23's job)
      (f.dataType match {
        case DoubleType => c.try_cast(DoubleType)
        case LongType   => c.try_cast(LongType)
        case _          => c.cast(StringType)
      }).as(f.name)
    }: _*)
  }

  // ---- the dataflow -----------------------------------------------------

  /** The enriched-APC lineage head (B5/B6/B8) — shared by the batch build
    * and the incremental-refresh path (streaming.OpenApcRefresh), so a new
    * ETL rule lands in both automatically.
    */
  def apcEnriched(apc: DataFrame, lookup: DataFrame): DataFrame =
    enrich(apc, lookup)
      .withColumn("journal_full_title", scrubColons(col("journal_full_title")))
      .withColumn("country", col("_country"))
      .withColumn("institution_ror", col("_ror_id"))

  /** openapc-cube rows for a RAW apc frame — the per-batch unit of the
    * incremental refresh (the same projection `build` uses for the full
    * cube).
    */
  def openApcRows(apc: DataFrame, lookup: DataFrame): DataFrame =
    conform(apcEnriched(apc, lookup), OpenApcSchemas.apc)

  def build(inputs: EtlInputs): EtlOutputs = {
    val lookup = institutionLookup(inputs.institutions)

    // --- enriched sources (shared lineage heads; B5/B6/B8) ---
    val apcE = apcEnriched(inputs.apc, lookup)
    val bpcE = enrich(inputs.bpc, lookup)
      .withColumn("book_title", scrubColons(col("book_title")))
      .withColumn("country", col("_country"))
    val taE = enrich(inputs.ta, lookup)
      .withColumn("journal_full_title", scrubColons(col("journal_full_title")))
      .withColumn("country", col("_country"))

    // --- openapc / bpc / transformative_agreements (straight projections) ---
    val openapc = conform(apcE, OpenApcSchemas.apc)
    val bpcCube = conform(bpcE, OpenApcSchemas.bpc)
    val taCube = conform(taE, OpenApcSchemas.ta)

    // --- combined (B13): all APC rows + cost-bearing TA rows
    //     (assets_generator.py:445-446,529) ---
    val combined = conform(apcE, OpenApcSchemas.apc)
      .unionByName(conform(taE.filter(col("euro") =!= "NA"), OpenApcSchemas.apc))

    // --- openapc_ac (B14): base APC rows + per-cost-type fan-out
    //     (assets_generator.py:531-546) ---
    val acLong = additionalCostsLong(inputs.additionalCostsWide)
    val apcKeyed = apcE.withColumn("publication_key", publicationKey(col("doi"), col("url")))
    val acBase = apcKeyed
      .withColumn("cost_type", lit("apc"))
      .withColumn("cost_category", lit("APC"))
    val acExtra = apcKeyed
      .drop("cost_type") // (not present; defensive)
      .join(acLong, Seq("doi"))
      .withColumn("euro", col("_euro"))
      .withColumn("cost_category", lit("Additional Cost"))
    val openapcAc = conform(acBase, OpenApcSchemas.apcAc)
      .unionByName(conform(acExtra, OpenApcSchemas.apcAc))

    // --- deal (B9/B10/B11/B12/B13): six unioned lineages ---
    def optOutDeal(df: DataFrame, canonical: String, halve: Boolean): DataFrame = {
      val e = enrich(df, lookup)
        .withColumn("opt_out", lit("TRUE"))
        .withColumn("publisher", normalizeImprint(col("publisher"), canonical))
        .withColumn("country", col("_country"))
      val h = if (halve) e.withColumn("euro", halve2019(col("euro"), col("period"))) else e
      conform(h, OpenApcSchemas.deal)
    }
    def taDeal(agreement: String, canonical: String, halve: Boolean): DataFrame = {
      val e = taE.filter(col("agreement") === agreement)
        .withColumn("opt_out", lit("FALSE"))
        .withColumn("publisher", normalizeImprint(col("publisher"), canonical))
      val h = if (halve) e.withColumn("euro", halve2019(col("euro"), col("period"))) else e
      conform(h, OpenApcSchemas.deal)
    }
    // APC-derived DEAL rows: imprint ∧ country=DEU ∧ is_hybrid=FALSE ∧
    // period > start-year (assets_generator.py:548-562). Year > Jan-1-gate
    // excludes the start year itself, so no halving applies here.
    def apcDeal(canonical: String, startYear: Int): DataFrame =
      conform(
        apcE.filter(
          col("publisher").isin(dealImprints(canonical): _*) &&
            col("country") === "DEU" && col("is_hybrid") === "FALSE" &&
            col("period").try_cast(IntegerType) > startYear)
          .withColumn("publisher", lit(canonical))
          .withColumn("opt_out", lit("FALSE")),
        OpenApcSchemas.deal)

    val deal = Seq(
      optOutDeal(inputs.dealWileyOptOut, "Wiley-Blackwell", halve = true),
      optOutDeal(inputs.dealSpringerOptOut, "Springer Nature", halve = false),
      taDeal("DEAL Wiley Germany", "Wiley-Blackwell", halve = true),
      taDeal("DEAL Springer Nature Germany", "Springer Nature", halve = false),
      apcDeal("Wiley-Blackwell", dealWileyStartYear),
      apcDeal("Springer Nature", dealSpringerStartYear)).reduce(_ unionByName _)

    // --- doi_lookup (assets_generator.py:593-607): rows with a DOI from
    //     bpc/ta/apc, euro kept as STRING, back-link url per source cube ---
    def lookupRows(e: DataFrame, cubeName: String): DataFrame =
      e.filter(col("doi") =!= "NA").select(
        col("institution"),
        coalesce(col("_ror_id"), lit("NA")).as("institution_ror"),
        coalesce(col("_full_name"), lit("NA")).as("institution_full_name"),
        col("euro").cast(StringType).as("euro"),
        col("period"), col("doi"),
        format_string(factsDoiUrl, lit(cubeName), col("doi")).as("url"))
    val doiLookup =
      lookupRows(bpcE, "bpc")
        .unionByName(lookupRows(taE, "transformative_agreements"))
        .unionByName(lookupRows(apcE, "openapc"))

    // --- springer_compact_coverage (B15/B16/B20,
    //     assets_generator.py:471-509): TA Springer rows → journal id →
    //     per-(journal, pub-year) counts, left-joined onto the coverage
    //     cache with 0 default ---
    val taSpringer = taE.filter(col("publisher") === "Springer Nature")
      .withColumn("_direct_id", SpringerJournalId.directJournalId(col("doi")))
      .join(broadcast(inputs.journalIds
        .select(col("issn"), col("journal_id").as("_cache_id"))), Seq("issn"), "left")
      .withColumn("journal_id", coalesce(col("_direct_id"), col("_cache_id")))
    val taCounts = taSpringer
      .join(broadcast(inputs.articlePubYears
        .select(col("journal_id"), col("doi"), col("pub_year"))),
        Seq("journal_id", "doi"), "left")
      .withColumn("year", coalesce(col("pub_year"), col("period")))
      .groupBy(col("journal_id"), col("year"))
      .agg(count(lit(1)).as("_n_scc"))
    val scc = inputs.coverageStats
      .join(taCounts, Seq("journal_id", "year"), "left")
      .na.fill(0, Seq("_n_scc"))
      .select(
        col("year").as("period"),
        lit("Springer Nature").as("publisher"),
        col("title").as("journal_full_title"),
        lit("TRUE").as("is_hybrid"),
        col("_n_scc").cast(LongType).as("num_springer_compact_articles"),
        col("num_journal_total_articles").cast(LongType),
        col("num_journal_oa_articles").cast(LongType))

    // --- institutional manifest (B17/B18/B19,
    //     assets_generator.py:644-702) ---
    val manifest = institutionalManifest(
      lookup,
      apc = apcE, apcAc = openapcAc, bpc = bpcE, ta = taE,
      deal = deal,
      dealParticipants = Seq(
        enrich(inputs.dealWileyOptOut, lookup),
        enrich(inputs.dealSpringerOptOut, lookup),
        taE.filter(col("agreement").isin("DEAL Wiley Germany", "DEAL Springer Nature Germany")))
        .map(_.select("institution")).reduce(_ unionByName _).distinct())

    val unknown = unknownInstitutions(
      Seq(inputs.apc, inputs.bpc, inputs.ta,
        inputs.dealWileyOptOut, inputs.dealSpringerOptOut),
      lookup)

    EtlOutputs(
      cubes = Map(
        "openapc" -> openapc,
        "openapc_ac" -> openapcAc,
        "bpc" -> bpcCube,
        "transformative_agreements" -> taCube,
        "combined" -> combined,
        "deal" -> deal,
        "doi_lookup" -> doiLookup,
        "springer_compact_coverage" -> scc),
      institutionalManifest = manifest,
      unknownInstitutions = unknown)
  }

  /** B17–B19: which institutional cubes exist, their names and display
    * priorities (assets_generator.py:644-702).
    *
    *  - an institution gets a cube of a type iff it has rows of that type
    *    AND a non-NA `institution_cubes_name`
    *  - prune apc_ac cubes whose rows are ALL cost_type=apc (B18,
    *    assets_generator.py:650-654) and deal cubes of non-participants
    *    (flag set only while streaming opt-out/TA rows — an APC-only "deal"
    *    institution is pruned, assets_generator.py:655-658)
    *  - priority = rank of the cube type in [apc, apc_ac, bpc, ta, deal]
    *    *among the types the institution had before pruning* — the reference
    *    assigns priorities on insert and does not recompute after deletion
    *    (assets_generator.py:697-702 vs 644-662)
    */
  def institutionalManifest(
      lookup: DataFrame,
      apc: DataFrame, apcAc: DataFrame, bpc: DataFrame, ta: DataFrame,
      deal: DataFrame, dealParticipants: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    def present(df: DataFrame, t: String) =
      df.select(col("institution")).distinct().withColumn("cube_type", lit(t))

    val presence = Seq(
      present(apc, "apc"), present(apcAc, "apc_ac"), present(bpc, "bpc"),
      present(ta, "ta"), present(deal, "deal")).reduce(_ unionByName _)

    val prio = array(cubePriorities.map(lit): _*)
    val w = Window.partitionBy("institution").orderBy(col("_prio_idx"))
    val ranked = presence
      .withColumn("_prio_idx", array_position(prio, col("cube_type")))
      .withColumn("priority", (row_number().over(w) - 1).cast(IntegerType))

    // B18 pruning — evaluated per institution, after priorities are fixed
    val acKeep = apcAc.filter(col("cost_type") =!= "apc")
      .select("institution").distinct().withColumn("_keep_ac", lit(true))
    val participants = dealParticipants
      .select("institution").distinct().withColumn("_deal_ok", lit(true))

    ranked
      .join(broadcast(lookup.select(col("institution"),
        col("_full_name"), col("_cube_name"))), Seq("institution"))
      .filter(col("_cube_name").isNotNull && col("_cube_name") =!= "NA")
      .join(broadcast(acKeep), Seq("institution"), "left")
      .join(broadcast(participants), Seq("institution"), "left")
      .filter(!(col("cube_type") === "apc_ac" && col("_keep_ac").isNull))
      .filter(!(col("cube_type") === "deal" && col("_deal_ok").isNull))
      .select(
        col("institution"),
        when(col("cube_type") === "apc", col("_cube_name"))
          .otherwise(concat(col("_cube_name"), lit("_"), col("cube_type")))
          .as("cube_name"),
        col("_full_name").as("full_name"),
        col("cube_type"),
        col("priority"))
  }

  /** B3/B17: persist cubes as Parquet. Institutional cubes stay views; at
    * 100 TB the winning layout is partition-by-period (the only rangeable
    * dim → partition pruning for range cuts) with optional
    * `partitionBy("institution")` materialization when per-institution scans
    * dominate the workload. `sortedCols` selects the range-sorted layout
    * instead (sources/Layout.writeSorted): row groups cover narrow key
    * intervals, so point lookups prune via min/max stats — the sub-linear
    * path for the doi_lookup cube, whose workload is single-DOI resolution
    * (HOWTO.md:93-104), not period slicing. A cube named in both maps uses
    * the sorted layout (the maps should be disjoint).
    */
  def writeCubes(out: EtlOutputs, dir: String,
      partitionCols: Map[String, Seq[String]] = Map.empty,
      sortedCols: Map[String, Seq[String]] = Map.empty): Unit = {
    out.cubes.foreach { case (name, df) =>
      // explicit file count = configured shuffle parallelism: an
      // implicit repartitionByRange is AQE-coalescible, and coalescing
      // tiny range partitions into one file erases the key-interval
      // granularity the point-lookup pruning depends on
      val numFiles = df.sparkSession.sessionState.conf.numShufflePartitions
      (partitionCols.get(name).filter(_.nonEmpty),
        sortedCols.get(name).filter(_.nonEmpty)) match {
        case (Some(pc), Some(sc)) =>
          graft.sources.Layout.writePartitionedSorted(df, s"$dir/$name.parquet",
            pc, sc, numFiles = numFiles)
        case (None, Some(sc)) =>
          graft.sources.Layout.writeSorted(df, s"$dir/$name.parquet", sc,
            numFiles = numFiles)
        case (pc, None) =>
          val w = df.write.mode("overwrite")
          pc.fold(w)(cols => w.partitionBy(cols: _*)).parquet(s"$dir/$name.parquet")
      }
    }
    out.institutionalManifest.coalesce(1).write.mode("overwrite")
      .option("header", true).csv(s"$dir/institutional_cubes.csv")
  }
}
