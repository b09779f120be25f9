package graft.etl

import graft.model.{Aggregate, CubeModel, Dimension, Measure}

/** The OpenAPC cube models — the Spark-native equivalent of the reference's
  * generated `model.json` (static templates /root/reference/static/templates/
  * MODEL_FIRST_PART + MODEL_LAST_PART, institutional parts
  * MODEL_CUBE_STATIC_PART{,_AC,_BPC,_DEAL,_TA}, assembled by
  * assets_generator.py:616-642). Each declaration below re-expresses one
  * template entry: same cube names, aggregate names/functions/measures,
  * dimension lists and labels.
  *
  * Engine-relevant deltas from the raw templates:
  *  - `period` is declared rangeable (the one range-cuttable dim,
  *    HOWTO.md:77-79).
  *  - monetary `euro` measures carry decimalScale=2 → exact decimal
  *    accumulation (the reference's SQL Numeric semantics; see
  *    model.Measure.decimalScale).
  *  - every cube declares a factKey so facts pagination and the
  *    `fact/<id>` handle are deterministic (the reference leans on
  *    Postgres heap order; a distributed engine must sort — SURVEY §7.4.4).
  *  - `count` aggregates keep their template `measure` for model-artifact
  *    parity; the engine treats count as a record count either way (the
  *    reference's count measures are nominal, SURVEY A12).
  */
object OpenApcModels {

  /** Dimension descriptions (MODEL_LAST_PART:217-338), used as labels. */
  val dimensionDescriptions: Map[String, String] = Map(
    "period" -> "Time Period (Year)",
    "institution" -> "A data-providing institution (like unibi). This is the OpenAPC internal identifier.",
    "euro" -> "Cost data for a publication",
    "publisher" -> "A publisher for publications",
    "journal_full_title" -> "title of a journal an article was published in",
    "book_title" -> "title of a monograph",
    "doab" -> "flag identifying if the book is listed in the DOAB",
    "backlist_oa" -> "flag identifying if the book was published OA from the beginning (Frontlist, FALSE) or was flipped to OA later (Backlist, TRUE)",
    "doi" -> "doi identifying an article",
    "issn" -> "issn identifying a journal. This corresponds to the primary ISSN provided by crossref, which might be a print or electronic variant",
    "opt_out" -> "flag identifying if this DEAL Wiley article has been opted out from OA (meaning it is now closed access)",
    "is_hybrid" -> "flag identifying if the article was published in a hybrid (TRUE) or a fully OA journal (FALSE)",
    "country" -> "country the institution is located in",
    "institution_ror" -> "ROR ID for an institution, without the URL prefix",
    "agreement" -> "transformative agreement an article was published under",
    "num_springer_compact_articles" -> "number of SC articles for a given journal and year",
    "num_journal_total_articles" -> "total number of articles for a given journal and year (according to Crossref)",
    "num_journal_oa_articles" -> "number of open access articles for a given journal and year (based on Crossref license analysis, might be inaccurate!)",
    "url" -> "A URL pointing to a record's facts data",
    "institution_full_name" -> "An institution's full name",
    "apc" -> "Cost data (apc)",
    "cost_type" -> "Cost Type",
    "cost_category" -> "Cost category, either APC or additional ocst",
    "publication_key" -> "Key for identifying a publication. Eqivalent to the DOI in most cases, but may also be an URL for publications without a DOI.")

  private def dims(names: String*): Seq[Dimension] =
    names.map(n => Dimension(n,
      label = dimensionDescriptions.getOrElse(n, ""),
      rangeable = n == "period"))

  private val euroApc = Measure("euro", "APC Amount", decimalScale = Some(2))
  private val euroBpc = Measure("euro", "BPC Amount", decimalScale = Some(2))
  private val euroAc = Measure("euro", "Cost Amount", decimalScale = Some(2))

  /** sum/count/avg/stddev over euro (MODEL_CUBE_STATIC_PART / openapc). */
  private def apcAggregates: Seq[Aggregate] = Seq(
    Aggregate("apc_amount_sum", "sum", Some("euro"), "Sum"),
    Aggregate("apc_num_items", "count", Some("euro"), "Number of Articles"),
    Aggregate("apc_amount_avg", "avg", Some("euro"), "Mean Value"),
    Aggregate("apc_amount_stddev", "stddev", Some("euro"), "Standard Deviation"))

  /** AC variant: count_distinct(publication_key) dedups the per-cost-type
    * fan-out back to publications (MODEL_CUBE_STATIC_PART_AC:14-25).
    */
  private def acAggregates: Seq[Aggregate] = Seq(
    Aggregate("apc_amount_sum", "sum", Some("euro"), "Sum"),
    Aggregate("apc_num_items", "count_distinct", Some("publication_key"), "Number of Articles"),
    Aggregate("cost_data_num_items", "count", Some("publication_key"), "Matters of Expense"),
    Aggregate("apc_amount_avg", "avg", Some("euro"), "Mean Value"),
    Aggregate("apc_amount_stddev", "stddev", Some("euro"), "Standard Deviation"))

  private def bpcAggregates: Seq[Aggregate] = Seq(
    Aggregate("bpc_amount_sum", "sum", Some("euro"), "Sum"),
    Aggregate("bpc_num_items", "count", Some("euro"), "Number of Books"),
    Aggregate("bpc_amount_avg", "avg", Some("euro"), "Mean BPC"),
    Aggregate("bpc_amount_stddev", "stddev", Some("euro"), "Standard Deviation"))

  private def taAggregates: Seq[Aggregate] = Seq(
    Aggregate("num_items", "count", Some("journal_full_title"), "Number of Articles"))

  // ---- the eight static cubes (MODEL_FIRST_PART + MODEL_LAST_PART) ------

  val openapc: CubeModel = CubeModel(
    name = "openapc", table = "openapc", label = "openapc cube",
    dimensions = dims("institution", "period", "publisher",
      "journal_full_title", "issn", "doi", "is_hybrid", "country",
      "institution_ror"),
    measures = Seq(euroApc),
    aggregates = apcAggregates,
    factKey = Seq("doi"))

  val openapcAc: CubeModel = CubeModel(
    name = "openapc_ac", table = "openapc_ac",
    label = "openapc additional costs",
    dimensions = dims("institution", "period", "publisher",
      "journal_full_title", "issn", "doi", "is_hybrid", "country",
      "institution_ror", "cost_type", "publication_key"),
    measures = Seq(euroAc),
    aggregates = acAggregates,
    factKey = Seq("publication_key", "cost_type"))

  val transformativeAgreements: CubeModel = CubeModel(
    name = "transformative_agreements", table = "transformative_agreements",
    label = "Transformative Agreements data cube (No monetary values!)",
    dimensions = dims("institution", "period", "publisher",
      "journal_full_title", "issn", "doi", "is_hybrid", "country",
      "agreement"),
    measures = Nil,
    aggregates = taAggregates,
    factKey = Seq("doi"))

  val doiLookup: CubeModel = CubeModel(
    name = "doi_lookup", table = "doi_lookup",
    label = "DOI lookup cube, contains DOIs from all OpenAPC data sets",
    dimensions = dims("institution", "institution_ror",
      "institution_full_name", "euro", "period", "doi", "url"),
    measures = Nil,
    aggregates = Seq(
      Aggregate("num_items", "count", Some("doi"), "Number of Records")),
    // the url embeds the source cube, so (doi, url) is the stable handle
    // for a DOI present in several data sets; unique by the data contract
    // (one row per publication per data set — a violation only relaxes
    // page-boundary determinism among the colliding rows)
    factKey = Seq("doi", "url"), factKeyUnique = true)

  val springerCompactCoverage: CubeModel = CubeModel(
    name = "springer_compact_coverage", table = "springer_compact_coverage",
    label = "Number of Springer Compact articles compared to number of total and oa articles in Springer journals",
    dimensions = dims("period", "publisher", "journal_full_title", "issn",
      "is_hybrid", "num_springer_compact_articles",
      "num_journal_total_articles", "num_journal_oa_articles"),
    measures = Nil,
    aggregates = Seq(
      Aggregate("springer_compact_articles", "sum",
        Some("num_springer_compact_articles"), "Springer Compact articles",
        info = Some("primary")),
      Aggregate("journal_total_articles", "sum",
        Some("num_journal_total_articles"), "Journal total articles"),
      Aggregate("journal_oa_articles", "sum",
        Some("num_journal_oa_articles"), "Journal OA articles")),
    factKey = Seq("journal_full_title", "period"))

  val combined: CubeModel = CubeModel(
    name = "combined", table = "combined",
    label = "combined cube (combines cost data from openapc and transformative agreements model)",
    dimensions = dims("institution", "period", "publisher",
      "journal_full_title", "issn", "doi", "is_hybrid", "country"),
    measures = Seq(euroApc),
    aggregates = apcAggregates,
    factKey = Seq("doi"))

  val bpc: CubeModel = CubeModel(
    name = "bpc", table = "bpc", label = "Monograph processing charges",
    dimensions = dims("institution", "period", "publisher", "book_title",
      "doi", "doab", "backlist_oa", "country"),
    measures = Seq(euroBpc),
    aggregates = bpcAggregates,
    factKey = Seq("doi"))

  val deal: CubeModel = CubeModel(
    name = "deal", table = "deal",
    label = "DEAL data (cost data from articles published under the German DEAL agreement)",
    dimensions = dims("institution", "period", "publisher",
      "journal_full_title", "issn", "doi", "is_hybrid", "country",
      "opt_out"),
    measures = Seq(euroApc),
    aggregates = apcAggregates,
    factKey = Seq("doi"))

  /** In MODEL template order: openapc first (MODEL_FIRST_PART), the rest
    * as MODEL_LAST_PART lists them.
    */
  val staticModels: Seq[CubeModel] = Seq(openapc, openapcAc,
    transformativeAgreements, doiLookup, springerCompactCoverage, combined,
    bpc, deal)

  // ---- institutional cube models (MODEL_CUBE_STATIC_PART*) ---------------

  /** Shape of each institutional cube type. Note: the institutional AC
    * part adds `cost_category` to the dimensions, which the static
    * openapc_ac entry does not list (MODEL_CUBE_STATIC_PART_AC vs
    * MODEL_LAST_PART:2-44) — reproduced as-is.
    */
  private val institutionalShape: Map[String, (Seq[Dimension], Seq[Measure], Seq[Aggregate], Seq[String])] = Map(
    "apc" -> ((openapc.dimensions, Seq(euroApc), apcAggregates, Seq("doi"))),
    "apc_ac" -> ((dims("institution", "period", "publisher",
      "journal_full_title", "issn", "doi", "is_hybrid", "country",
      "institution_ror", "cost_type", "publication_key", "cost_category"),
      Seq(euroApc), acAggregates, Seq("publication_key", "cost_type"))),
    "bpc" -> ((bpc.dimensions, Seq(euroBpc), bpcAggregates, Seq("doi"))),
    "ta" -> ((transformativeAgreements.dimensions, Nil, taAggregates, Seq("doi"))),
    "deal" -> ((deal.dimensions, Seq(euroApc), apcAggregates, Seq("doi"))))

  /** Model for one manifest row (assets_generator.py:630-635: name from the
    * manifest's cube_name, label "<full name> openAPC data cube", body from
    * the per-type static part).
    */
  def institutionalModel(cubeType: String, cubeName: String,
      fullName: String): CubeModel = {
    val (d, m, a, fk) = institutionalShape.getOrElse(cubeType,
      throw new IllegalArgumentException(s"unknown cube type '$cubeType'"))
    CubeModel(name = cubeName, table = cubeName,
      label = s"$fullName openAPC data cube",
      dimensions = d, measures = m, aggregates = a, factKey = fk)
  }

  /** Parent static cube per institutional cube type (EtlOutputs
    * .institutionalCube's mapping, assets_generator.py:678-702).
    */
  val parentCube: Map[String, String] = Map(
    "apc" -> "openapc", "apc_ac" -> "openapc_ac", "bpc" -> "bpc",
    "ta" -> "transformative_agreements", "deal" -> "deal")
}
