package graft.etl

import org.apache.spark.sql.types._

/** Fixed cube/table schemas — Spark equivalents of the reference's
  * `TABLE_SCHEMAS` (assets_generator.py:68-176) per the type mapping at
  * assets_generator.py:234-239: every column StringType except the `euro`
  * measure (DoubleType; SQL `Numeric` in the reference) — and `doi_lookup`'s
  * euro, which the reference stores as *string* (assets_generator.py:263-271).
  * `"NA"` is a value, never null (SURVEY.md §1.2).
  */
object OpenApcSchemas {

  private def str(names: String*): Seq[StructField] =
    names.map(StructField(_, StringType, nullable = true))

  /** apc / cube `openapc` (also `combined`) — assets_generator.py:85-106. */
  val apc: StructType = StructType(
    str("institution", "period") ++
      Seq(StructField("euro", DoubleType, nullable = true)) ++
      str("doi", "is_hybrid", "publisher", "journal_full_title", "issn",
        "issn_print", "issn_electronic", "issn_l", "license_ref",
        "indexed_in_crossref", "pmid", "pmcid", "ut", "url", "doaj",
        "country", "institution_ror"))

  /** apc input CSV (apc_de.csv): apc minus the ETL-added country/ror. */
  val apcCsv: StructType =
    StructType(apc.filterNot(f => f.name == "country" || f.name == "institution_ror"))

  /** apc_ac / cube `openapc_ac` — assets_generator.py:107-131. */
  val apcAc: StructType = StructType(
    apc.fields ++ str("cost_type", "cost_category", "publication_key"))

  /** bpc — assets_generator.py:69-84. */
  val bpc: StructType = StructType(
    str("institution", "period") ++
      Seq(StructField("euro", DoubleType, nullable = true)) ++
      str("doi", "backlist_oa", "publisher", "book_title", "isbn",
        "isbn_print", "isbn_electronic", "license_ref",
        "indexed_in_crossref", "doab", "country"))

  val bpcCsv: StructType = StructType(bpc.filterNot(_.name == "country"))

  /** ta / cube `transformative_agreements` — assets_generator.py:155-175.
    * No monetary measure in the cube model (MODEL_LAST_PART:46-58) but the
    * source CSV carries euro (possibly "NA") which gates `combined`
    * membership (assets_generator.py:445). Kept as string.
    */
  val ta: StructType = StructType(
    str("institution", "period", "euro", "doi", "is_hybrid", "publisher",
      "journal_full_title", "issn", "issn_print", "issn_electronic",
      "issn_l", "license_ref", "indexed_in_crossref", "pmid", "pmcid",
      "ut", "url", "doaj", "agreement", "country"))

  val taCsv: StructType = StructType(ta.filterNot(_.name == "country"))

  /** deal — assets_generator.py:132-154 (apc columns + opt_out). */
  val deal: StructType = StructType(apc.fields ++ str("opt_out"))

  /** doi_lookup — assets_generator.py:263-271; euro as STRING here. */
  val doiLookup: StructType = StructType(
    str("institution", "institution_ror", "institution_full_name", "euro",
      "period", "doi", "url"))

  /** springer_compact_coverage — assets_generator.py:253-261. */
  val springerCompactCoverage: StructType = StructType(
    str("period", "publisher", "journal_full_title", "is_hybrid") ++ Seq(
      StructField("num_springer_compact_articles", LongType, nullable = true),
      StructField("num_journal_total_articles", LongType, nullable = true),
      StructField("num_journal_oa_articles", LongType, nullable = true)))

  /** institutions.csv — assets_generator.py:704-721. */
  val institutionsCsv: StructType = StructType(
    str("institution", "institution_full_name", "institution_cubes_name",
      "continent", "country", "state", "ror_id"))
}
