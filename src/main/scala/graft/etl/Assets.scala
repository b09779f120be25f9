package graft.etl

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame

import graft.model.CubeModel

/** One institutional-cube manifest row (institutional_cubes.csv,
  * assets_generator.py:574-585 / CubeBuilder.institutionalManifest).
  */
final case class ManifestEntry(institution: String, cubeName: String,
    fullName: String, cubeType: String, priority: Int)

/** Deployable-artifact generation — the reference's `model` and `yamls`
  * jobs (assets_generator.py:616-642 generate_model_file, 738-789
  * generate_yamls), re-expressed from the typed CubeModel declarations
  * instead of string template concatenation. Emits:
  *
  *  - `model.json`: the full cube-server model — the 8 static cubes plus
  *    one entry per institutional-manifest row, and the shared dimension
  *    catalog. Same structural shape as the reference artifact (cubes with
  *    name/label/measures/aggregates/dimensions; top-level dimensions with
  *    name/description/attributes).
  *  - one treemap YAML per institution (YAML_STATIC_PART_* shapes): header
  *    metadata from the institutions lookup, one `hierarchies` entry per
  *    manifest row in priority order, `default` = the lowest-priority type.
  */
object Assets {

  def manifestEntries(manifest: DataFrame): Seq[ManifestEntry] =
    manifest.collect().toSeq.map(r => ManifestEntry(
      r.getAs[String]("institution"), r.getAs[String]("cube_name"),
      r.getAs[String]("full_name"), r.getAs[String]("cube_type"),
      r.getAs[Int]("priority")))

  // ---- model.json ---------------------------------------------------------

  private def js(s: String): String = graft.util.Json.str(s)

  /** One cube entry in the reference's model.json shape: measures omitted
    * when the cube has none (as the TA/doi_lookup/scc templates do),
    * dimensions as a name list (the catalog holds the descriptions).
    */
  private def cubeEntry(m: CubeModel): String = {
    val measures =
      if (m.measures.isEmpty) ""
      else s""""measures": [${m.measures.map(x =>
        s"""{"name": ${js(x.name)}, "label": ${js(x.label)}}""").mkString(", ")}], """
    val aggs = m.aggregates.map { a =>
      val info = a.info.map(i => s""", "info": ${js(i)}""").getOrElse("")
      s"""{"name": ${js(a.name)}, "label": ${js(a.label)}, """ +
        s""""measure": ${a.measure.map(js).getOrElse("null")}, """ +
        s""""function": ${js(a.function)}$info}"""
    }.mkString(", ")
    s"""{"name": ${js(m.name)}, "label": ${js(m.label)}, $measures""" +
      s""""aggregates": [$aggs], """ +
      s""""dimensions": [${m.dimensions.map(d => js(d.name)).mkString(", ")}]}"""
  }

  /** The dimension catalog: union of all referenced dimensions with their
    * descriptions (MODEL_LAST_PART:217-338 shape).
    */
  private def dimensionCatalog: String =
    OpenApcModels.dimensionDescriptions.toSeq.sortBy(_._1).map { case (n, d) =>
      s"""{"name": ${js(n)}, "description": ${js(d)}, "attributes": [${js(n)}]}"""
    }.mkString(", ")

  /** Full model.json: openapc first, institutional entries in manifest
    * order, then the remaining static cubes — the reference's assembly
    * order (generate_model_file interleaves the institutional entries
    * after the FIRST_PART cube).
    */
  def modelJson(manifest: Seq[ManifestEntry]): String = {
    val institutional = manifest.map(e =>
      cubeEntry(OpenApcModels.institutionalModel(e.cubeType, e.cubeName, e.fullName)))
    val cubes = (cubeEntry(OpenApcModels.openapc) +: institutional) ++
      OpenApcModels.staticModels.filterNot(_.name == "openapc").map(cubeEntry)
    s"""{"name": "openapc_model", "label": "openapc standard model", """ +
      s""""description": "model for open apc data", """ +
      s""""cubes": [${cubes.mkString(", ")}], """ +
      s""""dimensions": [$dimensionCatalog]}"""
  }

  def writeModelJson(manifest: Seq[ManifestEntry], outDir: String): Path = {
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(outDir, "model.json"), modelJson(manifest))
  }

  // ---- per-institution treemap YAMLs -------------------------------------

  /** Treemap config per cube type: (display name, primary aggregate,
    * filters as (field, label), table items as (name, format), drilldown
    * dims) — the YAML_STATIC_PART_{APC,APC_AC,BPC,TA,DEAL} contents.
    * `percentage` table items (total_percentage relating to the primary
    * aggregate) are appended uniformly, as every template does.
    */
  private final case class YamlShape(displayName: String, primary: String,
      filters: Seq[(String, String)], tableItems: Seq[(String, String)],
      drilldowns: Seq[String])

  private val yamlShapes: Map[String, YamlShape] = Map(
    "apc" -> YamlShape("APC", "apc_amount_sum",
      Seq("period" -> "Year", "is_hybrid" -> "Hybrid Status"),
      Seq("apc_amount_sum" -> "monetary", "apc_num_items" -> "number",
        "apc_amount_avg" -> "monetary", "apc_amount_stddev" -> "monetary"),
      Seq("publisher", "journal_full_title", "doi")),
    "apc_ac" -> YamlShape("Additional Costs", "apc_amount_sum",
      Seq("period" -> "Year", "is_hybrid" -> "Hybrid Status",
        "cost_category" -> "Cost Category"),
      Seq("apc_amount_sum" -> "monetary", "apc_num_items" -> "number",
        "cost_data_num_items" -> "number", "apc_amount_avg" -> "monetary",
        "apc_amount_stddev" -> "monetary"),
      Seq("publisher", "journal_full_title", "doi", "cost_type")),
    "bpc" -> YamlShape("BPC", "bpc_amount_sum",
      Seq("period" -> "Year", "country" -> "Country",
        "backlist_oa" -> "Backlist OA", "doab" -> "in DOAB"),
      Seq("bpc_amount_sum" -> "monetary", "bpc_num_items" -> "number",
        "bpc_amount_avg" -> "monetary", "bpc_amount_stddev" -> "monetary"),
      Seq("publisher", "book_title", "doi")),
    "ta" -> YamlShape("TA", "num_items",
      Seq("period" -> "Year", "is_hybrid" -> "Hybrid Status"),
      Seq("num_items" -> "number"),
      Seq("agreement", "journal_full_title", "doi")),
    "deal" -> YamlShape("DEAL", "apc_amount_sum",
      Seq("period" -> "Year", "is_hybrid" -> "Hybrid Status",
        "opt_out" -> "Opt Out"),
      Seq("apc_amount_sum" -> "monetary", "apc_num_items" -> "number",
        "apc_amount_avg" -> "monetary", "apc_amount_stddev" -> "monetary"),
      Seq("publisher", "journal_full_title", "doi")))

  private def yamlTypePart(cubeType: String): String = {
    val s = yamlShapes(cubeType)
    val sb = new StringBuilder
    sb ++= s"        name: ${s.displayName}\n"
    sb ++= s"        primary_aggregate: ${s.primary}\n"
    sb ++= "        filters:\n"
    s.filters.foreach { case (f, n) =>
      sb ++= s"          - field: '$f'\n            name: '$n'\n            nullable: true\n"
    }
    sb ++= "        table_items:\n"
    s.tableItems.foreach { case (n, fmt) =>
      sb ++= s"          - name: '$n'\n            type: 'aggregate'\n            format: '$fmt'\n"
    }
    sb ++= "          - name: 'percentage'\n            type: 'total_percentage'\n"
    sb ++= s"            format: 'percentage'\n            relates_to: '${s.primary}'\n"
    sb ++= "            label: 'Percentage'\n"
    sb ++= "        drilldowns:\n"
    s.drilldowns.foreach(d => sb ++= s"            - $d\n")
    sb.toString
  }

  /** Institution header rows needed by the YAMLs (continent/country/state/
    * cube name), keyed by institution — the lookup-table subset
    * generate_yamls reads (assets_generator.py:704-721,764-775).
    */
  final case class InstitutionInfo(fullName: String, cubeName: String,
      continent: String, country: String, state: String)

  def institutionInfo(institutions: DataFrame): Map[String, InstitutionInfo] =
    institutions.collect().toSeq.map { r =>
      // a null lookup field (sparse institutions.csv rows) must render as
      // an empty YAML scalar, not the literal string "null"
      def s(c: String): String = Option(r.getAs[String](c)).getOrElse("")
      r.getAs[String]("institution") -> InstitutionInfo(
        s("institution_full_name"), s("institution_cubes_name"),
        s("continent"), s("country"), s("state"))
    }.toMap

  /** Escape a value for a double-quoted YAML scalar (`"..."`): YAML
    * double-quoted style uses backslash escapes, so `\` and `"` must be
    * escaped or an embedded quote in an institution name truncates the
    * scalar and leaves trailing garbage on the line.
    */
  private def yq(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** One YAML per institution with manifest rows: filename → content
    * (generate_yamls, assets_generator.py:744-789).
    */
  def yamls(manifest: Seq[ManifestEntry],
      institutions: Map[String, InstitutionInfo]): Map[String, String] =
    manifest.groupBy(_.institution).map { case (inst, rows) =>
      val sorted = rows.sortBy(_.priority)
      val info = institutions.getOrElse(inst,
        throw new NoSuchElementException(s"institution '$inst' missing from lookup"))
      val sb = new StringBuilder
      sb ++= s"""name: "${yq(info.fullName)}"\n"""
      sb ++= s"slug: ${info.cubeName}\n"
      sb ++= s"""tagline: "${yq(info.fullName)} publication cost data"\n"""
      sb ++= "source: Open APC\n"
      sb ++= "source_url: https://github.com/OpenAPC/openapc-de\n"
      sb ++= "data_url: https://github.com/OpenAPC/openapc-de/blob/master/data/apc_de.csv\n"
      sb ++= s"continent: ${info.continent}\n"
      sb ++= s"country: ${info.country}\n"
      sb ++= s"state: ${info.state}\n"
      sb ++= "level: kommune\n"
      sb ++= s"dataset: '${info.cubeName}'\n"
      sb ++= s"default: ${sorted.head.cubeType}\n\n"
      sb ++= "hierarchies:\n"
      sorted.foreach { row =>
        sb ++= s"    ${row.cubeType}:\n"
        sb ++= s"        cube: ${row.cubeName}\n"
        sb ++= yamlTypePart(row.cubeType)
      }
      s"${info.cubeName}.yaml" -> sb.toString
    }

  def writeYamls(manifest: Seq[ManifestEntry],
      institutions: Map[String, InstitutionInfo], outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    yamls(manifest, institutions).foreach { case (name, content) =>
      Files.writeString(Paths.get(outDir, name), content)
    }
  }
}
