package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}

import graft.etl.{Assets, CubeBuilder, OpenApcModels}
import graft.registry.CubeRegistry
import graft.server.GraftServer

/** The single end-to-end OpenAPC entry point — the reference's
  * `update_olap.sh:12-16` pipeline (tables job → model job → yamls job →
  * serve) as one runnable main:
  *
  *   OpenApcMain <csvDir> <outDir> [port]
  *
  *  1. read the OpenAPC-shaped CSV directory (CubeBuilder.readInputs),
  *  2. build all eight static cubes + the institutional manifest,
  *  3. strict-mode validation: abort on institutions missing from the
  *     lookup (assets_generator.py:487-492),
  *  4. persist cubes as parquet + the manifest CSV (writeCubes),
  *  5. emit the deployable artifacts: model.json + per-institution
  *     treemap YAMLs (Assets),
  *  6. register every static cube (read back from the written parquet —
  *     queries run against the persisted layout, not the CSV lineage) and
  *     every institutional cube (filter view over its parent; the
  *     reference copies rows verbatim, assets_generator.py:696 — the view
  *     is semantically identical and costs nothing until queried),
  *  7. serve the HOWTO.md endpoint surface over HTTP.
  */
object OpenApcMain {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OpenApcMain <csvDir> <outDir> [port]")
    val (csvDir, outDir) = (args(0), args(1))
    val port = args.lift(2).map(_.toInt).getOrElse(8080)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = launch(spark, csvDir, outDir, port)
    println(s"graft OpenAPC server listening on port ${server.boundPort} " +
      s"(cubes + artifacts under $outDir)")
    // the HttpServer's executor threads are non-daemon: the JVM serves
    // until interrupted
  }

  /** Build → write → register → serve; returns the STARTED server (caller
    * stops it). Extracted from main so the e2e spec can drive the whole
    * pipeline against a fixture on an ephemeral port.
    */
  def launch(spark: SparkSession, csvDir: String, outDir: String,
      port: Int = 0): GraftServer = {
    val inputs = CubeBuilder.readInputs(spark, csvDir)
    val outputs = CubeBuilder.build(inputs)

    // strict mode: the reference aborts the whole run on institutions
    // missing from the lookup table (assets_generator.py:487-492)
    val unknown = outputs.unknownInstitutions.collect().map(_.getString(0))
    if (unknown.nonEmpty)
      throw new IllegalStateException(
        s"institutions missing from institutions.csv: ${unknown.mkString(", ")}")

    CubeBuilder.writeCubes(outputs, s"$outDir/cubes")
    val manifest = Assets.manifestEntries(outputs.institutionalManifest)
    Assets.writeModelJson(manifest, outDir)
    Assets.writeYamls(manifest,
      Assets.institutionInfo(inputs.institutions), s"$outDir/yamls")

    val registry = new CubeRegistry
    registerAll(spark, registry, s"$outDir/cubes", manifest)
    val server = new GraftServer(registry, port)
    server.start()
    server
  }

  /** Register the static cubes from their written parquet plus one filter
    * view per institutional-manifest row.
    */
  def registerAll(spark: SparkSession, registry: CubeRegistry,
      cubesDir: String, manifest: Seq[graft.etl.ManifestEntry]): Unit = {
    val static = OpenApcModels.staticModels.map { m =>
      m.name -> spark.read.parquet(s"$cubesDir/${m.name}.parquet")
    }.toMap
    OpenApcModels.staticModels.foreach(m => registry.register(m, static(m.name)))
    manifest.foreach { e =>
      val parent = static(OpenApcModels.parentCube(e.cubeType))
      registry.register(
        OpenApcModels.institutionalModel(e.cubeType, e.cubeName, e.fullName),
        parent.filter(col("institution") === lit(e.institution)))
    }
  }
}
