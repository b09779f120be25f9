package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.etl.CubeBuilder
import graft.registry.CubeRegistry
import graft.server.GraftServer
import graft.streaming.OpenApcRefresh

/** End-to-end incremental refresh: a served OpenAPC instance picks up new
  * apc CSV drops through the streaming upsert path — no full rebuild, only
  * the affected period partitions rewritten — and replays are idempotent.
  */
class OpenApcRefreshSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()

  private def get(srv: GraftServer, path: String): String = {
    val req = HttpRequest.newBuilder(
      URI.create(s"http://localhost:${srv.boundPort}$path")).GET().build()
    client.send(req, HttpResponse.BodyHandlers.ofString()).body()
  }

  private def items(srv: GraftServer, path: String): Int =
    mapper.readTree(get(srv, path)).get("summary").get("apc_num_items").asInt()

  private val apcHeader =
    "institution,period,euro,doi,is_hybrid,publisher,journal_full_title,issn," +
      "issn_print,issn_electronic,issn_l,license_ref,indexed_in_crossref,pmid,pmcid,ut,url,doaj"

  private def apcRow(inst: String, period: String, euro: String, doi: String) =
    s"$inst,$period,$euro,$doi,FALSE,Elsevier BV,Drop J,1111-1111,NA,NA,NA,cc-by,TRUE,NA,NA,NA,NA,TRUE"

  test("CSV drop → streaming upsert → served aggregates update; replay is idempotent; history untouched") {
    val fixDir = EtlFixture.create().toString
    val out = Files.createTempDirectory("graft-refresh").toString
    val inputs = CubeBuilder.readInputs(spark, fixDir)
    val outputs = CubeBuilder.build(inputs)
    CubeBuilder.writeCubes(outputs, s"$out/cubes",
      partitionCols = OpenApcMain.servedPartitionCols,
      sortedCols = OpenApcMain.servedSortedCols)
    val cubePath = s"$out/cubes/openapc.parquet"
    val reg = new CubeRegistry
    OpenApcMain.registerAll(spark, reg, s"$out/cubes", Nil)
    val srv = new GraftServer(reg); srv.start()
    try {
      assert(items(srv, "/cube/openapc/aggregate") == 6) // base build

      // a period partition the drop will NOT touch: its files must survive
      // the refresh byte-identical (no full rebuild)
      val untouched = Files.list(Paths.get(cubePath, "period=2021"))
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      val untouchedMtime = Files.getLastModifiedTime(untouched)

      // drop TWO files: one adds to an existing period, one opens a new one
      val dropDir = Files.createTempDirectory("graft-drop").toString
      val ckpt = Files.createTempDirectory("graft-refresh-ckpt").toString
      Files.writeString(Paths.get(dropDir, "drop1.csv"),
        apcHeader + "\n" + apcRow("MIT", "2020", "450", "10.1016/new1") + "\n")
      Files.writeString(Paths.get(dropDir, "drop2.csv"),
        apcHeader + "\n" + apcRow("Konstanz U", "2023", "375.5", "10.1016/new2") + "\n")
      OpenApcRefresh.incrementalRefresh(spark, dropDir, inputs.institutions,
        cubePath, ckpt)
      OpenApcMain.reload(spark, reg, s"$out/cubes", Nil)

      assert(items(srv, "/cube/openapc/aggregate") == 8, "drops not served")
      assert(items(srv, "/cube/openapc/aggregate?cut=period:2023") == 1)
      // new rows went through the FULL enrichment lineage (B5: country)
      assert(items(srv, "/cube/openapc/aggregate?cut=country:USA") == 2)
      // served schema stays the reference schema (no replay-guard column)
      assert(!get(srv, "/cube/openapc/facts?page=0&pagesize=1")
        .contains(OpenApcRefresh.batchCol))
      // the untouched period partition was not rewritten
      assert(Files.getLastModifiedTime(untouched) == untouchedMtime,
        "refresh rewrote an unaffected period partition")

      // replay idempotence: a batch whose overwrite committed but whose
      // checkpoint update crashed is re-delivered — merging the same
      // (batchId, rows) twice must land exactly once
      val replayCsv = Paths.get(dropDir, "..", "replay.csv")
      Files.writeString(replayCsv,
        apcHeader + "\n" + apcRow("MIT", "2020", "222", "10.1016/replayed") + "\n")
      val replay = CubeBuilder.readCsv(spark, replayCsv.toString,
        graft.etl.OpenApcSchemas.apcCsv)
      val lookup = CubeBuilder.institutionLookup(inputs.institutions)
      OpenApcRefresh.mergeApcBatch(replay, batchId = 777, lookup, cubePath)
      OpenApcRefresh.mergeApcBatch(replay, batchId = 777, lookup, cubePath)
      OpenApcMain.reload(spark, reg, s"$out/cubes", Nil)
      assert(items(srv, "/cube/openapc/aggregate") == 9,
        "batch replay double-counted")

      // a second refresh run with the same checkpoint re-processes nothing
      OpenApcRefresh.incrementalRefresh(spark, dropDir, inputs.institutions,
        cubePath, ckpt)
      OpenApcMain.reload(spark, reg, s"$out/cubes", Nil)
      assert(items(srv, "/cube/openapc/aggregate") == 9)
    } finally srv.stop()
  }

  test("strict mode: a drop with an unknown institution fails the batch, cube unchanged") {
    val fixDir = EtlFixture.create().toString
    val out = Files.createTempDirectory("graft-refresh2").toString
    val inputs = CubeBuilder.readInputs(spark, fixDir)
    CubeBuilder.writeCubes(CubeBuilder.build(inputs), s"$out/cubes",
      partitionCols = OpenApcMain.servedPartitionCols)
    val cubePath = s"$out/cubes/openapc.parquet"
    val before = OpenApcMain.readCube(spark, cubePath).count()
    val dropDir = Files.createTempDirectory("graft-drop2").toString
    Files.writeString(Paths.get(dropDir, "bad.csv"),
      apcHeader + "\n" + apcRow("Nowhere U", "2020", "100", "10.1/bad") + "\n")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      OpenApcRefresh.incrementalRefresh(spark, dropDir, inputs.institutions,
        cubePath, Files.createTempDirectory("graft-ckpt2").toString)
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).toSeq
    assert(messages.exists(_.contains("Nowhere U")), messages.mkString(" | "))
    assert(OpenApcMain.readCube(spark, cubePath).count() == before)
  }
}
