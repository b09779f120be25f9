package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("stride = window partitions the tokens exactly; concatenation reconstructs the doc") {
    val d = docs((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
    val chunks = Chunking.chunkDocs(d, "doc_id", "text", window = 4, stride = 4)
      .orderBy("chunk_idx").collect()
    assert(chunks.map(_.getAs[String]("chunk_text")).toSeq ==
      Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
    assert(chunks.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L, 2L))
    assert(chunks.map(_.getAs[Long]("chunk_idx")).toSeq == Seq(0L, 1L, 2L))
    // lossless: the chunks concatenate back to the token stream
    assert(chunks.map(_.getAs[String]("chunk_text")).mkString(" ") ==
      (1 to 10).map(i => s"t$i").mkString(" "))
  }

  test("stride < window overlaps adjacent chunks by window - stride tokens") {
    val d = docs((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
    val chunks = Chunking.chunkDocs(d, "doc_id", "text", window = 4, stride = 2)
      .orderBy("chunk_idx").collect().map(_.getAs[String]("chunk_text")).toSeq
    assert(chunks == Seq("t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8",
      "t7 t8 t9 t10"))
    // every token index appears; adjacent chunks share exactly 2 tokens
    chunks.sliding(2).foreach { case Seq(a, b) =>
      assert(a.split(' ').takeRight(2).toSeq == b.split(' ').take(2).toSeq)
    }
  }

  test("short docs yield one chunk, empty docs none, whitespace normalized") {
    val d = docs((1L, "just three tokens"), (2L, ""), (3L, "  \t\n  "),
      (4L, "a  b\t\nc"))
    val out = Chunking.chunkDocs(d, "doc_id", "text", window = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getAs[String]("chunk_text"))).toSeq
    assert(out.sortBy(_._1) == Seq((1L, "just three tokens"), (4L, "a b c")))
  }

  test("property: chunk count, coverage, and bounds hold across doc/window/stride shapes") {
    // deterministic sweep standing in for a generator: doc lengths around
    // the window boundaries x window/stride combinations
    val cases = for {
      n <- Seq(1, 3, 4, 5, 7, 8, 9, 16, 63, 64, 65, 100, 129)
      (w, st) <- Seq((4, 4), (4, 2), (8, 3), (64, 48), (64, 64))
    } yield (n, w, st)
    val docs = cases.zipWithIndex.map { case ((n, _, _), i) =>
      (i.toLong, (1 to n).map(k => s"w$k").mkString(" "))
    }
    for (((n, w, st), i) <- cases.zipWithIndex) {
      val d = this.docs(docs(i))
      val chunks = Chunking.chunkDocs(d, "doc_id", "text", w, st)
        .orderBy("chunk_idx").collect()
      val expected = 1 + math.ceil(math.max(n - w, 0).toDouble / st).toInt
      assert(chunks.length == expected, s"n=$n w=$w st=$st: ${chunks.length} chunks")
      // chunk i starts at token i*st+1 and carries min(w, n - i*st) tokens
      chunks.zipWithIndex.foreach { case (r, idx) =>
        assert(r.getAs[Long]("n_tokens") == math.min(w, n - idx * st).toLong,
          s"n=$n w=$w st=$st chunk $idx")
        assert(r.getAs[String]("chunk_text").startsWith(s"w${idx * st + 1} ") ||
          !r.getAs[String]("chunk_text").contains(' ') &&
            r.getAs[String]("chunk_text") == s"w${idx * st + 1}",
          s"n=$n w=$w st=$st chunk $idx start")
      }
      // every token appears in at least one chunk (coverage)
      val covered = chunks.flatMap(_.getAs[String]("chunk_text").split(' ')).toSet
      assert(covered == (1 to n).map(k => s"w$k").toSet, s"n=$n w=$w st=$st coverage")
    }
  }

  test("guard rails: bad window/stride rejected") {
    val d = docs((1L, "x"))
    intercept[IllegalArgumentException](
      Chunking.chunkDocs(d, "doc_id", "text", window = 0, stride = 1))
    intercept[IllegalArgumentException](
      Chunking.chunkDocs(d, "doc_id", "text", window = 4, stride = 5))
  }

  test("contamination scan flags corpus docs sharing k-grams with the benchmark") {
    import graft.operators.Dedup
    val bench = docs((100L, "the quick brown fox jumps over the lazy dog"))
    val corpus = docs(
      // contains the benchmark 5-grams verbatim inside a longer doc
      (1L, "intro words then the quick brown fox jumps over the lazy dog and more"),
      // shares tokens but no 5-gram run
      (2L, "quick dog brown lazy fox the over jumps"),
      (3L, "completely unrelated content about spark physical plans"))
    val flagged = Dedup.contaminationScan(corpus, bench, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_shared_shingles"),
        r.getAs[Long]("n_bench_docs"))).toSeq
    // doc 1 shares all 5 of the benchmark's 5-gram shingles (9 tokens -> 5)
    assert(flagged == Seq((1L, 5L, 1L)))
    // benchmark grams are broadcast: the corpus side must not shuffle
    // before its per-doc aggregation (one Exchange total on the corpus path)
    val plan = Dedup.contaminationScan(corpus, bench, "doc_id", "text", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark side not broadcast:\n$plan")
  }

  test("content-defined chunks reconstruct the document and survive a prefix edit") {
    val base = Tables.table(spark, sf(), "documents").limit(50)
      .select(col("doc_id"), col("text"))
    val chunks = Chunking.chunkByContent(base, "doc_id", "text",
      window = 3, divisor = 8)
    // partition property: token counts reconstruct exactly, no empty chunks
    val tokTotals = base.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = chunks.collect().groupBy(_.getLong(0))
    byDoc.foreach { case (id, rows) =>
      assert(rows.map(_.getAs[Long]("n_tokens")).sum == tokTotals(id))
      assert(rows.forall(_.getAs[Long]("n_tokens") > 0), s"empty chunk in doc $id")
      val idxs = rows.map(_.getAs[Long]("chunk_idx")).sorted.toSeq
      assert(idxs == (0L until rows.length).toSeq)
    }
    // SHIFT-INVARIANCE (the CDC point): prepending junk re-chunks only the
    // region before the first surviving cut — every chunk of the original
    // after its first cut reappears verbatim in the edited document
    val one = base.filter(col("doc_id") === byDoc.keys.max).collect().head
    val edited = docs(
      (1L, one.getString(1)),
      (2L, s"zz yy xx ww vv uu ${one.getString(1)}"))
    val ch2 = Chunking.chunkByContent(edited, "doc_id", "text",
      window = 3, divisor = 8).collect()
      .groupBy(_.getLong(0)).map { case (k, v) =>
        k -> v.sortBy(_.getAs[Long]("chunk_idx")).map(_.getAs[String]("chunk_hash")).toSeq
      }
    val origTail = ch2(1L).drop(1)
    assert(origTail.nonEmpty, "fixture doc produced a single chunk — widen it")
    assert(ch2(2L).containsSlice(origTail),
      s"prefix edit destroyed content-defined boundaries:\norig ${ch2(1L)}\nedit ${ch2(2L)}")
  }
}
