package graft

/** Pins the physical-plan invariants the scale story rests on (PLANS.md is
  * the generated evidence; this spec makes regressions fail the build).
  * Runs every batch query at sf0.001 through PlanAudit.
  */
class PlanSpec extends SparkSpec {

  private val skip = PlanAudit.skip

  /** Per-query audit, failure-capturing: a query that fails to even build
    * (analysis error, bad testdata) must fail only the pins that inspect
    * it — not every pin in the file via a lazy-val init crash.
    */
  private lazy val tried: Map[String, Either[Throwable, PlanAudit.Audit]] =
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => skip(q._1))
      .map { case (name, fn) =>
        val a = scala.util.Try {
          val r = PlanAudit.audit(name, fn(spark, sf()))
          graft.engine.CacheScope.drain()
          r
        }.toEither
        if (a.isLeft) graft.engine.CacheScope.drain()
        name -> a
      }.toMap

  private def audits(name: String): PlanAudit.Audit =
    tried(name).fold(
      e => fail(s"$name failed to build: ${e.getMessage.linesIterator.next()}"),
      identity)

  private def built: Iterable[PlanAudit.Audit] =
    tried.values.collect { case Right(a) => a }

  test("every batch query builds a physical plan") {
    val broken = tried.collect { case (n, Left(e)) =>
      s"$n: ${e.getMessage.linesIterator.next()}" }
    assert(broken.isEmpty, s"queries failing to build:\n${broken.mkString("\n")}")
  }

  test("PLANS.md carries an audit row for every batch query") {
    // the generated artifact must keep pace with SparkEntry: a query
    // landing without a regenerated PLANS.md (the r9 x172-x175 gap)
    // fails the build instead of shipping unaudited. Streaming/DDL
    // queries are the documented exclusions (PlanAudit.skip).
    val md = java.nio.file.Files.readString(java.nio.file.Paths.get("PLANS.md"))
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skip).filterNot(n => md.contains(s"| $n |"))
    assert(missing.isEmpty,
      s"queries with no PLANS.md audit row (rerun graft.PlanAudit): $missing")
  }

  test("no query plans a shuffled cartesian product") {
    val offenders = built.filter(_.cartesian > 0).map(_.name)
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("point/range cuts reach the parquet scan as pushed filters") {
    for (q <- Seq("a02_point_lookup", "a06_point_cut", "a07_range_cut",
        "a08_multi_cut", "b12_compound_filter")) {
      assert(audits(q).scansWithPushdown > 0, s"$q: no pushed filters")
    }
  }

  test("enrichment joins broadcast the dimension side (no sort-merge)") {
    assert(audits("b05_broadcast_enrich").broadcastJoins > 0)
    assert(audits("b05_broadcast_enrich").sortMergeJoins == 0)
  }

  test("exact dedup is a bounded-shuffle hash aggregate") {
    assert(audits("x05_dedup_exact").shuffles <= 2,
      s"x05 shuffles=${audits("x05_dedup_exact").shuffles}")
  }

  test("as-of join stays within its one-shuffle-plus-output design") {
    // union + per-key window = 1 data shuffle; ordered output + AQE
    // coalescing may add up to 2 more exchanges, never a join explosion
    val a = audits("x18_asof_join")
    assert(a.shuffles <= 3 && a.cartesian == 0 && a.nestedLoopJoins == 0,
      a.toString)
  }

  test("interval join never falls back to nested-loop/cartesian") {
    val a = audits("x19_range_join")
    assert(a.nestedLoopJoins == 0 && a.cartesian == 0, a.toString)
  }

  test("keyset tokens reach the parquet scan as pushed filters") {
    // a20 (facts factKey range), a22 (below the aggregation), a23 (below
    // the distinct): the whole point of the keyset design is scan-level
    // pruning — a missing pushdown silently degrades to offset-grade cost
    for (q <- Seq("a20_keyset_page", "a22_keyset_cells", "a23_keyset_members"))
      assert(audits(q).scansWithPushdown > 0, s"$q: keyset predicate not pushed")
  }

  test("corpus-shaping plans keep their scale shapes") {
    // chunking: pipelined posexplode — only the output-order exchange
    assert(audits("x39_chunk").shuffles <= 1, audits("x39_chunk").toString)
    // decontamination: benchmark grams broadcast, never a sort-merge of
    // corpus grams
    val d = audits("x40_decontaminate")
    assert(d.broadcastJoins > 0 && d.sortMergeJoins == 0, d.toString)
    // packing: the sharded prefix-sum window + output order, nothing more
    assert(audits("x41_pack").shuffles <= 2, audits("x41_pack").toString)
  }

  test("round-5 corpus operators keep their scale shapes") {
    // CDC chunking: pipelined posexplode — the output-order exchange plus
    // (on narrow test inputs only) the r15 widen repartition in front of
    // the per-doc tokenize+md5 chain; widen() is a no-op when the input
    // already has ≥ shuffle-partitions partitions, so at scale this plan
    // is back to the single output-order exchange. Never a join.
    val c = audits("x57_cdc_chunk")
    assert(c.shuffles <= 2 &&
      c.broadcastJoins + c.sortMergeJoins + c.nestedLoopJoins == 0, c.toString)
    // repeated spans: gram totals come from a window over the SAME frame —
    // a sort-merge join here means the aggregate+self-join shape crept back
    assert(audits("x60_repeated_spans").sortMergeJoins == 0,
      audits("x60_repeated_spans").toString)
    // hashed TF: two hash aggregates + ordered output, no joins
    val h = audits("x64_hashed_tf")
    assert(h.shuffles <= 3 && h.sortMergeJoins + h.nestedLoopJoins == 0,
      h.toString)
    // CMS candidates read the persisted token table, not parquet (the
    // a17-style cache pin: a parquet scan means substitution broke)
    assert(audits("x55_cms_heavy_hitters").scans == 0,
      audits("x55_cms_heavy_hitters").toString)
  }

  test("PQ ADC plans broadcast the codebook/sub-distance tables (never shuffle them)") {
    // the qparts cross join is explicitly broadcast (Pq.qpartsOf) so the
    // plan cannot regress to a shuffled cartesian or sort-merge if AQE's
    // size estimate drifts; the only joins in the PQ family are broadcasts
    // of O(m·ksub·queries)-row sides against the partition-parallel codes
    for (q <- Seq("x51_knn_pq", "x52_knn_ivfpq")) {
      val a = audits(q)
      assert(a.cartesian == 0 && a.sortMergeJoins == 0,
        s"$q lost its broadcast-only join shape: $a")
      assert(a.broadcastJoins + a.nestedLoopJoins > 0,
        s"$q: expected broadcast joins in the ADC path: $a")
    }
  }

  test("round-6 corpus operators keep their scale shapes") {
    // line dedup: the boilerplate set joins broadcast (it is tiny by
    // construction), never a sort-merge of the line table against itself
    val l = audits("x66_line_dedup")
    assert(l.sortMergeJoins == 0 && l.cartesian == 0, l.toString)
    // DSIR: dim-row bucket tables broadcast into the per-(doc,bucket)
    // join; a sort-merge here means the broadcast hint regressed
    val d = audits("x68_dsir_weights")
    assert(d.sortMergeJoins == 0 && d.cartesian == 0, d.toString)
    // dHash pairs ride the simhash banding engine: equi-join on bucket
    // keys, never a cartesian
    assert(audits("x69_image_dhash").cartesian == 0,
      audits("x69_image_dhash").toString)
    // quality-model scoring is a single projection: the collected weights
    // are foldable literals, so NO join appears in the plan at all
    val q = audits("x70_quality_model")
    assert(q.broadcastJoins + q.sortMergeJoins + q.nestedLoopJoins == 0,
      s"x70 scoring must be join-free: $q")
  }

  test("round-8 corpus operators keep their scale shapes") {
    // repetition (x73): explode + two keyed aggregates + two left joins —
    // never a cartesian, and the per-doc metrics must not sort-merge the
    // token table against itself
    val r = audits("x73_repetition")
    assert(r.cartesian == 0 && r.nestedLoopJoins == 0, r.toString)
    // substring dedup (x74): gram-keyed equi-joins only; a cartesian or
    // BNLJ means the span/coverage logic regressed to all-pairs
    val sd = audits("x74_substring_dedup")
    assert(sd.cartesian == 0 && sd.nestedLoopJoins == 0, sd.toString)
    // wide dHash (x79): same banding engine over a two-word signature —
    // equi-join on bucket keys, never a cartesian
    val wd = audits("x79_image_dhash_wide")
    assert(wd.cartesian == 0 && wd.nestedLoopJoins == 0, wd.toString)
    // BPE pair counts (x85): one linear histogram → explode → aggregate
    // chain — any join means the word histogram collapse was lost
    val bp = audits("x85_bpe_pairs")
    assert(bp.scans == 1 && bp.sortMergeJoins == 0 && bp.broadcastJoins == 0,
      bp.toString)
    // triangles (x87): equi-joins only — a cartesian/BNLJ beyond the
    // three single-row stat combiners means the wedge enumeration
    // regressed to all-pairs (the crossJoins of 1-row aggregates plan
    // as broadcast NLJs and are capped at the observed 2)
    val tr = audits("x87_triangles")
    assert(tr.cartesian == 0 && tr.nestedLoopJoins <= 2, tr.toString)
    // AUC (x88): the rank window must run over the grouped-by-score
    // frame; more than one sort-exchange pair means it regressed to a
    // per-row global rank
    val au = audits("x88_model_auc")
    assert(au.cartesian == 0, au.toString)
    // PMI (x89): bigram/unigram equi-joins + single-row totals — never
    // a cartesian over the vocabulary
    val pm = audits("x89_pmi_collocations")
    assert(pm.cartesian == 0, pm.toString)
    // profiling (x90): ONE scan feeds the multi-distinct aggregate — a
    // second scan means the per-column stats regressed to per-column jobs
    val pf = audits("x90_profile")
    assert(pf.scans == 1 && pf.cartesian == 0 && pf.nestedLoopJoins == 0,
      pf.toString)
    // SNM (x91): the window-offset probe is an EQUI-join on (block,
    // rank+k) — a nested loop means it regressed to a rank-inequality
    // range join over every block
    val sn = audits("x91_snm_pairs")
    assert(sn.cartesian == 0 && sn.nestedLoopJoins == 0, sn.toString)
    // winsorize (x94) / target-encode (x95): the per-group stats frame
    // must broadcast back onto the row side, never sort-merge it
    for (q <- Seq("x94_winsorize", "x95_target_encode")) {
      val a = audits(q)
      assert(a.sortMergeJoins == 0 && a.broadcastJoins >= 1, a.toString)
    }
    // entropy (x96): one linear explode→aggregate chain, no joins
    val en = audits("x96_token_entropy")
    assert(en.scans == 1 && en.broadcastJoins == 0 && en.sortMergeJoins == 0,
      en.toString)
    // epoch shards (x98): the 256-row offset frame must broadcast back
    // onto the row side — a sort-merge there means the global rank
    // regressed to shuffling row-scale data against the offsets
    val ep = audits("x98_epoch_shards")
    assert(ep.broadcastJoins >= 1 && ep.sortMergeJoins == 0 &&
      ep.cartesian == 0, ep.toString)
    // vocab encode (x99): one scan, zero joins/shuffles before the
    // output sort — the vocabulary rides in the plan as a literal
    val ve = audits("x99_vocab_encode")
    assert(ve.scans == 1 && ve.broadcastJoins == 0 && ve.sortMergeJoins == 0,
      ve.toString)
    // curriculum shards (x100): same broadcast-offsets shape as x98 —
    // the band×bucket frame must never sort-merge against the rows
    val cu = audits("x100_curriculum_shards")
    assert(cu.broadcastJoins >= 1 && cu.sortMergeJoins == 0 &&
      cu.cartesian == 0, cu.toString)
    // decayed activity (x101): the single-row tmax combiner plans as a
    // broadcast NLJ (capped at 1); the event rows themselves must never
    // sort-merge or cartesian
    val da = audits("x101_decayed_activity")
    assert(da.cartesian == 0 && da.nestedLoopJoins <= 1 &&
      da.sortMergeJoins == 0, da.toString)
  }

  test("share-of-total serves cells from the cached rollup (no second cube scan)") {
    // a17's denominator is collected from the persisted rollup and embedded
    // as a literal; the returned cells frame must read the SAME cache — a
    // parquet scan in its final plan means the rollup was recomputed (the
    // DeduplicateRelations cache-miss this design explicitly avoids)
    val a = audits("a17_share_of_total")
    assert(a.scans == 0, s"a17 re-scanned parquet instead of the cache: $a")
  }

  test("tfidf is one linear plan over a single token explode") {
    // x42's df comes from a window over the SAME tf frame — no second
    // aggregate + self-join, so the exploded token table cannot be
    // recomputed. Two scans are legitimate (token explode + the broadcast
    // doc-count); a third means the explode subtree got duplicated (the
    // DeduplicateRelations cache-substitution trap this shape retired)
    val a = audits("x42_tfidf")
    assert(a.scans <= 2 && a.sortMergeJoins == 0, a.toString)
  }

  test("every non-trivial query runs inside whole-stage codegen") {
    val uncodegened = built
      .filter(a => a.codegenSpans == 0 && a.shuffles > 0).map(_.name)
    assert(uncodegened.isEmpty,
      s"queries with shuffles but no codegen span: $uncodegened")
  }
}
