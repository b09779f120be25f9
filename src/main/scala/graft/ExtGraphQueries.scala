package graft

import graft.engine.Ckpt.BarrierOps
import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** Graph extension queries (PageRank/PPR/HITS, triangles, k-core, label propagation, walks) — extracted verbatim from ExtensionQueries in the
  * r14 per-family split; shared helpers live in
  * [[ExtQueriesBase]] (self-type), the aggregated maps in
  * [[ExtensionQueries]]. */
private[graft] trait ExtGraphQueries { this: ExtQueriesBase =>

  private[graft] def graphQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // x14: near-dup pairs closed into dedup groups (connected components,
    // min-label propagation); oracle = DuckDB recursive-CTE reachability
    "x14_dedup_groups" -> ((s, dir) =>
      Dedup.pairGroups(
        Dedup.jaccardPairs(table(s, dir, "documents"), "doc_id", "text",
          k = 3, threshold = 0.8), "id_a", "id_b")
        .orderBy(col("component"))),
    // x86: PageRank over the undirected supplier↔part co-purchase graph
    // (node ids disambiguated by parity) — tick-quantized contributions
    // make every iteration bit-exact across engines (operators/Graph)
    "x86_pagerank" -> ((s, dir) =>
      graft.operators.Graph.pageRank(
        table(s, dir, "lineitem").select(
          (col("l_suppkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst")),
        "src", "dst", iters = 5, damping = 0.85)),
    // x87: triangle counting over the part co-purchase graph (parts
    // sharing an order) — degree-ordered compact-forward wedge join, the
    // √m-bounded shape (operators/Graph.triangleStats)
    "x87_triangles" -> ((s, dir) => {
      val po = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      graft.operators.Graph.triangleStats(
        po.as("a").join(po.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("u"), col("b.pk").as("v")),
        "u", "v")
    }),
    // x95: leave-one-out target encoding — per event, the mean `value`
    // of its event_type EXCLUDING itself ((Σ−own)/(n−1)), the
    // leakage-free categorical encoder. Values quantize to integer
    // micros first (the pagerank tick trick), so the per-type sums are
    // order-independent and the encoder is bit-exact across engines.
    "x95_target_encode" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          floor(col("value") * lit(1e6) + lit(0.5)).as("vm"))
      val agg = ev.groupBy(col("event_type"))
        .agg(sum(col("vm")).as("s"), count(lit(1)).as("n"))
      ev.join(broadcast(agg), "event_type")
        .filter(col("n") > 1)
        .select(col("event_id"), col("event_type"),
          graft.functions.EngineMath.roundAway(
            (col("s") - col("vm")).cast("double") / lit(1e6) /
              (col("n") - 1).cast("double"), 6).as("loo_mean"))
        .orderBy(col("event_id"))
    }),
    // x97: deterministic random walks (DeepWalk corpus generation) over
    // the supplier↔part graph — hash-drawn hops, reproducible on any
    // engine/partitioning/retry (operators/Graph.randomWalks)
    "x97_random_walks" -> ((s, dir) =>
      graft.operators.Graph.randomWalks(
        table(s, dir, "lineitem").select(
          (col("l_suppkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst")),
        "src", "dst", steps = 4)),
    // x119: personalized PageRank — x86's tick-quantized iteration with
    // teleport mass restricted to a seed set (the "related items from
    // these seeds" ranking). Seeds broadcast (they are the query); every
    // per-round shape is x86's, so the scale story is unchanged.
    "x119_ppr" -> ((s, dir) =>
      graft.operators.Graph.personalizedPageRank(
        table(s, dir, "lineitem").select(
          (col("l_suppkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst")),
        "src", "dst",
        seeds = s.range(0, 4).select((col("id") * 2).as("node")),
        iters = 5)),
    // x130: k-core decomposition (k=75, 6 synchronous peel rounds —
    // measured: the cascade runs 3-4 rounds to a NONEMPTY fixpoint at
    // sf0.01/sf0.1 and to the correctly-empty 75-core at sf0.001; a k
    // below the degree floor would make the peel a no-op) over the
    // co-purchase part graph: the community-pruning step before graph
    // embeddings. Per round one degree aggregate + two node-keyed
    // semi-joins; localCheckpoint truncates the doubling lineage
    // (KCoreSpec pins the multi-round cascade on a planted graph).
    "x130_kcore" -> ((s, dir) => {
      val po = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val und = po.as("a").join(po.as("b"), "ok")
        .filter(col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst")).distinct()
      graft.operators.Graph.kCore(und, "src", "dst", k = 75, rounds = 6)
    }),
    // x145: synchronous mode-label propagation (2 rounds) over the part
    // co-purchase graph — the cheap community detector run before
    // sharding related content together. Each round: per (node,
    // neighbor-label) counts, then the (count DESC, label ASC) argmax —
    // fully deterministic, no damping, ties always resolve to the
    // smallest label. Per-round cost is one edge-keyed shuffle + one
    // node aggregate (the x86 iteration shape); the oracle unrolls both
    // rounds.
    // localCheckpoint (r14): labelPropagate's symmetrizing union references
    // its input twice in one plan — handing it a lazy self-join would
    // compute the co-purchase build twice.
    "x145_label_prop" -> ((s, dir) =>
      labelPropagate(coPurchaseEdges(s, dir).ckpt(), rounds = 2)
        .orderBy(col("node"))),
    // x154: modularity of the x145 label-propagation partition — the
    // "did the communities actually capture structure" score:
    // Q = Σ_c e_c/m − (d_c/2m)². ENTIRELY integer numerator
    // (4·m·Σe_c − Σd_c²) over exact edge/degree sums, one final
    // division — both engines agree bit-exactly. Shares x145's edge
    // surface and propagation helper (one definition, cannot drift).
    "x154_modularity" -> ((s, dir) => {
      // localCheckpoint, NOT persist (r14): the ONE final plan references
      // und 3× (edge count, ec join, degree build) and labels 3× (both
      // endpoint joins + dc) — persisted subtrees referenced twice per
      // plan lose cache substitution and recompute (measured ~100 s of
      // executor time at sf0.1, ≈5 rebuilds of the co-purchase edges).
      val und = coPurchaseEdges(s, dir).ckpt()
      val labels = labelPropagate(und, rounds = 2).ckpt()
      val m = und.agg(count(lit(1)).as("m"))
      val ec = und
        .join(labels.select(col("node").as("u"), col("label").as("lu")), "u")
        .join(labels.select(col("node").as("v"), col("label").as("lv")), "v")
        .filter(col("lu") === col("lv"))
        .groupBy(col("lu").as("label")).agg(count(lit(1)).as("ec"))
      val deg = und.select(col("u").as("node"))
        .union(und.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val dc = deg.join(labels, "node")
        .groupBy(col("label")).agg(sum(col("deg")).as("dc"))
      dc.join(ec, Seq("label"), "left")
        .select(col("label"), coalesce(col("ec"), lit(0L)).as("ec"),
          col("dc"))
        .agg(count(lit(1)).as("n_communities"), sum(col("ec")).as("sec"),
          sum(col("dc") * col("dc")).as("sdc2"))
        .crossJoin(broadcast(m))
        .select(col("n_communities"), col("m"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(4 * m * sec - sdc2 AS DOUBLE) / " +
              "CAST(4 * m * m AS DOUBLE)"), 6).as("q"))
    }),
    // x169: HITS hubs & authorities over the DIRECTED supplier→part
    // bipartite graph (x86's edge construction without symmetrization) —
    // the "which suppliers span many popular parts / which parts are
    // carried by the strong suppliers" mutual-reinforcement ranking
    // PageRank's single score conflates. 3 alternating L1-normalized
    // half-steps, every sum an exact integer (operators/Graph.hits);
    // top-10 per role via orderBy+limit (TakeOrderedAndProject — the
    // ranking window runs AFTER the 10-row cut, never globally).
    "x169_hits" -> ((s, dir) => {
      val ha = graft.operators.Graph.hits(
        table(s, dir, "lineitem").select(
          (col("l_suppkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst")),
        "src", "dst", iters = 3)
      def top(c: String, role: String): DataFrame = {
        val t = ha.filter(col(c).isNotNull)
          .select(col("node"), col(c).as("score"))
          .orderBy(col("score").desc, col("node")).limit(10)
        t.withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("score").desc, col("node"))).cast("long"))
          .select(lit(role).as("role"), col("rank"), col("node"),
            graft.functions.EngineMath.roundAway(col("score"), 6).as("score"))
      }
      top("auth", "auth").unionAll(top("hub", "hub"))
        .orderBy(col("role"), col("rank"))
    }),
    // x195: degree assortativity of the part co-purchase graph (x87's
    // edge set) — the one-number topology diagnostic that says whether
    // hubs link to hubs (r > 0, robust to hub removal) or to leaves
    // (r < 0, hub-and-spoke: salting the hot keys is mandatory). Pearson
    // over the degree pairs of every DIRECTED edge (both orientations, so
    // the marginals coincide); all five sufficient statistics are exact
    // integers pre-widened to DECIMAL(38,0) BEFORE any product, and r is
    // ONE shared read (AssortSql) with an exact zero-variance guard.
    // Scale: the pair-producer is x87's per-order bounded self-join; the
    // degree join is two broadcast-or-shuffle equi-joins; the stat is one
    // aggregate to 5 scalars.
    "x195_assortativity" -> ((s, dir) => {
      val po = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = po.as("a").join(po.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
        .ckpt() // consumers: the degree build + the stat pass
      val deg = edges.select(col("u").as("node"))
        .unionAll(edges.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("dg"))
        .ckpt() // consumers: node count + both endpoint joins
      val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val dp = edges
        .join(deg.select(col("node").as("u"), col("dg").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("dg").as("dv")), "v")
      dp.agg(count(lit(1)).as("n_edges"),
          sum(dec(col("du")) + dec(col("dv"))).as("sx"),
          sum(dec(col("du")) * dec(col("du"))
            + dec(col("dv")) * dec(col("dv"))).as("sxx"),
          sum(dec(col("du")) * dec(col("dv"))
            + dec(col("dv")) * dec(col("du"))).as("sxy"))
        .withColumn("m", (col("n_edges") * lit(2L)).cast("decimal(38,0)"))
        .crossJoin(broadcast(nNodes))
        .select(col("n_nodes"), col("n_edges"),
          graft.functions.EngineMath.roundAway(expr(AssortSql), 6)
            .as("assortativity"))
    }),
    // x230: average local clustering coefficient over the part
    // co-purchase graph — the Watts–Strogatz statistic x87's global
    // transitivity doesn't measure (per-vertex equal weighting vs
    // wedge-count weighting). Same √m-bounded compact-forward machinery,
    // corners exploded into one per-node aggregate
    // (operators/Graph.localClusteringStats).
    "x230_local_clustering" -> ((s, dir) => {
      val po = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      graft.operators.Graph.localClusteringStats(
        po.as("a").join(po.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("u"), col("b.pk").as("v")),
        "u", "v")
    }),
    // x236: retrieval eval — MRR and recall/precision@10 of the x10
    // brute-force ranker against same-label relevance, the IR-metrics
    // complement to x146's NDCG (which grades GRADED gains; MRR/recall
    // grade binary relevance and first-hit latency). Reuses
    // Similarity.bruteForceTopK (one broadcast of the query side);
    // per-query metrics quantize to 1e-6 ticks before the means, and
    // the relevant-corpus denominator is |same-label items| − 1.
    "x236_mrr_recall" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val labels = table(s, dir, "embeddings")
        .select(col("vec_id"), col("label"))
      val q = e.filter(col("vec_id") % 25 === 0)
      val top = Similarity.bruteForceTopK(e, "vec_id", "vec",
          q, "vec_id", "vec", k = 10)
        .join(broadcast(labels.select(col("vec_id").as("query_id"),
          col("label").as("ql"))), Seq("query_id"))
        .join(labels.select(col("vec_id").as("item_id"),
          col("label").as("il")), Seq("item_id"))
        .withColumn("rel", (col("ql") === col("il")).cast("long"))
      val relTot = labels.groupBy(col("label")).agg(count(lit(1)).as("nl"))
      val perQ = top.groupBy(col("query_id"), col("ql"))
        .agg(min(when(col("rel") === 1L, col("rank"))).as("fr"),
          sum(col("rel")).as("hits"))
        .join(broadcast(relTot.select(col("label").as("ql"),
          (col("nl") - 1).as("nrel"))), Seq("ql"))
        .select(
          expr("CAST(floor(CASE WHEN fr IS NULL THEN 0.0 " +
            "ELSE 1.0 / fr END * 1e6 + 0.5) AS BIGINT)").as("rrt"),
          expr("CAST(floor(CASE WHEN nrel > 0 THEN CAST(hits AS DOUBLE) " +
            "/ nrel ELSE 0.0 END * 1e6 + 0.5) AS BIGINT)").as("rct"),
          expr("CAST(floor(CAST(hits AS DOUBLE) / 10.0 * 1e6 + 0.5) " +
            "AS BIGINT)").as("pct"))
      perQ.agg(count(lit(1)).as("n_queries"), sum(col("rrt")).as("srr"),
          sum(col("rct")).as("src"), sum(col("pct")).as("spc"))
        .select(col("n_queries"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(srr AS DOUBLE) / 1e6 / n_queries"), 6).as("mrr"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(src AS DOUBLE) / 1e6 / n_queries"), 6)
            .as("recall_at_10"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(spc AS DOUBLE) / 1e6 / n_queries"), 6)
            .as("precision_at_10"))
    }),
    // x262: ANN recall CERTIFICATION of the production retrieval point —
    // makes "the index is good enough to ship" a hash-verified fact
    // instead of a spec assertion: per query vector, the exact
    // brute-force top-10 (the x10 machinery) against the production-LSH
    // top-10 (x11's planes=6/tables=16 point), recall = |∩|/10. The
    // engine emits EVERY query's row; the oracle re-derives BOTH sides
    // (brute force from the raw embeddings, candidates from the staged
    // buckets) and keeps a row only when recall ≥ 0.8 — in integer form
    // n_hit·10 ≥ n_true·8, no float boundary — so a sub-floor query
    // diverges row counts and fails the gate: the x251-x253
    // error-bound-oracle pattern applied to retrieval quality. Cost is
    // the brute baseline (one broadcast cross join over the 5-query
    // panel) — a certification you run per index build, not per query.
    "x262_ann_recall_cert" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val q = e.filter(col("vec_id") < 5)
      val radius = Similarity.adaptiveProbeRadius(e.count())
      Stage.write(Similarity.lshItemBuckets(e, "vec_id", "vec",
        numPlanes = 6, numTables = 16), dir, "x262_item_buckets")
      Stage.write(Similarity.lshProbeBuckets(q, "vec_id", "vec",
        numPlanes = 6, numTables = 16, probeRadius = radius),
        dir, "x262_probe_buckets")
      val brute = Similarity.bruteForceTopK(e, "vec_id", "vec",
        q, "vec_id", "vec", k = 10)
        .select(col("query_id"), col("item_id"))
      val ann = Similarity.lshTopK(e, "vec_id", "vec", q, "vec_id", "vec",
        k = 10, numPlanes = 6, numTables = 16, probeRadius = radius)
        .select(col("query_id"), col("item_id"))
      val hits = brute.join(ann, Seq("query_id", "item_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_true"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .withColumn("recall",
          graft.functions.EngineMath.roundAway(expr(RecallSql), 4))
        .orderBy(col("query_id"))
    }),
    // x256: DOULION edge-sampled triangle estimate (Tsourakakis et al.)
    // — the GATED 100 TB swap for x87's exact count: keep each canonical
    // edge iff its md5 ticket lands in 1/4 of hash space (deterministic,
    // so the estimate is reproducible and exactly re-derivable), count
    // triangles on the sampled graph with the SAME √m-bounded
    // compact-forward machinery at ~p² of the wedge work, and scale by
    // p⁻³ = 64. The oracle re-derives the full pipeline in DuckDB AND
    // keeps the row only when the estimate sits within 6σ of the exact
    // count (σ² ≈ T·(p⁻³−1), the DOULION independence bound) — the
    // x251-x253 error-bound-oracle pattern applied to a graph swap.
    // Measured: rel err 3.8% at sf0.01, 0.3% at sf0.1 vs bounds 7%/3%.
    "x256_approx_triangles" -> ((s, dir) => {
      val po = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      // localCheckpoint (r14): und feeds the sampled triangleStats AND the
      // broadcast edge count in one plan — the duplicate-reference trap.
      val und = po.as("a").join(po.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
          .ckpt()
      val sampled = und.filter(
        conv(substring(md5(concat(col("u").cast("string"), lit(":"),
          col("v").cast("string"))), 1, 8), 16, 10).cast("long") % 4 === 0)
      val st = graft.operators.Graph.triangleStats(sampled, "u", "v")
        .select(col("n_edges").as("n_sampled_edges"),
          col("n_triangles").as("tri_sampled"))
      st.crossJoin(broadcast(und.agg(count(lit(1)).as("n_edges"))))
        .select(col("n_edges"), col("n_sampled_edges"), col("tri_sampled"),
          (col("tri_sampled") * lit(64L)).as("tri_est"))
    }),
  )

  private[graft] def graphOracles: Map[String, String] = Map(
    // every hop unrolled: same rank-ordered adjacency, same md5 draw
    // ('0x'||substr(md5('rw:'||id||':'||step),1,8) % deg + 1) — paths
    // string-identical
    "x97_random_walks" -> {
      val head =
        "WITH e0 AS MATERIALIZED (SELECT DISTINCT l_suppkey * 2 AS src, " +
          "l_partkey * 2 + 1 AS dst FROM lineitem), " +
          "und AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0), " +
          "deg AS MATERIALIZED (SELECT src, count(*) AS d FROM und GROUP BY src), " +
          "adj AS MATERIALIZED (SELECT src, dst, row_number() OVER " +
          "(PARTITION BY src ORDER BY dst) AS r FROM und), " +
          "w0 AS (SELECT src AS walk_id, src AS cur, " +
          "CAST(src AS VARCHAR) AS path FROM deg)"
      def hop(i: Int) =
        s"w$i AS (SELECT w.walk_id, a.dst AS cur, " +
          "w.path || '>' || CAST(a.dst AS VARCHAR) AS path " +
          s"FROM w${i - 1} w JOIN deg ON deg.src = w.cur " +
          "JOIN adj a ON a.src = w.cur AND a.r = " +
          s"('0x' || substr(md5('rw:' || CAST(w.walk_id AS VARCHAR) || ':$i'), 1, 8))::BIGINT " +
          "% deg.d + 1)"
      head + ", " + (1 to 4).map(hop).mkString(", ") +
        " SELECT walk_id, cur AS end_node, path FROM w4 ORDER BY walk_id"
    },
    // identical micro-quantization, integer sums, fixed-order division
    "x95_target_encode" ->
      ("WITH ev AS (SELECT event_id, event_type, " +
        "CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm FROM events), " +
        "a AS (SELECT event_type, CAST(sum(vm) AS BIGINT) AS s, " +
        "CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY 1) " +
        "SELECT ev.event_id, ev.event_type, " +
        "round(CAST(a.s - ev.vm AS DOUBLE) / 1e6 / CAST(a.n - 1 AS DOUBLE), 6) AS loo_mean " +
        "FROM ev JOIN a USING (event_type) WHERE a.n > 1 ORDER BY ev.event_id"),
    "x14_dedup_groups" ->
      (s"""WITH RECURSIVE pr AS ($jaccardCte),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
         |  UNION ALL SELECT id_b, id_a FROM pr),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
         |SELECT component, min(id) AS keep_id, count(*) AS n_members
         |FROM comp GROUP BY component ORDER BY component""".stripMargin
        .replace("\n", " ")),
    // every PageRank round unrolled as a CTE with the engine's exact
    // arithmetic: integer 1e-12-tick contributions (order-independent
    // BIGINT sums), then teleport/damping/re-quantize in the same IEEE
    // operand order — ranks are bit-exact, no tolerance
    "x86_pagerank" -> {
      val head =
        "WITH e0 AS MATERIALIZED (SELECT DISTINCT l_suppkey * 2 AS src, " +
          "l_partkey * 2 + 1 AS dst FROM lineitem), " +
          "und AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0), " +
          "deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM und GROUP BY src), " +
          "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg), " +
          "r0 AS MATERIALIZED (SELECT src AS node, " +
          "floor(CAST(1.0 AS DOUBLE) / nn.n * 1e12 + 0.5) / 1e12 AS rank " +
          "FROM deg CROSS JOIN nn)"
      def iter(k: Int) =
        s"r$k AS MATERIALIZED (SELECT u.dst AS node, " +
          "floor(((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n + " +
          "CAST(0.85 AS DOUBLE) * (CAST(sum(CAST(floor(r.rank / d.deg * 1e12 + 0.5) " +
          "AS BIGINT)) AS DOUBLE) / 1e12)) * 1e12 + 0.5) / 1e12 AS rank " +
          s"FROM und u JOIN r${k - 1} r ON u.src = r.node " +
          "JOIN deg d ON d.src = u.src CROSS JOIN nn " +
          "GROUP BY u.dst, nn.n)"
      head + ", " + (1 to 5).map(iter).mkString(", ") +
        " SELECT node, rank FROM r5 ORDER BY node"
    },
    // same canonical edge set, same (degree, id) orientation, same
    // apex-wedge + closure-join counting — exact integers throughout
    "x87_triangles" ->
      ("WITH po AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem), " +
        "und AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v FROM po a " +
        "JOIN po b ON a.ok = b.ok AND a.pk < b.pk), " +
        "deg AS MATERIALIZED (SELECT x, count(*) AS d FROM " +
        "(SELECT u AS x FROM und UNION ALL SELECT v FROM und) GROUP BY x), " +
        "de AS MATERIALIZED (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) " +
        "THEN u ELSE v END AS src, " +
        "CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) " +
        "THEN v ELSE u END AS dst " +
        "FROM und JOIN deg du ON du.x = und.u JOIN deg dv ON dv.x = und.v), " +
        "wc AS (SELECT CAST(sum(od * (od - 1)) / 2 AS BIGINT) AS n_wedges " +
        "FROM (SELECT src, count(*) AS od FROM de GROUP BY src)), " +
        "tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM de e1 " +
        "JOIN de e2 ON e1.src = e2.src AND e1.dst < e2.dst " +
        "JOIN und ON und.u = e1.dst AND und.v = e2.dst), " +
        "ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und) " +
        "SELECT n_edges, n_wedges, n_triangles FROM ne CROSS JOIN wc CROSS JOIN tri"),
    // x86's unrolled tick-quantized iteration with the seed CASE: teleport
    // only where node ∈ sd (even node ids < 8 ≡ the Spark seed range —
    // supplier keys start at 0 in this corpus)
    "x119_ppr" -> {
      val head =
        "WITH e0 AS MATERIALIZED (SELECT DISTINCT l_suppkey * 2 AS src, " +
          "l_partkey * 2 + 1 AS dst FROM lineitem), " +
          "und AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0), " +
          "deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM und GROUP BY src), " +
          "sd AS MATERIALIZED (SELECT src AS node FROM deg WHERE src % 2 = 0 AND src < 8), " +
          "ns AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS ns FROM sd), " +
          "r0 AS MATERIALIZED (SELECT d.src AS node, " +
          "CASE WHEN s.node IS NOT NULL THEN " +
          "floor(CAST(1.0 AS DOUBLE) / ns.ns * 1e12 + 0.5) / 1e12 " +
          "ELSE CAST(0.0 AS DOUBLE) END AS rank " +
          "FROM deg d LEFT JOIN sd s ON s.node = d.src CROSS JOIN ns)"
      def iter(k: Int) =
        s"r$k AS MATERIALIZED (SELECT u.dst AS node, " +
          "floor((CASE WHEN s.node IS NOT NULL THEN " +
          "(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / ns.ns " +
          "ELSE CAST(0.0 AS DOUBLE) END + " +
          "CAST(0.85 AS DOUBLE) * (CAST(sum(CAST(floor(r.rank / d.deg * 1e12 + 0.5) " +
          "AS BIGINT)) AS DOUBLE) / 1e12)) * 1e12 + 0.5) / 1e12 AS rank " +
          s"FROM und u JOIN r${k - 1} r ON u.src = r.node " +
          "JOIN deg d ON d.src = u.src " +
          "LEFT JOIN sd s ON s.node = u.dst CROSS JOIN ns " +
          "GROUP BY u.dst, s.node, ns.ns)"
      head + ", " + (1 to 5).map(iter).mkString(", ") +
        " SELECT node, rank FROM r5 ORDER BY node"
    },
    // the same 6 peel rounds unrolled — degree aggregate + two endpoint
    // semi-joins per round over the same canonical co-purchase edges
    "x130_kcore" -> {
      val head =
        "WITH po AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem), " +
          "e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v FROM po a " +
          "JOIN po b ON a.ok = b.ok AND a.pk < b.pk)"
      def round(i: Int) =
        s"d$i AS MATERIALIZED (SELECT x, count(*) AS c FROM " +
          s"(SELECT u AS x FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1}) GROUP BY x), " +
          s"k$i AS MATERIALIZED (SELECT x FROM d$i WHERE c >= 75), " +
          s"e$i AS MATERIALIZED (SELECT e${i - 1}.u, e${i - 1}.v FROM e${i - 1} " +
          s"JOIN k$i a ON a.x = e${i - 1}.u JOIN k$i b ON b.x = e${i - 1}.v)"
      head + ", " + (1 to 6).map(round).mkString(", ") +
        " SELECT x AS node, CAST(count(*) AS BIGINT) AS deg FROM " +
        "(SELECT u AS x FROM e6 UNION ALL SELECT v FROM e6) GROUP BY x ORDER BY node"
    },
    // both rounds unrolled: the identical (count DESC, label ASC)
    // per-node argmax over neighbor labels
    "x145_label_prop" ->
      ("""WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |ud AS (SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk),
         |ed AS (SELECT u, v FROM ud UNION ALL SELECT v AS u, u AS v FROM ud),
         |r1 AS (SELECT node, label FROM (
         |  SELECT e.u AS node, e.v AS label, count(*) AS cnt,
         |    row_number() OVER (PARTITION BY e.u ORDER BY count(*) DESC, e.v) AS rk
         |  FROM ed e GROUP BY 1, 2) WHERE rk = 1),
         |r2 AS (SELECT node, label FROM (
         |  SELECT e.u AS node, l.label AS label, count(*) AS cnt,
         |    row_number() OVER (PARTITION BY e.u ORDER BY count(*) DESC, l.label) AS rk
         |  FROM ed e JOIN r1 l ON l.node = e.v GROUP BY 1, 2) WHERE rk = 1)
         |SELECT node, CAST(label AS BIGINT) AS label FROM r2 ORDER BY node"""
        .stripMargin.replace("\n", " ")),
    // x145's unrolled propagation + the same integer 4·m·Σe_c − Σd_c²
    // numerator
    "x154_modularity" ->
      ("""WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |ud AS (SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk),
         |ed AS (SELECT u, v FROM ud UNION ALL SELECT v AS u, u AS v FROM ud),
         |r1 AS (SELECT node, label FROM (
         |  SELECT e.u AS node, e.v AS label, count(*) AS cnt,
         |    row_number() OVER (PARTITION BY e.u ORDER BY count(*) DESC, e.v) AS rk
         |  FROM ed e GROUP BY 1, 2) WHERE rk = 1),
         |r2 AS (SELECT node, label FROM (
         |  SELECT e.u AS node, l.label AS label, count(*) AS cnt,
         |    row_number() OVER (PARTITION BY e.u ORDER BY count(*) DESC, l.label) AS rk
         |  FROM ed e JOIN r1 l ON l.node = e.v GROUP BY 1, 2) WHERE rk = 1),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ud),
         |ec AS (SELECT l1.label, CAST(count(*) AS BIGINT) AS ec FROM ud
         |  JOIN r2 l1 ON l1.node = ud.u JOIN r2 l2 ON l2.node = ud.v
         |  WHERE l1.label = l2.label GROUP BY 1),
         |dg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY 1),
         |dc AS (SELECT r2.label, CAST(sum(dg.deg) AS BIGINT) AS dc
         |  FROM dg JOIN r2 ON r2.node = dg.node GROUP BY 1),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
         |    CAST(sum(coalesce(ec.ec, 0)) AS BIGINT) AS sec,
         |    CAST(sum(dc.dc * dc.dc) AS BIGINT) AS sdc2
         |  FROM dc LEFT JOIN ec ON ec.label = dc.label)
         |SELECT n_communities, m,
         |  round(CAST(4 * m * sec - sdc2 AS DOUBLE) / CAST(4 * m * m AS DOUBLE), 6) AS q
         |FROM s CROSS JOIN mm""".stripMargin.replace("\n", " ")),
    // same distinct co-purchase edge set, degrees from both endpoints,
    // HUGEINT (≡ DECIMAL(38,0)) pre-widening BEFORE any product, the
    // SHARED AssortSql read
    "x195_assortativity" ->
      (s"""WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
         |  FROM lineitem),
         |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk),
         |dg AS (SELECT node, CAST(count(*) AS BIGINT) AS dg FROM
         |  (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
         |  GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM dg),
         |dp AS (SELECT CAST(du.dg AS HUGEINT) AS du,
         |    CAST(dv.dg AS HUGEINT) AS dv
         |  FROM e JOIN dg du ON du.node = e.u JOIN dg dv ON dv.node = e.v),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
         |    CAST(sum(du + dv) AS HUGEINT) AS sx,
         |    CAST(sum(du * du + dv * dv) AS HUGEINT) AS sxx,
         |    CAST(sum(du * dv + dv * du) AS HUGEINT) AS sxy,
         |    CAST(count(*) * 2 AS HUGEINT) AS m FROM dp)
         |SELECT n_nodes, n_edges, round($AssortSql, 6) AS assortativity
         |FROM st CROSS JOIN nn""".stripMargin.replace("\n", " ")),
    // same directed edge set, the x86 unrolled-iteration device with
    // HITS's alternating half-steps: tick-quantized contributions, exact
    // integer normalizers, one 12-dp-rounded division per score
    "x169_hits" -> {
      val head =
        "WITH e AS MATERIALIZED (SELECT DISTINCT l_suppkey * 2 AS src, " +
          "l_partkey * 2 + 1 AS dst FROM lineitem), " +
          "nn AS MATERIALIZED (SELECT CAST(count(DISTINCT src) AS DOUBLE) AS n FROM e), " +
          "h0 AS MATERIALIZED (SELECT src AS node, " +
          "floor(CAST(1.0 AS DOUBLE) / nn.n * 1e12 + 0.5) / 1e12 AS sc " +
          "FROM (SELECT DISTINCT src FROM e) CROSS JOIN nn)"
      def aStep(k: Int) =
        s"a${k}r AS MATERIALIZED (SELECT e.dst AS node, " +
          "CAST(sum(CAST(floor(h.sc * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS r " +
          s"FROM e JOIN h${k - 1} h ON e.src = h.node GROUP BY 1), " +
          s"a$k AS MATERIALIZED (SELECT node, " +
          "round(CAST(r AS DOUBLE) / CAST(s AS DOUBLE), 12) AS sc " +
          s"FROM a${k}r CROSS JOIN (SELECT CAST(sum(r) AS BIGINT) AS s FROM a${k}r))"
      def hStep(k: Int) =
        s"h${k}r AS MATERIALIZED (SELECT e.src AS node, " +
          "CAST(sum(CAST(floor(a.sc * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS r " +
          s"FROM e JOIN a$k a ON e.dst = a.node GROUP BY 1), " +
          s"h$k AS MATERIALIZED (SELECT node, " +
          "round(CAST(r AS DOUBLE) / CAST(s AS DOUBLE), 12) AS sc " +
          s"FROM h${k}r CROSS JOIN (SELECT CAST(sum(r) AS BIGINT) AS s FROM h${k}r))"
      def topCte(name: String, role: String, from: String) =
        s"$name AS (SELECT '$role' AS role, " +
          "CAST(row_number() OVER (ORDER BY sc DESC, node) AS BIGINT) AS rank, " +
          s"node, round(sc, 6) AS score FROM $from ORDER BY sc DESC, node LIMIT 10)"
      head + ", " + (1 to 3).map(k => aStep(k) + ", " + hStep(k)).mkString(", ") +
        ", " + topCte("topa", "auth", "a3") + ", " + topCte("toph", "hub", "h3") +
        " SELECT * FROM topa UNION ALL SELECT * FROM toph ORDER BY role, rank"
    },
    // x87's orientation CTEs verbatim, the closure join keeping all three
    // corners, unnested into the per-node count; the same tick string
    // quantizes each coefficient before the order-independent integer sum
    "x230_local_clustering" ->
      ("WITH po AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem), " +
        "und AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v FROM po a " +
        "JOIN po b ON a.ok = b.ok AND a.pk < b.pk), " +
        "deg AS MATERIALIZED (SELECT x, CAST(count(*) AS BIGINT) AS d FROM " +
        "(SELECT u AS x FROM und UNION ALL SELECT v FROM und) GROUP BY x), " +
        "de AS MATERIALIZED (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) " +
        "THEN u ELSE v END AS src, " +
        "CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) " +
        "THEN v ELSE u END AS dst " +
        "FROM und JOIN deg du ON du.x = und.u JOIN deg dv ON dv.x = und.v), " +
        "tt AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c FROM de e1 " +
        "JOIN de e2 ON e1.src = e2.src AND e1.dst < e2.dst " +
        "JOIN und ON und.u = e1.dst AND und.v = e2.dst), " +
        "tc AS (SELECT x, CAST(count(*) AS BIGINT) AS t FROM " +
        "(SELECT unnest([a, b, c]) AS x FROM tt) GROUP BY x), " +
        "pn AS (SELECT deg.d, coalesce(tc.t, 0) AS t FROM deg " +
        "LEFT JOIN tc ON tc.x = deg.x WHERE deg.d >= 2), " +
        s"q AS (SELECT d, t, ${graft.operators.Graph.LccTickSql} AS lq FROM pn) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_nodes, " +
        "CAST(sum(CASE WHEN t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_closed, " +
        "round(CAST(sum(lq) AS DOUBLE) / 1e9 / count(*), 6) AS avg_lcc " +
        "FROM q"),
    // x10's cross-join ranking verbatim (cosSql, same tie-break), labels
    // joined back, the same tick quantization per query before the means
    "x236_mrr_recall" ->
      (s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id % 25 = 0),
         |i AS (SELECT vec_id AS item_id, embedding::DOUBLE[] AS iv FROM embeddings),
         |lb AS (SELECT vec_id, label FROM embeddings),
         |top AS (SELECT query_id, item_id, rank FROM (
         |  SELECT query_id, item_id, $cosSql AS cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank
         |  FROM i CROSS JOIN q WHERE item_id != query_id) WHERE rank <= 10),
         |tl AS (SELECT t.query_id, t.rank,
         |    CASE WHEN ql.label = il.label THEN 1 ELSE 0 END AS rel
         |  FROM top t JOIN lb ql ON ql.vec_id = t.query_id
         |  JOIN lb il ON il.vec_id = t.item_id),
         |rt AS (SELECT label, CAST(count(*) AS BIGINT) AS nl FROM lb GROUP BY 1),
         |pq AS (SELECT query_id, min(CASE WHEN rel = 1 THEN rank END) AS fr,
         |    CAST(sum(rel) AS BIGINT) AS hits FROM tl GROUP BY 1),
         |pq2 AS (SELECT pq.query_id, pq.fr, pq.hits, rt.nl - 1 AS nrel
         |  FROM pq JOIN lb ON lb.vec_id = pq.query_id JOIN rt ON rt.label = lb.label),
         |tk AS (SELECT
         |    CAST(floor(CASE WHEN fr IS NULL THEN 0.0 ELSE 1.0 / fr END * 1e6 + 0.5) AS BIGINT) AS rrt,
         |    CAST(floor(CASE WHEN nrel > 0 THEN CAST(hits AS DOUBLE) / nrel ELSE 0.0 END * 1e6 + 0.5) AS BIGINT) AS rct,
         |    CAST(floor(CAST(hits AS DOUBLE) / 10.0 * 1e6 + 0.5) AS BIGINT) AS pct
         |  FROM pq2)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  round(CAST(sum(rrt) AS DOUBLE) / 1e6 / count(*), 6) AS mrr,
         |  round(CAST(sum(rct) AS DOUBLE) / 1e6 / count(*), 6) AS recall_at_10,
         |  round(CAST(sum(pct) AS DOUBLE) / 1e6 / count(*), 6) AS precision_at_10
         |FROM tk""".stripMargin.replace("\n", " ")),
    // x87's exact CTEs on BOTH the full and the hash-sampled edge set;
    // the WHERE is the DOULION 6σ bound — an estimator outside it drops
    // the single oracle row and fails the compare
    "x256_approx_triangles" ->
      ("""WITH po AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |und AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v FROM po a
         |  JOIN po b ON a.ok = b.ok AND a.pk < b.pk),
         |sm AS MATERIALIZED (SELECT u, v FROM und
         |  WHERE ('0x' || substr(md5(CAST(u AS VARCHAR) || ':' || CAST(v AS VARCHAR)), 1, 8))::BIGINT % 4 = 0),
         |degf AS (SELECT x, count(*) AS d FROM
         |  (SELECT u AS x FROM und UNION ALL SELECT v FROM und) GROUP BY x),
         |def_ AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS src,
         |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS dst
         |  FROM und JOIN degf du ON du.x = und.u JOIN degf dv ON dv.x = und.v),
         |trif AS (SELECT CAST(count(*) AS BIGINT) AS t FROM def_ e1
         |  JOIN def_ e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  JOIN und ON und.u = e1.dst AND und.v = e2.dst),
         |degs AS (SELECT x, count(*) AS d FROM
         |  (SELECT u AS x FROM sm UNION ALL SELECT v FROM sm) GROUP BY x),
         |des AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS src,
         |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS dst
         |  FROM sm JOIN degs du ON du.x = sm.u JOIN degs dv ON dv.x = sm.v),
         |tris AS (SELECT CAST(count(*) AS BIGINT) AS t FROM des e1
         |  JOIN des e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  JOIN sm ON sm.u = e1.dst AND sm.v = e2.dst),
         |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und),
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sampled_edges FROM sm)
         |SELECT ne.n_edges, ns.n_sampled_edges, tris.t AS tri_sampled,
         |  CAST(tris.t * 64 AS BIGINT) AS tri_est
         |FROM ne CROSS JOIN ns CROSS JOIN trif CROSS JOIN tris
         |WHERE abs(tris.t * 64.0 - trif.t) <= 6.0 * sqrt(63.0 * trif.t) + 64""".stripMargin.replace("\n", " ")),
    // both halves re-derived independently: brute force from the raw
    // embeddings (the x10 derivation), the LSH side from the STAGED
    // bucket tables (the x11 derivation), identical (cos DESC, item_id)
    // tie-breaks — then the ERROR-BOUND filter: a row survives only at
    // recall ≥ 0.8 (integer form, no float boundary), so a sub-floor
    // production index diverges row counts and fails the gate
    "x262_ann_recall_cert" ->
      (s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |i AS (SELECT vec_id AS item_id, embedding::DOUBLE[] AS iv FROM embeddings),
         |br AS (SELECT query_id, item_id FROM (
         |  SELECT query_id, item_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY $cosSql DESC, item_id) AS rank
         |  FROM i CROSS JOIN q WHERE item_id != query_id) WHERE rank <= 10),
         |it AS (SELECT id AS item_id, t, sig FROM ${Stage.sqlRef("x262_item_buckets")}),
         |pr AS (SELECT DISTINCT id AS query_id, t, sig FROM ${Stage.sqlRef("x262_probe_buckets")}),
         |cand AS (SELECT DISTINCT b.query_id, a.item_id FROM it a
         |  JOIN pr b ON a.t = b.t AND a.sig = b.sig
         |  WHERE a.item_id != b.query_id),
         |ar AS (SELECT query_id, item_id FROM (
         |  SELECT c.query_id, c.item_id,
         |    row_number() OVER (PARTITION BY c.query_id
         |      ORDER BY $cosSql DESC, c.item_id) AS rank
         |  FROM cand c JOIN i ON i.item_id = c.item_id
         |  JOIN q ON q.query_id = c.query_id) WHERE rank <= 10),
         |tr AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_true
         |  FROM br GROUP BY 1),
         |ht AS (SELECT br.query_id, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM br JOIN ar ON ar.query_id = br.query_id
         |    AND ar.item_id = br.item_id GROUP BY 1),
         |f AS (SELECT tr.query_id, n_true,
         |    CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit
         |  FROM tr LEFT JOIN ht ON ht.query_id = tr.query_id)
         |SELECT query_id, n_true, n_hit, round($RecallSql, 4) AS recall
         |FROM f WHERE n_hit * 10 >= n_true * 8 ORDER BY query_id"""
        .stripMargin.replace("\n", " ")),
  )
}
