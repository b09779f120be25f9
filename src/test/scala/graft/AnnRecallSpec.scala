package graft

import java.nio.file.{Files, Paths}

import graft.operators.AnnFrontier

/** Measures the recall@10-vs-latency FRONTIER of every approximate ANN
  * family against the exact brute-force top-10 (x10) — the production
  * parameters the x11/x13/x51/x52 queries use PLUS the recall-targeted
  * parameters ([[AnnFrontier]]) — and publishes the table into
  * COVERAGE.md. The oracle rows prove each path computes ITS OWN
  * contract exactly; this artifact records what retrieval quality each
  * speed/memory trade buys, and pins that ≥0.8 recall@10 is REACHABLE
  * in every family at documented cost (the r12 verdict's demand):
  *
  *  - LSH: fewer planes (6) + more tables (16) — denser buckets, more
  *    independent chances; cost ~2× the x11 point, recall ~1.0.
  *  - IVF: K scaled with the corpus (SemDedup.scaledK) + nProbe = K/2 —
  *    probes half the corpus; at sf0.1 the same latency as nProbe=3/8
  *    because the per-bucket scans parallelize.
  *  - PQ / IVF×PQ re-rank: m=8 codebooks (8 B/vec instead of 4) +
  *    candidate pool C=1000 — the ADC ordering sharpens AND the re-rank
  *    window widens; C is corpus-size-independent, so the cost is flat
  *    at scale.
  */
class AnnRecallSpec extends SparkSpec {

  test("ANN recall@10 frontier vs brute force at sf0.01 + sf0.1; every family reaches >=0.8; COVERAGE.md block refreshed") {
    val rows = AnnFrontier.sweep(spark, sf("sf0.01")).map(("sf0.01", _)) ++
      AnnFrontier.sweep(spark, sf("sf0.1")).map(("sf0.1", _))
    rows.foreach { case (sfName, r) =>
      info(f"$sfName ${r.family} ${r.params}: recall@10 ${r.recall}%.2f " +
        f"(${r.seconds}%.2fs)")
    }
    rows.foreach { case (sfName, r) =>
      // targeted rows carry the r12-verdict bar; production rows keep
      // the calibrated mechanism floors (chance@10 is k/N ≈ 0.02/0.002);
      // ADC-only rows record the compressed-domain floor for the 64×
      // memory trade
      val floor =
        if (r.targeted) 0.8
        else if (r.params.contains("x51")) 0.5
        else if (r.params.contains("x52")) 0.4
        else if (r.family.contains("ADC-only")) 0.05
        else if (r.family == "LSH") 0.25 else 0.4
      assert(r.recall >= floor,
        f"$sfName ${r.family} ${r.params}: recall ${r.recall}%.2f below " +
          f"floor $floor")
    }
    val path = Paths.get("COVERAGE.md")
    val begin = "<!-- ann-recall:begin -->"
    val end = "<!-- ann-recall:end -->"
    // generated rows stay OUT of stripMargin (it would eat their leading
    // table pipe)
    val table =
      s"""$begin
         |Measured by AnnRecallSpec (AnnFrontier.sweep) against the exact
         |brute-force top-10 (x10). Bold rows are the PRODUCTION points
         |the gated x11/x13/x51/x52 queries run since r14 (each ≥0.8
         |recall@10, spec-floored); the pre-r14 rows stay as the cheaper
         |low-recall references. Seconds are steady-state on
         |the test session — comparable within the table only. PQ
         |ADC-only rows rank by reconstruction distance, so their recall
         |trades against the 64× memory compression; candidate-restricted
         |exact paths trade only against pruning.
         |
         || sf | family | parameters | recall@10 | seconds |
         ||---|---|---|---|---|""".stripMargin + "\n" +
        rows.map { case (sfName, r) =>
          val b = if (r.targeted) "**" else ""
          f"| $sfName | ${r.family} | $b${r.params}$b | $b${r.recall}%.2f$b " +
            f"| ${r.seconds}%.2f |"
        }.mkString("\n") + s"\n$end"
    val current = new String(Files.readAllBytes(path), "UTF-8")
    val updated =
      if (current.contains(begin))
        current.substring(0, current.indexOf(begin)) + table +
          current.substring(current.indexOf(end) + end.length)
      else
        current + s"\n## Measured ANN recall (sf-scaled, spec-generated)\n\n$table\n"
    Files.write(path, updated.getBytes("UTF-8")): Unit
  }
}
