package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.FitFamilies]] (which suite queries consume which memoized
  * fit family) to the SOURCE, so the selective fit pre-warm cannot drift:
  * a new query that calls `qlrScoredLab` / `ivfCentroids` / `pqCodebooks`
  * or opens a direct `Fitted.key(dir, "<algo>"` site must appear in its
  * family's member set, or a subset bench run naming it would pay the
  * family's cold fit inside its own timing — the exact 'random victim'
  * smearing the pre-warm exists to eliminate.
  *
  * Same mechanical-sweep approach as WindowSweepSpec: scan
  * ExtensionQueries.scala, label each fit entry point by its enclosing
  * query key, and compare the derived membership with the hand map.
  * Sites inside the top-of-file helper defs (before any query key) label
  * as "?" and are skipped — their CONSUMERS are the helper call sites.
  */
class BenchSpec extends AnyFunSuite {

  private val helperToFamily = Map(
    "ivfCentroids(" -> "ivf",
    // the corpus-scaled K fit: shared by x54 (semCentroids at scaledK)
    // and, since r14, the production x13/x52 geometry (scaledIvf) —
    // ivfCentroids/pqCodebooks delegate from helper territory and are
    // skipped
    "semCentroids(" -> "sem",
    "scaledIvf(" -> "sem",
    "pqCodebooks(" -> "pq",
    "pqCodebooksM(" -> "pq8",
    "qlrScoredLab(" -> "qlr")

  /** The split query files (r14): the family traits plus the base — the
    * fit sweep walks all of them, labeling each site by the enclosing
    * query key WITHIN ITS FILE (helper-territory sites stay "?").
    */
  private def queryFiles: Seq[java.nio.file.Path] = {
    val dir = java.nio.file.Paths.get("src/main/scala/graft")
    val s = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("Ext") ||
          p.getFileName.toString == "ExtensionQueries.scala")
        .toSeq.sortBy(_.toString)
    } finally s.close()
  }

  private def derived(): Map[String, Set[String]] = {
    val keyPat = java.util.regex.Pattern.compile(
      "\"([a-z][0-9a-z_]*)\"\\s*->\\s*\\(\\(")
    val fams = scala.collection.mutable.Map.empty[String, Set[String]]
      .withDefaultValue(Set.empty)
    for (f <- queryFiles) {
      val src = java.nio.file.Files.readString(f)
      def enclosing(offset: Int): String = {
        val m = keyPat.matcher(src.substring(0, offset))
        var last = "?"
        while (m.find()) last = m.group(1)
        last
      }
      // direct Fitted.key sites
      val direct = java.util.regex.Pattern.compile(
        "Fitted\\.key\\(dir,\\s*\"([a-z]+)\"").matcher(src)
      while (direct.find()) {
        val q = enclosing(direct.start())
        if (q != "?") fams(direct.group(1)) = fams(direct.group(1)) + q
      }
      // helper call sites (the helper defs own the Fitted.key; consumers
      // own the cost when the artifact is cold)
      for ((needle, fam) <- helperToFamily) {
        var i = src.indexOf(needle)
        while (i >= 0) {
          val q = enclosing(i)
          if (q != "?") fams(fam) = fams(fam) + q
          i = src.indexOf(needle, i + 1)
        }
      }
    }
    fams.toMap
  }

  test("FitFamilies membership matches the fit sites in source") {
    val fromSource = derived()
    val declared = Bench.FitFamilies.map { case (f, (_, m)) => f -> m }
    assert(fromSource == declared,
      s"""
         |Fit-family drift between Bench.FitFamilies and ExtensionQueries:
         |  derived from source: $fromSource
         |  declared in Bench:   $declared
         |Update Bench.FitFamilies so subset runs warm exactly the
         |families they consume.
         |""".stripMargin)
  }

  test("every fit warmer is a member of its own family") {
    Bench.FitFamilies.foreach { case (fam, (rep, members)) =>
      assert(members.contains(rep), s"warmer $rep not a member of $fam")
      assert(SparkEntry.queries.contains(rep), s"warmer $rep not a query")
    }
  }

  test("every FitFamilies member is a real suite query") {
    val all = SparkEntry.queries.keySet
    val ghost = Bench.FitFamilies.values.flatMap(_._2).filterNot(all)
    assert(ghost.isEmpty, s"FitFamilies names unknown queries: $ghost")
  }
}
