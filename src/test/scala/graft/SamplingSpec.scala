package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling invariants: reproducibility, layout-independence,
  * rate accuracy, split exhaustiveness, and cross-salt independence.
  */
class SamplingSpec extends SparkSpec {

  private lazy val ids = {
    import spark.implicits._
    (0L until 20000L).toDF("id")
  }

  test("keep is deterministic and layout-independent") {
    val a = ids.filter(Sampling.keep(col("id"), 0.3)).collect().map(_.getLong(0)).toSet
    val b = ids.repartition(13).filter(Sampling.keep(col("id"), 0.3))
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "sample changed under repartitioning")
    // nested rates: a 0.1 sample is a subset of the 0.3 sample (same salt)
    val tenth = ids.filter(Sampling.keep(col("id"), 0.1)).collect().map(_.getLong(0)).toSet
    assert(tenth.subsetOf(a), "threshold samples must nest")
  }

  test("weightedSample: matches a local Efraimidis–Spirakis recomputation; deterministic; weight-proportional") {
    import spark.implicits._
    // weights 1..400 over 400 keys: heavier keys must dominate the sample
    val rows = (1L to 400L).map(i => (i, i)) // (id, weight = id)
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", col("w"), k = 40)
      .collect().map(_.getLong(0)).toSet
    // brute-force: same md5 ticket and rank computed locally
    def rank(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wsmp:$id".getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(md, 16) + 0.5) / math.pow(2, 48)
      math.log(u) / w
    }
    val expect = rows.sortBy { case (id, w) => (-rank(id, w), id) }
      .take(40).map(_._1).toSet
    assert(got == expect, s"engine sample $got != local E-S $expect")
    // layout-independent
    val re = Sampling.weightedSample(df.repartition(7), "id", col("w"), k = 40)
      .collect().map(_.getLong(0)).toSet
    assert(re == got)
    // weight-proportional: the heavy half should dominate a 40-of-400 draw
    assert(got.count(_ > 200) > 25, s"heavy-half count ${got.count(_ > 200)}")
    // non-positive weights are excluded, never sampled
    val withZero = ((-5L to 0L).map(i => (i, 0L)) ++ rows).toDF("id", "w")
    val z = Sampling.weightedSample(withZero, "id", col("w"), k = 400)
      .collect().map(_.getLong(0))
    assert(z.forall(_ > 0) && z.length == 400)
  }

  test("rates land within binomial tolerance; 0/1 are exact") {
    val n = ids.count().toDouble
    for (rate <- Seq(0.1, 0.5, 0.9)) {
      val kept = ids.filter(Sampling.keep(col("id"), rate)).count()
      // 5 sigma of Binomial(20000, rate)
      val tol = 5 * math.sqrt(n * rate * (1 - rate))
      assert(math.abs(kept - n * rate) <= tol, s"rate=$rate kept=$kept")
    }
    assert(ids.filter(Sampling.keep(col("id"), 1.0)).count() == n.toLong)
    assert(ids.filter(Sampling.keep(col("id"), 0.0)).count() == 0)
  }

  test("assignSplit is exhaustive, deterministic, near the weights") {
    val split = ids.withColumn("split", Sampling.assignSplit(col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 20000L) // every row assigned exactly once
    val n = 20000.0
    for ((name, w) <- Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)) {
      val tol = 5 * math.sqrt(n * w * (1 - w))
      assert(math.abs(counts(name) - n * w) <= tol, s"$name=${counts(name)}")
    }
  }

  test("a split whose cumulative weight reaches 1.0 absorbs 'ffff' tickets") {
    import spark.implicits._
    // find a key whose 'spl' ticket is exactly 'ffff' — the one value the
    // capped thresholdHex comparison (`t < 'ffff'`) used to leak past a
    // cumulative-1.0 boundary into a zero-weight trailing split
    val md = java.security.MessageDigest.getInstance("MD5")
    val ffffKey = Iterator.from(0)
      .find { i =>
        md.reset()
        md.digest(s"spl:$i".getBytes("UTF-8")).take(2)
          .map("%02x".format(_)).mkString == "ffff"
      }.get.toLong
    val one = Seq(ffffKey).toDF("id")
      .withColumn("split", Sampling.assignSplit(col("id"),
        Seq("a" -> 0.5, "b" -> 0.5, "zero" -> 0.0)))
    assert(one.collect().head.getString(1) == "b",
      "ffff ticket must land in the last positive-weight split")
  }

  test("different salts decide independently (sampling ⟂ splitting)") {
    // if 'smp' and 'spl' tickets correlated, the kept 30% would not split
    // ~80/10/10; check the train share within the kept subset
    val kept = ids.filter(Sampling.keep(col("id"), 0.3))
      .withColumn("split", Sampling.assignSplit(col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val n = kept.count().toDouble
    val train = kept.filter(col("split") === "train").count()
    assert(math.abs(train / n - 0.8) < 0.03,
      s"train share ${train / n} within kept sample drifted from 0.8")
  }

  test("property: assignSplit is exhaustive and respects zero weights for random weight vectors") {
    import org.scalacheck.Gen
    import spark.implicits._
    val small = (0L until 2000L).toDF("id")
    val weightsGen = for {
      n <- Gen.choose(2, 5)
      ws <- Gen.listOfN(n, Gen.choose(0.0, 10.0))
      if ws.sum > 0
    } yield ws.zipWithIndex.map { case (w, i) => s"s$i" -> w }
    // deterministic sample of generator outputs (fixed seed — reruns agree)
    val cases = Iterator.iterate(org.scalacheck.rng.Seed(42L))(_.next)
      .map(s => weightsGen.apply(Gen.Parameters.default, s))
      .collect { case Some(ws) => ws }.take(12).toSeq
    for (weights <- cases) {
      val counts = small.withColumn("s", Sampling.assignSplit(col("id"), weights))
        .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts.values.sum == 2000L, s"not exhaustive for $weights")
      // every zero-weight split stays empty (incl. the 'ffff'-cap edge)
      val total = weights.map(_._2).sum
      weights.filter(_._2 == 0.0).foreach { case (name, _) =>
        assert(!counts.contains(name), s"zero-weight split $name got rows ($weights)")
      }
      // shares within 6 sigma of the weights
      weights.filter(_._2 > 0).foreach { case (name, w) =>
        val p = w / total
        val tol = 6 * math.sqrt(2000 * p * (1 - p)) + 1
        assert(math.abs(counts.getOrElse(name, 0L) - 2000 * p) <= tol,
          s"$name=${counts.getOrElse(name, 0L)} far from ${2000 * p} ($weights)")
      }
    }
  }

  test("group-aware split: near-dup groups never straddle splits; singletons keyed by own id") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1L to 12L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = graft.operators.Dedup.groupAwareSplit(docs, "id", pairs, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val byId = out.map(r => r._1 -> r).toMap
    // whole group shares one split (no train/test straddle possible)
    assert(Set(byId(1L)._3, byId(2L)._3, byId(3L)._3).size == 1)
    assert(byId(10L)._3 == byId(11L)._3)
    // group key is the component min; singletons key by their own id
    assert(byId(2L)._2 == 1L && byId(11L)._2 == 10L && byId(7L)._2 == 7L)
    // the group's split IS assignSplit of the group key (not of member ids)
    val direct = Seq(1L).toDF("k")
      .select(graft.operators.Sampling.assignSplit(col("k"), w)).collect().head.getString(0)
    assert(byId(3L)._3 == direct)
    graft.engine.CacheScope.drain()
  }

  test("stratifiedKeep applies per-stratum rates") {
    import spark.implicits._
    val df = (0L until 10000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val kept = df.filter(Sampling.stratifiedKeep(col("id"), col("lang"),
      Map("en" -> 0.2), defaultRate = 1.0))
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 5000L) // default rate 1.0 keeps everything
    val tol = 5 * math.sqrt(5000 * 0.2 * 0.8)
    assert(math.abs(byLang("en") - 1000.0) <= tol, s"en=${byLang("en")}")
  }

  test("DSIR weights: target-vocabulary docs score above corpus-vocabulary docs, invariant to layout") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // target speaks {alpha beta gamma}, the bulk corpus speaks {delta
    // epsilon zeta}; two probe docs speak purely one dialect each
    val target = (1L to 10L).map(i => (i, "t", "alpha beta gamma alpha beta"))
    val bulk = (11L to 60L).map(i => (i, "r", "delta epsilon zeta delta epsilon"))
    val probes = Seq((100L, "r", "alpha beta gamma"), (101L, "r", "delta epsilon zeta"))
    val docs = (target ++ bulk ++ probes).toDF("doc_id", "grp", "text")
    val w = graft.operators.Sampling.dsirWeights(docs, "doc_id", "text",
        isTarget = col("grp") === "t")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("weight")).toMap
    // the target-dialect probe must outrank the corpus-dialect probe, with
    // the signs a log-ratio implies
    assert(w(100L) > 0, s"target-like probe got ${w(100L)}")
    assert(w(101L) < 0, s"corpus-like probe got ${w(101L)}")
    assert(w(100L) > w(101L))
    // layout invariance: the bucket-ordered fold gives the same DOUBLE
    // regardless of partitioning (the oracle-parity property)
    val w2 = graft.operators.Sampling.dsirWeights(docs.repartition(7),
        "doc_id", "text", isTarget = col("grp") === "t")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("weight")).toMap
    assert(w == w2)
    graft.engine.CacheScope.drain()
  }

  test("quality classifier: separates prose from punctuation soup; scoring is a pure function of the model") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // target: prose-like docs (stopword-rich, clean); corpus: symbol soup
    val prose = (1L to 20L).map(i =>
      (i, "t", "the quick brown fox and the lazy dog are of a mind to rest"))
    val soup = (21L to 60L).map(i =>
      (i, "r", "@@## $$%% ^^&& **(( ))__ ++== [[]] {{}} ;;:: <<>> ??//"))
    val probes = Seq(
      (100L, "r", "this is a clean sentence with the usual words of prose"),
      (101L, "r", "%%%% #### @@@@ !!!! ???? &&&& ****"))
    val docs = (prose ++ soup ++ probes).toDF("doc_id", "grp", "text")
    val model = graft.operators.QualityFilter.fit(docs, "doc_id", "text",
      isTarget = col("grp") === "t")
    val z = graft.operators.QualityFilter.logits(docs, "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("logit")).toMap
    assert(z(100L) > z(101L),
      s"prose probe ${z(100L)} should outrank soup probe ${z(101L)}")
    // scoring is stateless given the model: identical under repartition
    val z2 = graft.operators.QualityFilter.logits(docs.repartition(5),
      "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("logit")).toMap
    assert(z == z2)
  }

  test("temperatureMix: quotas follow n^alpha, fill exactly, deterministic under repartition") {
    import spark.implicits._
    // three domains with skewed sizes: 6000 / 3000 / 1000
    val df = (0L until 10000L).map { i =>
      (i, if (i < 6000) "web" else if (i < 9000) "books" else "code")
    }.toDF("id", "domain")
    val k = 500L
    val got = Sampling.temperatureMix(df, "id", "domain", alpha = 0.5, k = k)
    val byDomain = got.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // local recomputation of the quota arithmetic (same fold order: domain asc)
    val n = Map("web" -> 6000.0, "books" -> 3000.0, "code" -> 1000.0)
    val z = n.toSeq.sortBy(_._1).map { case (_, c) => math.pow(c, 0.5) }.sum
    val expected = n.map { case (d, c) =>
      d -> math.min(c.toLong, math.floor(k * math.pow(c, 0.5) / z).toLong)
    }
    assert(byDomain == expected, s"got $byDomain expected $expected")
    // every domain fills its quota exactly (quota ≤ n_domain here)
    assert(got.count() == expected.values.sum)
    // alpha=0.5 rebalances: code's share rises vs its 10% population share
    assert(byDomain("code").toDouble / k > 0.15)
    // deterministic + layout-independent
    val re = Sampling.temperatureMix(df.repartition(13), "id", "domain",
      alpha = 0.5, k = k).select("id").collect().map(_.getLong(0)).toSet
    assert(re == got.select("id").collect().map(_.getLong(0)).toSet)
    // alpha=1 is proportional sampling (floor of exact shares)
    val prop = Sampling.temperatureMix(df, "id", "domain", alpha = 1.0, k = k)
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prop == Map("web" -> 300L, "books" -> 150L, "code" -> 50L))
  }
}
