package graft

import org.apache.spark.sql.functions._

import graft.operators.Redact

/** Oracle-independent checks for the span-level PII redaction transform
  * (x221): the datacard is re-derived NAIVELY on the driver with
  * java.util.regex applied rule-by-rule over the collected corpus, and
  * the order/count-on-current-text contract is pinned on crafted rows
  * where rule families overlap.
  */
class RedactSpec extends SparkSpec {
  import spark.implicits._

  /** The naive reference: sequential java.util.regex count+replace. */
  private def naive(text: String): (String, Map[String, Long]) =
    Redact.DefaultRules.foldLeft((text, Map.empty[String, Long])) {
      case ((t, counts), r) =>
        val m = java.util.regex.Pattern.compile(r.pattern).matcher(t)
        var n = 0L
        while (m.find()) n += 1
        (t.replaceAll(r.pattern, r.replacement),
          counts + (s"n_${r.name}" -> n))
    }

  test("x221 datacard ≡ naive per-doc java.util.regex recount") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map { r =>
        val id = r.getLong(1)
        val t = r.getString(2) +
          (if (id % 7 == 0) s" contact user$id@example.org now" else "") +
          (if (id % 11 == 0) " call 555-123-4567 today" else "") +
          (if (id % 13 == 0) s" from 10.0.${id % 256}.25 logged" else "") +
          (if (id % 17 == 0) " ssn 987-65-4321 on file" else "")
        (r.getString(0), t)
      }
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val per = rows.map { case (_, t) => (t, naive(t)) }
      val names = Redact.DefaultRules.map(r => s"n_${r.name}")
      val spans = per.map(_._2._2.values.sum)
      src -> (rows.length.toLong,
        spans.count(_ > 0).toLong,
        names.map(n => per.map(_._2._2(n)).sum),
        spans.sum,
        per.map { case (t, (red, _)) => red.length.toLong - t.length }.sum)
    }
    val got = SparkEntry.queries("x221_pii_redact")(spark, sf()).collect()
    assert(got.map(_.getString(0)).toSet == expected.keySet)
    got.foreach { r =>
      val (nDocs, nRed, perRule, nSpans, delta) = expected(r.getString(0))
      assert(r.getLong(1) == nDocs, s"n_docs for ${r.getString(0)}")
      assert(r.getLong(2) == nRed, s"docs_redacted for ${r.getString(0)}")
      assert((3 to 6).map(r.getLong) == perRule,
        s"per-rule spans for ${r.getString(0)}")
      assert(r.getLong(7) == nSpans, s"n_spans for ${r.getString(0)}")
      assert(r.getLong(8) == delta, s"chars_delta for ${r.getString(0)}")
    }
  }

  test("rules count on the text as previous rules left it (no double count)") {
    // the email swallows its digit runs BEFORE the ip/phone rules see
    // them; the SSN (3-2-4) and phone (3-3-4) shapes stay disjoint
    val df = Seq(
      ("a", "mail user555-123-4567x@h5.6.7.8.org then 1.2.3.4 stop"),
      ("a", "ssn 987-65-4321 vs phone 555-123-4567"),
      ("b", "nothing here")).toDF("source", "t")
    val out = Redact.redact(df, "t").collect()
      .map(r => r.getString(1) -> r).toMap
    val r1 = out.keys.find(_.startsWith("mail")).map(out).get
    assert(r1.getAs[String]("redacted") ==
      "mail <EMAIL> then <IP> stop")
    assert(r1.getAs[Long]("n_email") == 1 && r1.getAs[Long]("n_ip") == 1 &&
      r1.getAs[Long]("n_ssn") == 0 && r1.getAs[Long]("n_phone") == 0)
    val r2 = out.keys.find(_.startsWith("ssn")).map(out).get
    assert(r2.getAs[String]("redacted") == "ssn <SSN> vs phone <PHONE>")
    assert(r2.getAs[Long]("n_ssn") == 1 && r2.getAs[Long]("n_phone") == 1)
    val r3 = out.keys.find(_.startsWith("nothing")).map(out).get
    assert(r3.getAs[String]("redacted") == "nothing here" &&
      r3.getAs[Long]("n_email") == 0)
  }

  test("output-column collisions fail loudly") {
    val bad = Seq(("x", "t", 1L)).toDF("source", "t", "n_email")
    val e = intercept[IllegalArgumentException](Redact.redact(bad, "t"))
    assert(e.getMessage.contains("n_email"))
    val e2 = intercept[IllegalArgumentException](
      Redact.redact(Seq(("x", "t")).toDF("source", "redacted"), "redacted"))
    assert(e2.getMessage.contains("redacted"))
  }

  test("datacard aggregates per source with exact span totals") {
    val df = Seq(
      ("s1", "a@b.co and c@d.io"),
      ("s1", "plain"),
      ("s2", "ip 1.2.3.4")).toDF("source", "t")
    val card = Redact.datacard(Redact.redact(df, "t"), "source", "t")
      .orderBy("source").collect()
    assert(card.length == 2)
    val s1 = card(0)
    assert(s1.getString(0) == "s1" && s1.getAs[Long]("n_docs") == 2 &&
      s1.getAs[Long]("docs_redacted") == 1 &&
      s1.getAs[Long]("n_email") == 2 && s1.getAs[Long]("n_spans") == 2)
    // "a@b.co and c@d.io" (17 chars) -> "<EMAIL> and <EMAIL>" (19)
    assert(s1.getAs[Long]("chars_delta") == 2)
    val s2 = card(1)
    assert(s2.getAs[Long]("n_ip") == 1 && s2.getAs[Long]("docs_redacted") == 1)
  }
}
