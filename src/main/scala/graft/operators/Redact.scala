package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Span-level PII redaction — the first-class TRANSFORM that x38's scan
  * only accounts for: every matched span is replaced in the text (the
  * document survives, scrubbed), and the per-source datacard reports
  * exactly what was removed so a corpus release can publish its
  * redaction accounting.
  *
  * Scale shape (the 100 TB contract): [[redact]] is ONE narrow
  * projection — every count/replace is a codegen'd regexp builtin
  * riding whole-stage codegen, no shuffle, no UDF; [[datacard]] is one
  * map-side-combined groupBy(source) whose output is |sources|-sized.
  * Nothing here grows with anything but the single scan.
  *
  * Semantics contract (shared with the DuckDB oracle): rules apply IN
  * ORDER, and each rule counts matches on the text AS THE PREVIOUS
  * RULES LEFT IT — so `n_<rule>` is the number of spans that rule
  * actually replaced, and overlapping rule families (an SSN-shaped run
  * inside an already-redacted span) cannot double-count.
  */
object Redact {

  /** One redaction rule: fixed-shape pattern → replacement token.
    * Patterns must stay simple character-class regexes that behave
    * identically in Java regex and DuckDB's RE2 (no backrefs, no
    * lookaround, no bounded-repetition ambiguity across engines).
    */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** The default PII families, in application order. Email runs first
    * (its local/domain parts can contain digit runs and dots that the
    * IP rule would otherwise bite into); SSN (3-2-4) runs before phone
    * (3-3-4) — the two shapes are disjoint, but the order is part of
    * the published contract so both engines and the datacard agree.
    */
  val DefaultRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    Rule("ip", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    Rule("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    Rule("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"))

  private def countCol(r: Rule) = s"n_${r.name}"

  /** Redact `textCol` under `rules`, adding one `n_<rule>` span count
    * per rule (spans actually replaced — see the order contract above)
    * and the scrubbed text as `redacted`. The input text column is kept
    * untouched so callers can account for length deltas.
    */
  def redact(df: DataFrame, textCol: String,
      rules: Seq[Rule] = DefaultRules): DataFrame = {
    require(df.columns.contains(textCol), s"missing text column $textCol")
    val taken = ("redacted" +: rules.map(countCol)).filter(df.columns.contains)
    require(taken.isEmpty,
      s"Redact output columns collide with input: ${taken.mkString(", ")}")
    val out = rules.foldLeft(df.withColumn("redacted", col(textCol))) {
      (d, r) =>
        d.withColumn(countCol(r),
            size(regexp_extract_all(col("redacted"), lit(r.pattern), lit(0)))
              .cast("long"))
          .withColumn("redacted",
            regexp_replace(col("redacted"), r.pattern, r.replacement))
    }
    out
  }

  /** Per-source redaction datacard over a [[redact]] output: document
    * counts, per-family span totals, and the net character delta
    * (redaction tokens are shorter or longer than what they replace —
    * the delta is the corpus-size accounting a release note needs).
    */
  def datacard(redacted: DataFrame, sourceCol: String, textCol: String,
      rules: Seq[Rule] = DefaultRules): DataFrame = {
    val spans = rules.map(r => col(countCol(r))).reduce(_ + _)
    val aggs =
      sum(when(spans > 0, lit(1L)).otherwise(lit(0L))).as("docs_redacted") +:
        (rules.map(r => sum(col(countCol(r))).as(countCol(r))) ++ Seq(
          sum(spans).as("n_spans"),
          sum(length(col("redacted")).cast("long") -
            length(col(textCol)).cast("long")).as("chars_delta")))
    redacted.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
  }
}
