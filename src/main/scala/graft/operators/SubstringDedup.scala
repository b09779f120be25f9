package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Cross-document EXACT SUBSTRING deduplication (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"): any
  * k-token gram that appears in ≥2 documents marks a duplicated span;
  * per document, overlapping/adjacent spans merge into maximal runs,
  * which are then cut out and the survivors reassembled in order. This
  * removes the boilerplate/quotation overlap that document-level near-dup
  * (minhash) cannot see, and is the token-gram form of the paper's
  * suffix-array pass.
  *
  * Scale shape: one (doc, gram) explode → gram-keyed docfreq → join back
  * (shuffle keyed by gram, map-side combined; AQE's skew split handles
  * the boilerplate hot grams) → per-doc WINDOW island-merge (the
  * sessionize gap-merge pattern: a span starts a new island iff its
  * start exceeds the running max end + 1) → spans collected per doc
  * (bounded: spans ≤ n/k after merging) and survivors filtered by a
  * 2-arg HOF, so reassembly costs no extra shuffle beyond the span
  * aggregate's own doc_id key.
  *
  * Output: (doc_id, n_tokens, n_spans, n_removed, clean_fp) — clean_fp
  * is the md5 of the reassembled survivor tokens (empty string when the
  * whole document was duplicated), the same fingerprint contract the
  * line-dedup operator uses.
  */
object SubstringDedup {

  def dedup(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val toks = graft.engine.CacheScope.persistTracked(
      docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("ts")))
    val grams = toks.select(col("doc_id"),
      posexplode(TextFunctions.ngramListOf(col("ts"), k)).as(Seq("p0", "g")))
    val dup = grams.groupBy(col("g"))
      .agg(count_distinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2).select(col("g"))
    val pos = grams.join(dup, Seq("g"))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("s"),
        (col("p0") + k).cast("long").as("e"))
    // island merge: running max end over starts-so-far; a gap strictly
    // larger than adjacency (s > prevmax + 1) breaks the island
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val spans = pos
      .withColumn("brk",
        when(col("s") > coalesce(max(col("e")).over(wPrev), lit(-1L)) + 1, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("sp"),
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("n_removed"))
    toks.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("ts")).cast("long").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        md5(concat_ws(" ",
          filter(col("ts"), (t, i0) => !exists(
            coalesce(col("sp"),
              array().cast("array<struct<s:bigint,e:bigint>>")),
            sp => (i0 + 1).cast("long").between(sp("s"), sp("e")))))
        ).as("clean_fp"))
      .orderBy(col("doc_id"))
  }
}
