package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Intra-document repetition signals — the Gopher repetition filters
  * (Rae et al. 2021 Table A1) in token-gram form (the corpus is
  * single-line, so the line/paragraph variants don't apply):
  *
  *  - `top2gram_frac`: fraction of tokens covered by the single most
  *    frequent bigram (2·count(top bigram) / n_tokens);
  *  - `dup3gram_frac`: fraction of trigram positions whose trigram
  *    occurs ≥2× in the document;
  *  - `keep`: both signals under the Gopher-style gates (0.20 / 0.30).
  *
  * Shape: explode → per-(doc, gram) count → per-doc aggregate. Both
  * shuffles key on (doc_id, gram) with map-side combine, and no per-doc
  * quadratic work happens anywhere — a 10k-token web document costs
  * O(n), where the array-HOF alternative (count each gram by scanning
  * the gram list per gram) is per-doc O(n²): fine at n≈60, not at web
  * lengths. Short documents saturate `top2gram_frac` (2/n floor), which
  * is why Gopher conditions these gates on document length — the engine
  * reports the raw signals and leaves length-conditioning to callers.
  */
object Repetition {

  def signals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.engine.CacheScope.persistTracked(
      docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("ts")))
    def gramStats(k: Int) = toks
      .select(col("doc_id"),
        explode(TextFunctions.ngramListOf(col("ts"), k)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("topc"), sum(col("c")).as("ngrams"),
        sum(when(col("c") >= 2, col("c")).otherwise(lit(0L))).as("dupg"))
    val bi = gramStats(2).select(col("doc_id"),
      (lit(2.0) * col("topc") / (col("ngrams") + 1)).as("top2_raw"))
    val tri = gramStats(3).select(col("doc_id"),
      (col("dupg").cast("double") / col("ngrams").cast("double")).as("dup3_raw"))
    docs.select(col(idCol).as("doc_id"))
      .join(bi, Seq("doc_id"), "left").join(tri, Seq("doc_id"), "left")
      .select(col("doc_id"),
        graft.functions.EngineMath.roundAway(
          coalesce(col("top2_raw"), lit(0.0)), 6).as("top2gram_frac"),
        graft.functions.EngineMath.roundAway(
          coalesce(col("dup3_raw"), lit(0.0)), 6).as("dup3gram_frac"),
        (coalesce(col("top2_raw"), lit(0.0)) <= 0.20 &&
          coalesce(col("dup3_raw"), lit(0.0)) <= 0.30).as("keep"))
      .orderBy(col("doc_id"))
  }
}
