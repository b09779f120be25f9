package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training primitives (Sennrich et al. 2016)
  * — the corpus-statistics half of building an LLM tokenizer, which is a
  * corpus-scale aggregation problem and therefore belongs in the engine.
  *
  * Two-level shape, chosen for the 100 TB corpus:
  *
  *  1. `wordCounts` collapses the corpus to its word histogram FIRST
  *     (one hash-aggregate; Zipf makes |distinct words| millions where
  *     |tokens| is trillions). Every later pass runs over the histogram,
  *     weighted by frequency — the classic BPE trick, and on Spark it
  *     means the expensive explode touches ~1e6 rows, not 1e12.
  *  2. `pairCounts` / each `train` round are single hash-aggregates over
  *     the exploded adjacent-symbol pairs of that histogram: map-side
  *     partial aggregation absorbs the duplication, the shuffle carries
  *     only (pair, partial-count) rows, and the pair space itself is tiny
  *     (alphabet², then +1 merged symbol per round).
  *
  * The merge loop is driver-coordinated (one argmax per round — a
  * broadcast-sized scalar) but every count runs distributed; this is the
  * same iterate-with-small-driver-state shape as the k-means loop in
  * [[Ivf]]. Rounds re-explode from the persisted histogram, so lineage
  * stays one round deep.
  */
object Bpe {

  /** Whitespace word histogram: (w, n). `split` keeps empty fragments
    * (leading separators), so the non-empty filter is explicit — the
    * oracle's `string_split_regex` behaves identically.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

  /** Round-0 merge candidates: adjacent CHARACTER pairs over the word
    * histogram, weighted by word frequency, deterministic top-k
    * (count desc, then pair — exact long counts, so the tie-break is
    * engine-stable). `pair` is the two symbols space-joined, the standard
    * BPE merge-table notation.
    */
  def pairCounts(docs: DataFrame, textCol: String, k: Int): DataFrame =
    wordCounts(docs, textCol)
      .filter(char_length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, char_length(w) - 1), " +
          "i -> concat(substring(w, i, 1), ' ', substring(w, i + 1, 1)))"))
        .as("pair"), col("n"))
      .groupBy(col("pair")).agg(sum(col("n")).as("n_occ"))
      .orderBy(col("n_occ").desc, col("pair"))
      .limit(k)

  /** One word as its current symbol sequence, with corpus frequency. */
  final case class SymWord(syms: Seq[String], n: Long)
  /** One learned merge: rank-th most frequent pair at its round. */
  final case class Merge(rank: Int, left: String, right: String, n_occ: Long)

  /** Full BPE training loop: `nMerges` rounds of count-argmax-merge over
    * the symbolized word histogram. Ties on count break by (left, right)
    * lexicographic — deterministic across partitionings. Returns the merge
    * table in learned order.
    *
    * Each round: one distributed pair-count (hash-aggregate over the
    * histogram), one driver argmax (a single row), one distributed
    * re-symbolization map. The histogram is re-persisted per round and
    * the previous round unpersisted — state on the cluster is O(|vocab|),
    * on the driver O(nMerges).
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Dataset[SymWord] = wordCounts(docs, textCol)
      .as[(String, Long)]
      .map { case (w, n) => SymWord(w.map(_.toString), n) }
      .persist()
    vocab.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      for (round <- 0 until nMerges) {
        val top = vocab.flatMap(sw =>
            sw.syms.iterator.zip(sw.syms.iterator.drop(1))
              .map { case (a, b) => ((a, b), sw.n) })
          .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
          .map { case ((a, b), n) => (a, b, n) }
          .orderBy(col("_3").desc, col("_1"), col("_2"))
          .limit(1).collect()
        if (top.isEmpty) return merges.toSeq
        val (l, r, n) = top.head
        merges += Merge(round, l, r, n)
        val next = vocab.map(sw => SymWord(mergeOnce(sw.syms, l, r), sw.n))
          .persist()
        next.count()
        vocab.unpersist()
        vocab = next
      }
      merges.toSeq
    } finally vocab.unpersist()
  }

  /** Left-to-right single-pass merge of every (l, r) adjacency — the BPE
    * merge rule (after "a a a" with merge (a,a): "aa a", greedy from the
    * left).
    */
  private[graft] def mergeOnce(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }
}
