package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document chunking — fixed token-window segmentation with stride, the 1:N
  * fan-out that turns documents into training-sequence-sized pieces
  * (beyond-reference extension; no counterpart in /root/reference).
  *
  * Shape: one `posexplode` over a per-row computed array — pipelined,
  * shuffle-free, codegen-friendly (pure built-in collection expressions, no
  * UDF). At 100 TB the fan-out multiplies rows by ~len/stride but each
  * output partition is produced from its input partition in place; chunk
  * size stays bounded by `window`, so downstream `maxPartitionBytes`
  * sizing is unaffected by pathological document lengths.
  */
object Chunking {

  /** Chunk each document into token windows of `window` tokens advancing
    * by `stride` (overlap = window − stride). The final chunk may be
    * shorter; documents shorter than one window yield exactly one chunk;
    * zero-token documents yield none. Output: (idCol, chunk_idx,
    * chunk_text, n_tokens), deterministic.
    */
  /** CONTENT-DEFINED chunking (the rsync/LBFS/FastCDC family, token-level):
    * cut after token i whenever a hash of the `window` tokens ending at i
    * lands in 1/`divisor` of hash space. Boundaries depend only on LOCAL
    * content, so insertions shift chunk boundaries only until the next
    * surviving cut — the property that makes chunk-hash dedup robust to
    * edits, where fixed-stride windows misalign the whole remainder
    * (ChunkingSpec pins this shift-invariance).
    *
    * Expected chunk length ≈ `divisor` tokens (geometric). The hash is the
    * same md5-prefix ticket the samplers use — engine-portable, so the
    * DuckDB oracle re-derives every boundary. A cut at the very last token
    * is excluded (it would create an empty chunk); documents shorter than
    * `window`+1 tokens yield one whole-document chunk; zero-token documents
    * yield none.
    *
    * Shape: per-row collection expressions + one `posexplode` — pipelined,
    * shuffle-free, same 100 TB story as [[chunkDocs]]. The per-position
    * window hash costs O(len · window) md5s of short strings; production
    * at video-scale token counts would swap in a true O(len) rolling (gear)
    * hash behind the same boundary predicate — the plan shape is unchanged.
    *
    * Output: (idCol, chunk_idx, n_tokens, chunk_hash), deterministic.
    */
  def chunkByContent(df: DataFrame, idCol: String, textCol: String,
      window: Int = 3, divisor: Int = 16): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(divisor > 1, s"divisor must be > 1, got $divisor")
    val sz = size(col("__ts"))
    // cut positions (1-based, cut AFTER the position): hash the window
    // ending at i; candidate i ranges over [window, len-1]
    val ticket = (i: Column) =>
      conv(substring(md5(array_join(
        slice(col("__ts"), i - window + 1, lit(window)), " ")), 1, 8), 16, 10)
        .cast("long") % divisor
    val cuts = when(sz > window,
      filter(sequence(lit(window), sz - 1), i => ticket(i) === 0))
      .otherwise(array().cast("array<int>"))
    val starts = concat(array(lit(1)), transform(col("__cuts"), c => c + 1))
    val ends = concat(col("__cuts"), array(sz))
    // widen first (r15, guide §2 parallelism): the tokenize + per-position
    // md5 ticket chain is pure per-row CPU, and a small parquet input
    // arrives as 1-2 row-group partitions — profiled at 10× as ONE 5.8 s
    // two-task stage; no-op when the input is already wide
    Dedup.widen(df)
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__ts"))
      .filter(sz > 0)
      .withColumn("__cuts", cuts)
      .select(col(idCol),
        posexplode(zip_with(starts, ends,
          (s, e) => slice(col("__ts"), s, e - s + 1))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        size(col("col")).cast("long").as("n_tokens"),
        md5(array_join(col("col"), " ")).as("chunk_hash"))
  }

  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride")
    val ts = TextFunctions.tokens(col(textCol))
    val sz = size(col("__ts"))
    // chunk count: 1 + ceil(max(len − window, 0) / stride), computed as
    // floor((x + stride − 1) / stride) — doubles are exact for any
    // realistic token count, and floor removes the boundary question
    val nChunks: Column =
      lit(1) + floor((greatest(sz - window, lit(0)) + (stride - 1)) / stride)
    df.select(col(idCol), ts.as("__ts"))
      .filter(sz > 0)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), (nChunks - 1).cast("int")),
          i => slice(col("__ts"), i * stride + 1, lit(window)))))
      .select(
        col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).cast("long").as("n_tokens"))
  }
}
