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
