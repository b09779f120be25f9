package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a typed
  * Spark [[Aggregator]] — the mergeable fixed-memory frequency sketch a
  * 100 TB token stream needs where an exact `groupBy(term)` would shuffle
  * the full vocabulary.
  *
  * Scale shape: the aggregation is ONE pass over the exploded token stream
  * with map-side partial aggregation — each task folds its partition into a
  * local `depth × width` long array (32 KB at 4×1024), and only those
  * fixed-size arrays move in the shuffle (one row per partition), never the
  * tokens. `merge` is element-wise add, so the sketch composes across
  * partitions, batches, and days (sketches are unionable state: store one
  * per ingest batch, add to query a window).
  *
  * Estimate guarantee: `est(t) = min_d cell(d, h_d(t))` over-counts only
  * (collisions add), so `exact ≤ est ≤ exact + εN` with ε≈e/width at the
  * standard depth=ln(1/δ). Heavy hitters ranked by `est` are a superset
  * candidate list verified by a second exact pass over candidates only.
  *
  * Hash portability: `h_d(t)` is the first 8 hex chars of `md5("d:t")` mod
  * width — byte-identical in the JVM aggregator, in Spark SQL expressions
  * (`conv(substring(md5(…),1,8),16,10)`), and in DuckDB
  * (`('0x'||substr(md5(…),1,8))::BIGINT`), so the oracle re-derives the
  * whole sketch independently. 8 hex chars < 2⁶³ — no sign trouble.
  */
object CountMin {

  /** Bucket of `term` in row `d`: first 8 md5 hex chars of "d:term" mod
    * `width`. JVM-side twin of [[bucketCol]] — must stay byte-identical.
    */
  def bucket(d: Int, term: String, width: Int): Int = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$d:$term".getBytes(StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % width).toInt
  }

  /** SQL-expression twin of [[bucket]] (for estimate lookups in-plan). */
  def bucketCol(d: Int, term: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"$d:"), term)), 1, 8), 16, 10)
      .cast("long") % width

  /** Point estimate of `term` from a sketch column (array of depth×width
    * longs, row-major): min over rows of the term's cell. 1-based
    * `element_at`.
    */
  def estimate(sketch: Column, term: Column, depth: Int, width: Int): Column =
    least((0 until depth).map { d =>
      element_at(sketch, (lit(d * width) + bucketCol(d, term, width) + lit(1))
        .cast("int"))
    }: _*)

  /** The aggregator: fold string terms into a depth×width count matrix.
    * The hot loop reuses one MessageDigest per task and derives the bucket
    * arithmetically from the digest's first 4 bytes — the same value
    * [[bucket]] parses out of the hex prefix (big-endian), without the
    * per-call getInstance / per-byte format / parseLong round-trip
    * (depth× per token; it dominated the sketch cost). The wide-sketch
    * exactness test pins fast-path ≡ [[bucketCol]] ≡ [[bucket]].
    */
  class Agg(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    @transient private lazy val md = MessageDigest.getInstance("MD5")
    private def fastBucket(d: Int, term: String): Int = {
      md.reset()
      val digest = md.digest(s"$d:$term".getBytes(StandardCharsets.UTF_8))
      // first 8 hex chars == first 4 bytes, big-endian, < 2³² (no sign)
      val v = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      (v % width).toInt
    }
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], term: String): Array[Long] = {
      if (term != null) {
        var d = 0
        while (d < depth) { b(d * width + fastBucket(d, term)) += 1; d += 1 }
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Column function: `sketch(col)` aggregates to the depth×width array. */
  def sketchUdaf(depth: Int, width: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new Agg(depth, width), ExpressionEncoder[String]())
}
