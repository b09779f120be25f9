package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the compression-ratio quality signal
  * (`graft_deflate_len`): the DEFLATE-compressed byte length of a string
  * column at a fixed configuration (raw deflate, level 6, default
  * strategy). Compressibility is the classic cheap proxy for degenerate
  * text — boilerplate and repetition deflate far below natural prose
  * (the CCNet/Gopher-family heuristic) — and it needs the whole byte
  * stream, so unlike the n-gram signals it cannot be expressed in
  * DataFrame HOFs; a native expression keeps it inside whole-stage
  * codegen (the generated code calls the static helper below — no
  * interpreted fallback on the scan path).
  *
  * Determinism: level/strategy/wrap are pinned here, the JVM's zlib is
  * identical across executors of a cluster, and the per-thread Deflater
  * is `reset()` per row, so the length is a pure function of the bytes.
  * DuckDB has no deflate, so the oracle contract for consumers is the
  * STAGED-intermediate one (the x08/x11 pattern): the per-doc lengths
  * are staged and every downstream derivation is re-proved in SQL.
  */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    DeflateLength.deflatedLength(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateLength.deflatedLength($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLength {

  /** One Deflater per executor thread, reset per call — Deflater wraps
    * native zlib state whose allocation dominates small inputs.
    */
  private val local: ThreadLocal[java.util.zip.Deflater] =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater =
        new java.util.zip.Deflater(6, true)
    }

  /** Compressed size of `bytes` under raw DEFLATE level 6. Public and
    * static so generated code (and the spec's independent re-derivation)
    * can call it directly.
    */
  def deflatedLength(bytes: Array[Byte]): Long = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
