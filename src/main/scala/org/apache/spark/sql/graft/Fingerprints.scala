package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

// Lives under org.apache.spark.sql because AbstractDataType /
// ExpressionUtils are private[sql] — the standard packaging for
// third-party native expressions (see DotProduct.scala).

/** Shared arithmetic for the graft rolling-hash family: the polynomial
  * fold `acc ← (acc·31 + codePoint) mod 1 000 000 007` over a string's
  * code points — bit-identical to `TextAnalysis.fingerprint`'s HOF
  * formulation (`aggregate(filter(split(c,"")), 0, fold)`) and to its
  * DuckDB `list_reduce` twin for all BMP text (the fixtures are ASCII;
  * for supplementary-plane code points the HOF path's `split("")`
  * produces lone UTF-16 surrogates whose behavior is engine-undefined,
  * so no gate relies on it).
  *
  * WHY native (r13): the HOF formulation pays one interpreted lambda
  * eval per character per row — Spark higher-order functions never
  * enter whole-stage codegen — and the r13 bimodal-run investigation
  * (BASELINE.md) measured the interpreted-HOF eval path as the one
  * surface whose throughput depends on sticky per-JVM JIT state (same
  * query, same plan: 4.8 s in one JVM, 24–30 s in another, every other
  * axis ruled out). A tight compiled loop is both ~an order of
  * magnitude faster and immune to that failure mode.
  */
private[graft] object PolyHash {
  val Base = 31L
  val Mod = 1000000007L

  /** Fingerprint of all code points of `s`. */
  def fingerprint(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += java.lang.Character.charCount(cp)
    }
    h
  }

  /** 1-based (code-point) positions `i` in `[w, n]` whose trailing
    * w-code-point window hashes to `≡ 0 (mod divisor)` — the
    * content-defined-chunking boundary rule (`ContentChunks`).
    * Windows are re-hashed directly (O(n·w), w small by contract),
    * mirroring the HOF filter-over-substrings semantics exactly.
    */
  def boundaries(s: UTF8String, w: Int, divisor: Long): ArrayData = {
    val str = s.toString
    // code-point array (length() / substr() count code points)
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n < w) return new GenericArrayData(Array.empty[Int])
    val out = new java.util.ArrayList[Int]()
    var i = w // 1-based window end
    while (i <= n) {
      var h = 0L
      var j = i - w
      while (j < i) {
        h = (h * Base + cps(j)) % Mod
        j += 1
      }
      if (h % divisor == 0L) out.add(i)
      i += 1
    }
    val arr = new Array[Int](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }
}

/** Native codegen twin of `TextAnalysis.fingerprint` — see [[PolyHash]]
  * for semantics and the r13 rationale. Null in → null out (the HOF
  * path agrees wherever gates can reach: every consumer filters or
  * synthesizes non-null input).
  */
case class PolyFingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_poly_fingerprint"

  override def nullSafeEval(input: Any): Any =
    PolyHash.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = org.apache.spark.sql.graft.PolyHash.fingerprint($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

object PolyFingerprint {
  /** Column-API entry point. */
  def apply(text: Column): Column =
    ExpressionUtils.column(PolyFingerprint(ExpressionUtils.expression(text)))
}

/** Native content-defined-chunking boundary scan — see
  * [[PolyHash.boundaries]]. Replaces `ContentChunks`' nested HOF
  * (`filter(sequence(w,n), i → fingerprint(substr(…)) % divisor = 0)`),
  * which paid interpreted lambda eval per window PER CHARACTER: the
  * dominant cost of q_content_chunks and the operator hit hardest by
  * the sticky-JIT failure mode (BASELINE.md r13).
  */
case class CdcBoundaries(child: Expression, w: Int, divisor: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1, s"window must be >= 1, got $w")
  require(divisor >= 1, s"divisor must be >= 1, got $divisor")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_cdc_boundaries"

  override def nullSafeEval(input: Any): Any =
    PolyHash.boundaries(input.asInstanceOf[UTF8String], w, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = org.apache.spark.sql.graft.PolyHash.boundaries(
         |  $c, $w, ${divisor}L);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  /** Column-API entry point. */
  def apply(text: Column, w: Int, divisor: Long): Column =
    ExpressionUtils.column(
      CdcBoundaries(ExpressionUtils.expression(text), w, divisor))
}
