package org.apache.spark.sql.graft

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingle set over a text column.
  *
  * Semantics are identical to the HOF reference formulation
  * (`graft.operators.Dedup.shinglesHof`, parity-gated in
  * NativeExprSpec): trim → whitespace-split → all n-token windows
  * joined with a single space → first-occurrence-distinct
  * (`array_distinct` order); fewer than n tokens → the trimmed text as
  * a single whole-document shingle (including the degenerate
  * empty-text case, which yields `[""]` exactly like the reference).
  *
  * Why native: the HOF chain (`split` → `transform(sequence…)` with a
  * `concat_ws(slice…)` lambda → `array_distinct`) is CodegenFallback
  * and re-walks the token array per window with boxed intermediates.
  * Shingling feeds EVERY text-dedup operator (MinHash, SimHash, exact
  * Jaccard, decontamination), so it is the fixed per-row cost of the
  * whole family. Here it is one tight loop with a reused
  * StringBuilder and a LinkedHashSet for first-occurrence dedup. The
  * generated code calls [[compute]] directly — one virtual call per
  * row inside the stage, no per-element lambda dispatch, no codegen
  * fallback split.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n > 0, s"n=$n must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  /** Same pattern instance Spark's `split(c, "\\s+")` compiles. */
  @transient private lazy val ws: Pattern = Pattern.compile("\\s+")

  def compute(input: UTF8String): ArrayData = {
    val trimmed = input.trim()
    val str = trimmed.toString
    if (trimmed.numBytes() == 0) {
      return new GenericArrayData(Array[Any](UTF8String.fromString(str)))
    }
    val toks = ws.split(str, -1)
    if (toks.length < n) {
      return new GenericArrayData(Array[Any](UTF8String.fromString(str)))
    }
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shinglesExpr", this, classOf[Shingles].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  /** Column-API entry point. */
  def apply(text: Column, n: Int): Column =
    ExpressionUtils.column(Shingles(ExpressionUtils.expression(text), n))
}
