package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass integer counts behind the Gopher quality features
  * (QualityFilters): Σ token char lengths, distinct-token count, max
  * single-token frequency, and distinct positional-bigram count, as
  * one struct per row.
  *
  * WHY (r14): the Column formulations paid interpreted HOF eval per
  * token per row — and the top-word scan
  * (`transform(array_distinct(w), x -> size(filter(w, t -> t = x)))`)
  * is O(distinct · n) interpreted comparisons per DOCUMENT, the single
  * most expensive remaining lambda surface; the quality features run
  * inside every curation gate (classifier score, keep verdicts,
  * curriculum, token budget, health report). Here each row is one
  * hash-map pass. All DOUBLE math (ratios, guards, round(·,6)) stays
  * in Column land on these exact integers, so the emitted values are
  * bit-identical to the HOF formulations (NativeExprSpec pins all four
  * features) and the DuckDB twins are untouched.
  *
  * Identical GopherCounts(w) subtrees across the four features are
  * deduplicated per row by whole-stage codegen's common-subexpression
  * elimination (deterministic, non-CodegenFallback), so a projection
  * computing all features still makes one pass.
  */
case class GopherCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = StructType(Seq(
    StructField("sum_len", LongType, nullable = false),
    StructField("n_uniq", IntegerType, nullable = false),
    StructField("top_freq", IntegerType, nullable = false),
    StructField("uniq_bigrams", IntegerType, nullable = false)))

  override def prettyName: String = "graft_gopher_counts"

  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): GenericInternalRow = {
    val n = arr.numElements()
    var sumLen = 0L
    var top = 0
    val freq = new java.util.HashMap[UTF8String, Integer](math.max(8, n * 2))
    var i = 0
    while (i < n) {
      // null elements are skipped everywhere below (ArrayType(StringType)
      // admits containsNull; TextAnalysis.tokens() never produces one, but
      // a null token must not NPE a new caller — it simply contributes to
      // no count, the same "absent" treatment WordListCounts gives it)
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        sumLen += t.numChars()
        val c = freq.merge(t, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
        if (c > top) top = c
      }
      i += 1
    }
    var uniqBigrams = 0
    if (n >= 2) {
      val big = new java.util.HashSet[UTF8String](math.max(8, n * 2))
      i = 0
      while (i + 1 < n) {
        if (!arr.isNullAt(i) && !arr.isNullAt(i + 1)) {
          big.add(UTF8String.concat(arr.getUTF8String(i), Space,
            arr.getUTF8String(i + 1)))
        }
        i += 1
      }
      uniqBigrams = big.size
    }
    new GenericInternalRow(Array[Any](sumLen, freq.size, top, uniqBigrams))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherCountsExpr", this,
      classOf[GopherCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherCounts =
    copy(child = newChild)
}

object GopherCounts {
  /** Column-API entry point. */
  def apply(w: Column): Column =
    ExpressionUtils.column(GopherCounts(ExpressionUtils.expression(w)))
}
