package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Left-fold double sum over one DOUBLE field of an array<struct<…>>,
  * in ARRAY ORDER starting from 0.0 — the native twin of the repo's
  * deterministic-summation idiom
  * `aggregate(sortedStructs, 0.0, (acc, t) => acc + t.getField(f))`
  * (itself mirrored by DuckDB's
  * `list_reduce(list_prepend(0.0, list(x ORDER BY k)), (acc, x) -> acc + x)`).
  * Bitwise-identical by construction: the loop performs the same
  * left-to-right IEEE additions the interpreted HOF fold performed,
  * without the per-element lambda dispatch and boxed accumulator —
  * the TF-IDF pair scoring (q_tfidf_pairs) paid that cost once per
  * (pair, shared term) and was one of the r13 sticky-JIT episode's
  * flagged surfaces (VERDICT r13 #1).
  *
  * Null semantics mirror the HOF fold: a null ELEMENT or null field
  * value poisons the sum to null (acc + null = null in the lambda).
  */
case class OrderedStructFieldSum(child: Expression, ordinal: Int)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(st: StructType, _)
          if ordinal >= 0 && ordinal < st.length &&
            st(ordinal).dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<struct<…>> with a DOUBLE at field $ordinal, got $other")
    }

  private lazy val numFields: Int = child.dataType match {
    case ArrayType(st: StructType, _) => st.length
    case _ => 0
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_ordered_struct_field_sum"

  def compute(arr: ArrayData): Any = {
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val row = arr.getStruct(i, numFields)
      if (row.isNullAt(ordinal)) return null
      acc += row.getDouble(ordinal)
      i += 1
    }
    acc
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("orderedSumExpr", this,
      classOf[OrderedStructFieldSum].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sumVal")
      s"""Object $tmp = $ref.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $tmp).doubleValue(); }""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedStructFieldSum =
    copy(child = newChild)
}

object OrderedStructFieldSum {
  /** Column-API entry point: sum the DOUBLE field at `ordinal` of each
    * struct element, in array order, from 0.0.
    */
  def apply(arr: Column, ordinal: Int): Column =
    ExpressionUtils.column(
      OrderedStructFieldSum(ExpressionUtils.expression(arr), ordinal))
}
