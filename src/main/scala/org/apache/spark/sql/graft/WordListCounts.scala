package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence counts of a LITERAL word list over a token array, in one
  * pass: `WordListCounts(w, Seq("the","a"))` ≡
  * `array(size(filter(w, t -> t = 'the')), size(filter(w, t -> t = 'a')))`
  * as array<long>, per row.
  *
  * WHY (r14): `TextAnalysis.wordCountOf` is an interpreted
  * `filter()` scan per WORD per row, and the language-ID CASE chain
  * references each language score several times — ~20+ lambda passes
  * per row across stopword counting, quality scoring, and langId.
  * Here the whole word list is one token-array pass against a
  * prebuilt hash map; identical `WordListCounts(w, list)` subtrees
  * CSE inside whole-stage codegen, so langId + quality + stopwords
  * over the same binding cost ONE pass per row. Exact-equality
  * semantics are unchanged (NativeExprSpec parity gate).
  */
case class WordListCounts(child: Expression, words: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(words.nonEmpty, "word list must be non-empty")
  require(words.distinct == words, s"duplicate words in $words")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_word_list_counts"

  @transient private lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](words.size * 2)
    words.zipWithIndex.foreach { case (w, i) =>
      m.put(UTF8String.fromString(w), Integer.valueOf(i))
    }
    m
  }

  def compute(arr: ArrayData): ArrayData = {
    val out = new Array[Long](words.size)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val idx = index.get(arr.getUTF8String(i))
      if (idx != null) out(idx.intValue()) += 1L
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordListCountsExpr", this,
      classOf[WordListCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordListCounts =
    copy(child = newChild)
}

object WordListCounts {
  /** Column-API entry point. */
  def apply(w: Column, words: Seq[String]): Column =
    ExpressionUtils.column(
      WordListCounts(ExpressionUtils.expression(w), words))
}
