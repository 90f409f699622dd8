package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE token count: the number of symbols a word tokenizes to
  * after applying an ORDERED merge list, starting from characters —
  * the apply half of [[graft.operators.Bpe]] as one compiled loop.
  *
  * The composable formulation (k chained `aggregate(...)` folds over a
  * symbol array, one per merge) is semantically identical but
  * generates a k-deep whole-stage-codegen expression tree whose
  * compile + JIT cost alone ran to SECONDS per plan (r16 bench
  * telemetry: 42 s of background JIT during the q_fertility cold pass)
  * — a price paid per query, independent of row count. This expression
  * is one reference-object call per row: for each merge (l, r), one
  * left-to-right pass over the symbol buffer replacing adjacent
  * (l, r) with l+r.
  *
  * Parity with the fold ([[graft.operators.Bpe.applyMerge]], proved in
  * BpeSpec): symbols never contain spaces (words are whitespace
  * tokens), so the fold's space-joined accumulator decomposes exactly
  * into this buffer; "acc == l" and "acc endsWith ' '+l" both mean
  * "last symbol == l", and a merged symbol compares as its full
  * concatenation, so no within-pass cascade — the standard single-pass
  * BPE semantics both engines pin.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_bpe_token_count"

  @transient private lazy val mergeTriples: Array[Array[UTF8String]] =
    merges.map { case (l, r) =>
      Array(UTF8String.fromString(l), UTF8String.fromString(r),
        UTF8String.fromString(l + r))
    }.toArray

  /** Token count for one word. Splits to characters, then one pass per
    * merge. Buffer is reused in place; `n` tracks the live length.
    */
  def compute(word: UTF8String): Int = {
    val nChars = word.numChars()
    if (nChars == 0) return 0
    var syms = new Array[UTF8String](nChars)
    var i = 0
    while (i < nChars) { syms(i) = word.substring(i, i + 1); i += 1 }
    var n = nChars
    var m = 0
    while (m < mergeTriples.length) {
      val t = mergeTriples(m)
      val l = t(0); val r = t(1); val lr = t(2)
      var out = 0
      var j = 0
      while (j < n) {
        if (out > 0 && syms(out - 1).equals(l) && syms(j).equals(r))
          syms(out - 1) = lr
        else { syms(out) = syms(j); out += 1 }
        j += 1
      }
      n = out
      m += 1
    }
    n
  }

  override def nullSafeEval(w: Any): Any = compute(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTokenCountExpr", this,
      classOf[BpeTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  /** Column-API entry point: `word` is the whitespace-token string. */
  def apply(word: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(
      BpeTokenCount(ExpressionUtils.expression(word), merges))
}
