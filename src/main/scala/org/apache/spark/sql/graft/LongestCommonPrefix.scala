package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

// Lives under org.apache.spark.sql because AbstractDataType /
// ExpressionUtils are private[sql] — the standard packaging for
// third-party native expressions.

/** Native character-count longest-common-prefix of two strings.
  *
  * The composable alternative (a capped `aggregate(sequence(...))` fold
  * calling `substr(i, 1)` per step) is semantically identical but runs
  * on the interpreted higher-order-function path — and each
  * `UTF8String.substring(i)` walks from byte 0 to find the i-th char
  * boundary, making the fold O(cap²) CHARACTER scans per comparison.
  * On [[graft.operators.SharedSubstrings]]'s boundary pairs (millions
  * of ~60-char low-entropy keys) that interpreted quadratic is the
  * dominant cost of the whole operator (r9 rehearsal: the "per-bucket
  * sort" diagnosis was wrong — the fold was ~80% of wall-clock).
  *
  * This expression is ONE byte-level walk: advance while bytes match,
  * then count the complete UTF-8 characters inside the common byte
  * prefix (byte equality == char equality because UTF-8 is injective;
  * a partially-matched multi-byte char is excluded by the
  * boundary-aware count). O(lcp) bytes, whole-stage codegen.
  */
case class LongestCommonPrefix(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_lcp"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val n = math.min(x.numBytes(), y.numBytes())
    var i = 0
    while (i < n && x.getByte(i) == y.getByte(i)) i += 1
    var chars = 0
    var p = 0
    var done = false
    while (p < i && !done) {
      val w = UTF8String.numBytesForFirstByte(x.getByte(p))
      if (p + w > i) done = true
      else { chars += 1; p += w }
    }
    chars
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val chars = ctx.freshName("chars")
      val p = ctx.freshName("p")
      val w = ctx.freshName("w")
      s"""
         |int $n = java.lang.Math.min($a.numBytes(), $b.numBytes());
         |int $i = 0;
         |while ($i < $n && $a.getByte($i) == $b.getByte($i)) $i++;
         |int $chars = 0;
         |int $p = 0;
         |while ($p < $i) {
         |  int $w = $u8.numBytesForFirstByte($a.getByte($p));
         |  if ($p + $w > $i) break;
         |  $chars++; $p += $w;
         |}
         |${ev.value} = $chars;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongestCommonPrefix =
    copy(left = newLeft, right = newRight)
}

object LongestCommonPrefix {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      LongestCommonPrefix(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
