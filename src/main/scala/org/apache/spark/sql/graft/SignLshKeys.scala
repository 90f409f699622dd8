package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native sign-LSH bucket keys: for `nTables` independent hyperplane
  * sets of `nBits` hash-derived hyperplanes each, returns the packed
  * sign-bit key of every table as `array<long>` (length `nTables`).
  *
  * The composable formulation ([[graft.operators.Similarity.signLshKey]])
  * runs one interpreted `aggregate(zip_with(...))` fold per (table, bit)
  * — nTables × nBits lambda-bound array traversals per row (256 at the
  * default 64×4), which dominates the embedding-LSH stage. This
  * expression precomputes the hyperplane coefficient matrix ONCE on the
  * driver (the coefficients depend only on (table, bit, component) —
  * same chained `xxhash64` derivation, bit-for-bit) and evaluates all
  * keys in a single fused loop under whole-stage codegen.
  *
  * Parity: identical keys to the HOF formulation for vectors of length
  * ≥ `dim` (verified in NativeExprSpec). Null elements contribute 0.
  */
case class SignLshKeys(child: Expression, dim: Int, nBits: Int, nTables: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(nBits > 0 && nBits <= 63, s"nBits=$nBits out of range")

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_sign_lsh_keys"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Hyperplane coefficients, flattened per table as [bit*dim + comp]:
    * `pmod(xxhash64(table, bit, comp), 2000001)/1e6 − 1` ∈ [−1, 1) — the
    * exact chained-hash derivation of the Column formulation (xxhash64
    * seeds with 42 and folds int args via XXH64.hashInt).
    */
  @transient private lazy val coefs: Array[Array[Double]] =
    Array.tabulate(nTables) { t =>
      val arr = new Array[Double](nBits * dim)
      var b = 0
      while (b < nBits) {
        val hb = XXH64.hashInt(b, XXH64.hashInt(t, 42L))
        var i = 0
        while (i < dim) {
          val h = XXH64.hashInt(i, hb)
          val m = 2000001L
          arr(b * dim + i) = (((h % m) + m) % m).toDouble / 1000000.0 - 1.0
          i += 1
        }
        b += 1
      }
      arr
    }

  private def compute(v: ArrayData): Array[Long] = {
    val n = math.min(dim, v.numElements())
    val f = isFloat
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      val c = coefs(t)
      var key = 0L
      var b = 0
      while (b < nBits) {
        var acc = 0.0
        val off = b * dim
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i)) {
            val x = if (f) v.getFloat(i).toDouble else v.getDouble(i)
            acc += x * c(off + i)
          }
          i += 1
        }
        if (acc > 0) key |= 1L << b
        b += 1
      }
      out(t) = key
      t += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coefsRef = ctx.addReferenceObj("lshCoefs", coefs, "double[][]")
    val get = if (isFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
              else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val key = ctx.freshName("key")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  double[] $c = $coefsRef[$t];
         |  long $key = 0L;
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    double $acc = 0.0;
         |    int $off = $b * $dim;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$v.isNullAt($i)) {
         |        $acc += ${get(v, i)} * $c[$off + $i];
         |      }
         |    }
         |    if ($acc > 0) $key |= 1L << $b;
         |  }
         |  $out[$t] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshKeys =
    copy(child = newChild)
}

object SignLshKeys {
  /** Column-API entry point. */
  def apply(vec: Column, dim: Int, nBits: Int, nTables: Int): Column =
    ExpressionUtils.column(
      SignLshKeys(ExpressionUtils.expression(vec), dim, nBits, nTables))
}
