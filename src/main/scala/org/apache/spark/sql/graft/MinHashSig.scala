package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native k-wide MinHash signature over an array of shingle strings.
  *
  * Semantics are identical to the HOF reference formulation
  * (`graft.operators.Dedup.minhashSignatureHof`, parity-gated in
  * NativeExprSpec): each shingle is
  * xxhash64'd once (seed 42; null shingles hash to the seed, matching
  * `xxhash64(NULL)`), then re-hashed per signature slot `s` with the
  * chained seed `xxhash64(s)` — `XXH64.hashLong(h, XXH64.hashInt(s, 42))`
  * is exactly `xxhash64(s, h)` — and the slot keeps the minimum.
  *
  * Why native: higher-order functions (`aggregate`/`zip_with`) are
  * CodegenFallback — the fold allocates a fresh k-long boxed array per
  * shingle and pays interpreted lambda dispatch per (shingle × slot).
  * This is the dominant cost of the whole MinHash-LSH path. Here the
  * per-slot seeds are precomputed once on the driver and the signature is
  * one fused primitive loop under whole-stage codegen (same playbook as
  * [[SimHash64]]/[[SignLshKeys]], which measured ~10× on this corpus).
  *
  * Empty array → all-`Long.MaxValue` signature (the fold's init value).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k > 0, s"k=$k must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash_sig"

  /** Per-slot chained seeds: `xxhash64(s)` for s ∈ [0, k). */
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k)(s => XXH64.hashInt(s, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var s = 0
      while (s < k) {
        val v = XXH64.hashLong(h, seeds(s))
        if (v < sig(s)) sig(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.isNullAt($i)
         |    ? 42L : $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |  for (int $s = 0; $s < $k; $s++) {
         |    long $v = $xxh.hashLong($h, $seedsRef[$s]);
         |    if ($v < $sig[$s]) $sig[$s] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-API entry point. */
  def apply(shingles: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(shingles), k))
}
