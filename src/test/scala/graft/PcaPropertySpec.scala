package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

/** Pure-JVM property-style gates for the driver-side power iteration —
  * the one piece of PCA math the DuckDB oracle exercises only on the
  * fixture's single Gram matrix. Deterministic seeded sweeps stand in
  * for scalacheck (whose scalatest bridge isn't in the offline cache);
  * no SparkSession involved.
  */
class PcaPropertySpec extends AnyFunSuite {

  test("power iteration on a diagonal matrix converges to the dominant axis") {
    val d = 6
    for (seed <- 0 until 50) {
      val rnd = new java.util.Random(seed)
      val diag = Array.fill(d)(1.0 + rnd.nextDouble())
      val top = rnd.nextInt(d)
      diag(top) = diag.max * (2.0 + 8.0 * rnd.nextDouble()) // clear spectral gap
      val c = Array.tabulate(d, d)((i, j) => if (i == j) diag(i) else 0.0)
      val x = Pca.powerIterate(c, d, iters = 40)
      assert(math.abs(x(top)) > 0.999,
        s"seed $seed: dominant axis $top not recovered: ${x.mkString(",")}")
      assert(math.abs(math.sqrt(x.map(v => v * v).sum) - 1.0) < 1e-12,
        s"seed $seed: result not unit length")
    }
  }

  test("power iteration direction is invariant to positive scaling of the matrix") {
    val d = 5
    for (seed <- 0 until 50) {
      val rnd = new java.util.Random(seed)
      val scale = 0.5 + 50.0 * rnd.nextDouble()
      // Random symmetric PSD matrix A = B·Bᵀ.
      val b = Array.fill(d, d)(rnd.nextDouble() - 0.5)
      val c = Array.tabulate(d, d)((i, j) =>
        (0 until d).map(k => b(i)(k) * b(j)(k)).sum)
      val cs = c.map(_.map(_ * scale))
      val x1 = Pca.powerIterate(c, d, iters = 30)
      val x2 = Pca.powerIterate(cs, d, iters = 30)
      val cos = math.abs(x1.zip(x2).map { case (a, bb) => a * bb }.sum)
      assert(cos > 1.0 - 1e-9,
        s"seed $seed: direction changed under ×$scale scaling: cos=$cos")
    }
  }

  test("jlSign is a deterministic ±1 function over the projection index space") {
    for (i <- 0 until 64; j <- 0 until 16) {
      val s = graft.functions.Embeddings.jlSign(i, j)
      assert(s == 1.0 || s == -1.0, s"jlSign($i,$j) = $s")
      assert(s == graft.functions.Embeddings.jlSign(i, j))
    }
  }
}
