package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql` text (the reference's
  * only query surface, export.py:203) can reach them too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   .getOrCreate()
  * spark.sql("SELECT graft_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * Also usable via `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  * on spark-submit — no code changes in the session owner.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                     what: String): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_dot(arrayA, arrayB) takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getCanonicalName, "graft_simhash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "graft_simhash64(hashArray) takes exactly 1 argument")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getCanonicalName, "graft_minhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          "graft_minhash_sig(shingleArray, k) takes exactly 2 arguments")
        MinHashSig(children.head, intLit(children(1), "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getCanonicalName, "graft_shingles"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          "graft_shingles(text, n) takes exactly 2 arguments")
        Shingles(children.head, intLit(children(1), "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lcp"),
      new ExpressionInfo(classOf[LongestCommonPrefix].getCanonicalName, "graft_lcp"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_lcp(a, b) takes exactly 2 arguments")
        LongestCommonPrefix(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sign_lsh_keys"),
      new ExpressionInfo(classOf[SignLshKeys].getCanonicalName, "graft_sign_lsh_keys"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 4,
          "graft_sign_lsh_keys(vec, dim, nBits, nTables) takes exactly 4 arguments")
        SignLshKeys(children.head, intLit(children(1), "dim"),
          intLit(children(2), "nBits"), intLit(children(3), "nTables"))
      }))
  }
}
