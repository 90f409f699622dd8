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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_dot(arrayA, arrayB) takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
  }
}
