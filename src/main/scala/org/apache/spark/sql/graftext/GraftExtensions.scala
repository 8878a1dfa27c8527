package org.apache.spark.sql.graftext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions hook registering the engine's native
  * expressions as SQL functions, so `spark.sql` users get the codegen
  * paths too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions",
  *           "org.apache.spark.sql.graftext.GraftExtensions")
  * ...
  * spark.sql("SELECT float_vec_dot(a.embedding, b.embedding) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(
        classOf[FloatVecDot].getCanonicalName, null, "float_vec_dot",
        "float_vec_dot(a, b) - codegen dot product of two array<float>.",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"float_vec_dot expects 2 arguments, got ${children.length}")
        FloatVecDot(children.head, children(1))
      }))
  }
}
