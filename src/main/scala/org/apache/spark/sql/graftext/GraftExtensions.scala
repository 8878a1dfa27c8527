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
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

  private def longArg(e: Expression, fn: String, pos: Int): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn argument $pos must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(
        classOf[FloatVecDot].getCanonicalName, null, "float_vec_dot",
        "float_vec_dot(a, b) - codegen dot product of two array<float>.",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"float_vec_dot expects 2 arguments, got ${children.length}")
        FloatVecDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("long_vec_dot"),
      new ExpressionInfo(
        classOf[LongVecDot].getCanonicalName, null, "long_vec_dot",
        "long_vec_dot(a, b) - codegen int64 dot product of two " +
          "array<bigint> (quantized-vector scoring).", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"long_vec_dot expects 2 arguments, got ${children.length}")
        LongVecDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("decimal_vec_dot"),
      new ExpressionInfo(
        classOf[DecimalVecDot].getCanonicalName, null, "decimal_vec_dot",
        "decimal_vec_dot(a, b) - exact DECIMAL(25,12) dot of two " +
          "array<float> (order-independent fold).", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"decimal_vec_dot expects 2 arguments, got ${children.length}")
        DecimalVecDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("srp_bucket"),
      new ExpressionInfo(
        classOf[SrpBucketExpr].getCanonicalName, null, "srp_bucket",
        "srp_bucket(emb, nPlanes, planeOffset) - packed " +
          "sign-random-projection LSH bucket of an array<float>.", ""),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"srp_bucket expects 3 arguments, got ${children.length}")
        SrpBucketExpr(children.head,
          longArg(children(1), "srp_bucket", 2).toInt,
          longArg(children(2), "srp_bucket", 3).toInt)
      }))
    ext.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(
        classOf[PolyHashExpr].getCanonicalName, null, "poly_hash",
        "poly_hash(s, p) - polynomial code-point hash mod p " +
          "(engine-portable).", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"poly_hash expects 2 arguments, got ${children.length}")
        PolyHashExpr(children.head, longArg(children(1), "poly_hash", 2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(
        classOf[WinnowExpr].getCanonicalName, null, "winnow_fps",
        "winnow_fps(s, k, w, p) - winnowed fingerprint set (distinct " +
          "w-window minima over word k-gram poly-hashes mod p).", ""),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          s"winnow_fps expects 4 arguments, got ${children.length}")
        WinnowExpr(children.head,
          longArg(children(1), "winnow_fps", 2).toInt,
          longArg(children(2), "winnow_fps", 3).toInt,
          longArg(children(3), "winnow_fps", 4))
      }))
    ext.injectFunction((
      new FunctionIdentifier("feature_hash_vec"),
      new ExpressionInfo(
        classOf[FeatureHashExpr].getCanonicalName, null, "feature_hash_vec",
        "feature_hash_vec(s, dim, p) - dense dim-bucket token-count " +
          "vector (hashing trick), one compiled pass.", ""),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"feature_hash_vec expects 3 arguments, got ${children.length}")
        FeatureHashExpr(children.head,
          longArg(children(1), "feature_hash_vec", 2).toInt,
          longArg(children(2), "feature_hash_vec", 3))
      }))
  }
}
