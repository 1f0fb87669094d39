package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineDistanceExpr, DotProductExpr, EuclideanDistanceExpr,
  HashedShinglesExpr, SimhashExpr}

/** SparkSessionExtensions hook: registers the engine's Catalyst
  * expressions as SQL functions, so the full query surface is reachable
  * from `spark.sql(...)` as well as the Column API:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT cosine_distance(embedding, query) FROM chunks")
  * }}}
  *
  * (or `spark.sql.extensions=graft.plans.GraftExtensions` in config).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // 11-arg constructor is the only non-deprecated one carrying usage text
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "4.0.0", "", "scala_udf")

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_distance"),
      info("cosine_distance", "cosine_distance(v, q) - 1 - v.q/(|v||q|), +Inf on zero norm"),
      (args: Seq[Expression]) => CosineDistanceExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("euclidean_distance"),
      info("euclidean_distance", "euclidean_distance(v, q) - L2 distance"),
      (args: Seq[Expression]) => EuclideanDistanceExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(v, q) - double-accumulated dot product"),
      (args: Seq[Expression]) => DotProductExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("hashed_shingles"),
      info("hashed_shingles", "hashed_shingles(text, n) - distinct hashed word n-grams"),
      (args: Seq[Expression]) =>
        HashedShinglesExpr(args(0), intLit(args(1), "shingle size"))))
    ext.injectFunction((FunctionIdentifier("simhash"),
      info("simhash", "simhash(hashes, bits) - simhash fingerprint of a hashed shingle set"),
      (args: Seq[Expression]) =>
        SimhashExpr(args(0), intLit(args(1), "bits"))))
  }
}
