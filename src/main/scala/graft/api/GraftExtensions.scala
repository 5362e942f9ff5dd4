package graft.api

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** SparkSessionExtensions installer exposing the engine's native Catalyst
  * expressions to SQL — the SURVEY §2 "custom operator" path (c): a user
  * activates the whole library surface with
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)        // programmatic
  *   // or spark.sql.extensions=graft.api.GraftExtensions  (config)
  * }}}
  *
  * and then `SELECT vec_dot(a, b)`, `cosine_sim(e, q)`,
  * `md5_prefix_long(s, 15)`, `lsh_buckets(v, planes, 4, 6, false)` work in
  * plain SQL (and therefore in views, `spark.sql` pipelines, and thrift
  * clients) exactly like built-ins — codegen included.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, "", name, usage,
      "", "", "", "", "", "", "built-in")

  private def lit(e: Expression, what: String): Literal = e match {
    case l: Literal => l
    case other => throw new IllegalArgumentException(
      s"$what must be a literal, got $other")
  }

  private def intLit(e: Expression, what: String): Int =
    lit(e, what).value match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double vectors"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot(a, b) takes 2 arguments")
        VectorDot(children(0), children(1))
      }))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two vectors"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim(a, b) takes 2 arguments")
        // same composition as VectorExprs.cosine_sim
        val dot = VectorDot(children(0), children(1))
        val na = org.apache.spark.sql.catalyst.expressions.Sqrt(
          VectorDot(children(0), children(0)))
        val nb = org.apache.spark.sql.catalyst.expressions.Sqrt(
          VectorDot(children(1), children(1)))
        org.apache.spark.sql.catalyst.expressions.Divide(dot,
          org.apache.spark.sql.catalyst.expressions.Multiply(na, nb))
      }))
    ext.injectFunction((FunctionIdentifier("md5_prefix_long"),
      info("md5_prefix_long",
        "md5_prefix_long(s, hexDigits) - first hexDigits md5 nibbles as BIGINT"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "md5_prefix_long(s, hexDigits) takes 2 arguments")
        Md5PrefixLong(children(0), intLit(children(1), "hexDigits"))
      }))
    ext.injectFunction((FunctionIdentifier("mat_vec_dots"),
      info("mat_vec_dots",
        "mat_vec_dots(v, flatMatrix, rows) - dots of v against each matrix row"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "mat_vec_dots(v, flatMatrix, rows) takes 3 arguments")
        MatVecDots(children(0), children(1), intLit(children(2), "rows"))
      }))
    ext.injectFunction((FunctionIdentifier("lsh_buckets"),
      info("lsh_buckets",
        "lsh_buckets(v, flatPlanes, tables, bits, multiprobe) - " +
          "combined (table<<32|sig) hyperplane-LSH bucket keys"),
      (children: Seq[Expression]) => {
        require(children.length == 5,
          "lsh_buckets(v, flatPlanes, tables, bits, multiprobe) takes 5 arguments")
        val mp = lit(children(4), "multiprobe").value match {
          case b: Boolean => b
          case other => throw new IllegalArgumentException(
            s"multiprobe must be a boolean literal, got $other")
        }
        LshBuckets(children(0), children(1),
          intLit(children(2), "tables"), intLit(children(3), "bits"), mp)
      }))
    ext.injectFunction((FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(key, bloomBytes) - probe an integral key " +
          "against a serialized spark.util.sketch BloomFilter (binary literal)"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "bloom_might_contain(key, bloomBytes) takes 2 arguments")
        val bytes = lit(children(1), "bloomBytes").value match {
          case b: Array[Byte] => b
          case other => throw new IllegalArgumentException(
            s"bloomBytes must be a binary literal, got $other")
        }
        BloomMightContain(children(0),
          org.apache.spark.util.sketch.BloomFilter.readFrom(bytes))
      }))
    // whole-operator extension: the native AS-OF join planner strategy
    // (graft.ops.AsOf.asofJoin also self-registers on plain sessions via
    // experimental.extraStrategies — this covers extension-built sessions)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
