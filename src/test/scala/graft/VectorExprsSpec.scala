package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs
import graft.ops.{ScaleOps, Tables}

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot: float arrays, codegen and interpreted paths agree") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)), // 4+10+18 = 32
      (Array(0f, 0f), Array(1f, 1f)),
      (Array(1.5f), Array(2.0f))).toDF("a", "b")
    val got = df.select(VectorExprs.vec_dot(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0))
    assert(got(0) === 32.0)
    assert(got(1) === 0.0)
    assert(got(2) === 3.0)
    // interpreted path (codegen off) must agree exactly
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(VectorExprs.vec_dot(col("a"), col("b")).as("d"))
        .collect().map(_.getDouble(0))
      assert(interp.toSeq === got.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("vec_dot: double arrays and null propagation") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (None: Option[Array[Double]], Some(Array(1.0)))).toDF("a", "b")
    val got = df.select(VectorExprs.vec_dot(col("a"), col("b")).as("d")).collect()
    assert(got(0).getDouble(0) === 11.0)
    assert(got(1).isNullAt(0)) // null input → null output
  }

  test("vec_dot: mixed float/double operands widen per element") {
    // float embedding × double hyperplane — the LSH hot path
    val df = Seq((Array(1f, 2f, 3f), Array(0.5, 0.25, 2.0))).toDF("a", "b")
    val got = df.select(VectorExprs.vec_dot(col("a"), col("b")).as("d"))
      .collect()(0).getDouble(0)
    assert(got === 1.0 * 0.5 + 2.0 * 0.25 + 3.0 * 2.0)
  }

  test("vec_dot rejects non-floating element types at analysis") {
    val df = Seq((Array(1, 2), Array(1.0, 2.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorExprs.vec_dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("vec_dot") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("vec_dot on mismatched lengths computes over the common prefix") {
    // documents the deliberate divergence from the zip_with formulation
    val df = Seq((Array(1f, 2f, 3f), Array(10f, 10f))).toDF("a", "b")
    val got = df.select(VectorExprs.vec_dot(col("a"), col("b")).as("d"))
      .collect()(0).getDouble(0)
    assert(got === 30.0)
  }

  test("cosine_sim of identical vectors is 1") {
    val df = Seq((Array(3f, 4f), Array(3f, 4f))).toDF("a", "b")
    val got = df.select(VectorExprs.cosine_sim(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("distributedNtile edge cases: fewer rows than buckets, exact split") {
    val two = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val got2 = ScaleOps.distributedNtile(two, 4, Seq(col("id")), "q")
      .orderBy("id").collect().map(_.getAs[Int]("q"))
    assert(got2.toSeq === Seq(1, 2)) // SQL NTILE: one row per leading bucket
    val eight = (1L to 8L).map(i => (i, "x")).toDF("id", "v")
    val got8 = ScaleOps.distributedNtile(eight, 4, Seq(col("id")), "q")
      .orderBy("id").collect().map(_.getAs[Int]("q"))
    assert(got8.toSeq === Seq(1, 1, 2, 2, 3, 3, 4, 4))
    // 10 rows / 4 buckets → sizes 3,3,2,2 (larger buckets first)
    val ten = (1L to 10L).map(i => (i, "x")).toDF("id", "v")
    val got10 = ScaleOps.distributedNtile(ten, 4, Seq(col("id")), "q")
      .orderBy("id").collect().map(_.getAs[Int]("q"))
    assert(got10.toSeq === Seq(1, 1, 1, 2, 2, 2, 3, 3, 4, 4))
  }
}
