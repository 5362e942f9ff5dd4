package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.Md5Exprs

class Md5ExprsSpec extends SparkSpec {
  import spark.implicits._

  test("md5_prefix_long equals the conv(substr(md5)) composition") {
    val df = Seq("", "a", "abc", "hello world", "München 世界", "x" * 500)
      .toDF("s")
    for (digits <- Seq(8, 15)) {
      val got = df.select(
        Md5Exprs.md5_prefix_long(col("s"), digits).as("native"),
        conv(substring(md5(col("s")), 1, digits), 16, 10).cast(LongType).as("composed"))
        .collect()
      got.foreach(r => assert(r.getLong(0) === r.getLong(1),
        s"digits=$digits mismatch"))
    }
  }

  test("md5_prefix_long: null in, null out; interpreted path agrees") {
    val df = Seq(Some("abc"), None).toDF("s")
    val rows = df.select(Md5Exprs.md5_prefix_long(col("s"), 15)).collect()
    assert(rows(0).getLong(0) === 0x900150983cd24fbL)
    assert(rows(1).isNullAt(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(Md5Exprs.md5_prefix_long(col("s"), 15)).collect()
      assert(interp(0).getLong(0) === 0x900150983cd24fbL)
      assert(interp(1).isNullAt(0))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
