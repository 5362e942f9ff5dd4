package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface registration of the native expressions via
  * SparkSessionExtensions (its own session — extensions bind at build
  * time, so the shared SparkSpec session can't be reused; the default
  * session is cleared for the build and restored afterwards, and the
  * underlying SparkContext is shared). */
class GraftExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private var prior: Option[SparkSession] = None
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.api.GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    prior.foreach(SparkSession.setDefaultSession)
  }

  test("vec_dot / cosine_sim / md5_prefix_long / mat_vec_dots / lsh_buckets in SQL") {
    val r = spark.sql(
      """SELECT
        | vec_dot(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)) AS d,
        | cosine_sim(array(3.0F, 4.0F), array(3.0F, 4.0F)) AS c,
        | md5_prefix_long('abc', 15) AS h,
        | mat_vec_dots(array(1.0D, 0.0D), array(1.0D, 0.0D, 0.0D, 1.0D), 2) AS m,
        | lsh_buckets(array(1.0F, 0.0F), array(1.0D, 0.0D, 0.0D, -1.0D), 1, 2, false) AS b
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getLong(2) === 0x900150983cd24fbL)
    assert(r.getSeq[Double](3) === Seq(1.0, 0.0))
    // plane dots: (1,0)·(1,0)=1 ≥ 0 → bit0 set; (1,0)·(0,-1)=0 ≥ 0 → bit1 set
    assert(r.getSeq[Long](4) === Seq(3L))
  }

  test("bloom_might_contain in SQL: serialized sketch as a binary literal") {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq(7L, 42L, 1000L).foreach(bloom.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val hex = bos.toByteArray.map(b => f"$b%02X").mkString
    val r = spark.sql(
      s"""SELECT bloom_might_contain(42L, X'$hex') AS hit,
         |       bloom_might_contain(43L, X'$hex') AS miss""".stripMargin)
      .collect()(0)
    assert(r.getBoolean(0)) // member: never a false negative
    assert(!r.getBoolean(1)) // 1% fpp on a 100-capacity sketch: miss stays miss
  }

  test("SQL and Scala APIs produce identical values") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((Array(1.1f, 2.2f), Array(0.5f, 0.25f))).toDF("a", "b")
    df.createOrReplaceTempView("v")
    val viaSql = spark.sql("SELECT vec_dot(a, b) FROM v").collect()(0).getDouble(0)
    val viaScala = df.select(
      graft.functions.VectorExprs.vec_dot(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(viaSql === viaScala)
  }
}
