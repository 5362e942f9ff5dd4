package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale synthesizer: replicate an sf directory N× with
  * key-shifted copies (referential integrity preserved inside each
  * replica: orderkey/custkey/partkey/suppkey shift together; nation and
  * region keys DON'T shift, so the dims stay a single copy). Document
  * texts get a per-replica suffix token — cross-replica docs become
  * NEAR-duplicates, so the dedup family sees a realistically dup-heavy
  * corpus instead of degenerate exact clones. Embeddings keep their
  * vectors (LSH bucket occupancy ×N exercises the skew caps).
  *
  * Usage: runMain graft.MakeScale <srcSfDir> <outDir> <copies>
  * The output directory then works as a SPARK_GRAFT_SF_DIR — the point
  * is a 10× bench run proving the plans scale, not new oracle data.
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val src = args(0); val out = args(1); val copies = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val B = 100000000L // key-shift stride per replica

    // replicas must read back exactly like the originals do through the
    // gate path, so timestamp spellings (incl. TIMESTAMP_NTZ) pass
    // through unchanged — Events.ev owns the NTZ handling
    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
    def replicate(df: DataFrame, shiftCols: Seq[String],
        perReplica: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until copies).map { k =>
        val shifted = shiftCols.foldLeft(perReplica(df, k))((d, c) =>
          d.withColumn(c, col(c) + lit(k * B)))
        shifted
      }.reduce(_.unionAll(_))

    write("region", t("region"))
    write("nation", t("nation"))
    write("customer", replicate(t("customer"), Seq("c_custkey")))
    write("supplier", replicate(t("supplier"), Seq("s_suppkey")))
    write("part", replicate(t("part"), Seq("p_partkey")))
    write("orders", replicate(t("orders"), Seq("o_orderkey", "o_custkey")))
    write("lineitem", replicate(t("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey")))
    // legacy ns fixtures carry TIMESTAMP(NANOS): read ns-as-long (same
    // conf Events.ev uses) and write back as µs TimestampType — the
    // exact truncation the gates apply, and a type DuckDB can
    // DATE_TRUNC. Current fixtures are already µs and pass through.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val evRaw = t("events")
    val ev =
      if (evRaw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        evRaw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else evRaw
    write("events", replicate(ev, Seq("event_id", "user_id")))
    write("documents", replicate(t("documents"), Seq("doc_id"),
      (d, k) => if (k == 0) d
        else d.withColumn("text", concat(col("text"), lit(s" r$k")))))
    write("embeddings", replicate(t("embeddings"), Seq("vec_id")))
    println(s"[makescale] wrote ${copies}x of $src to $out")
    spark.stop()
  }
}
