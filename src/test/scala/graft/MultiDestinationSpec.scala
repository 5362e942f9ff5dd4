package graft

import org.apache.spark.sql.types._
import scala.util.{Failure, Success}
import graft.api.{Ack, MultiDestination}
import graft.cdc._
import graft.tables.TableStore

/** Multi-collection CDC destination ([[MultiDestination]]): routing by
  * `opencdc.collection`, per-collection key columns, and the atomic
  * cross-collection batch — one transaction per writeBatch, so a batch
  * failure anywhere applies nothing to ANY table. */
class MultiDestinationSpec extends SparkSpec {
  import spark.implicits._

  private val custSchema = StructType(Seq(
    StructField("c_id", LongType), StructField("name", StringType)))
  private val ordSchema = StructType(Seq(
    StructField("o_id", LongType), StructField("total", DoubleType)))

  private def rec(coll: String, op: CdcOp, pos: String, key: String,
      payload: String = null): CdcRecord =
    CdcRecord(pos.getBytes, op,
      metadata = Map("opencdc.collection" -> coll),
      key = Some(RawData(key)),
      after = Option(payload).map(RawData(_)))

  private def openStream(root: String) =
    MultiDestination.open(spark, MultiDestination.Config(root,
      keyColsByCollection = Map(
        "customer" -> Seq("c_id"), "orders" -> Seq("o_id"))))

  test("key.columns grammar: named entries plus one bare default") {
    val (byColl, default) = MultiDestination.parseKeyCols(
      "customer=c_id; orders=o_id,o_sub; id")
    assert(byColl === Map("customer" -> Seq("c_id"),
      "orders" -> Seq("o_id", "o_sub")))
    assert(default === Seq("id"))
    intercept[IllegalArgumentException] {
      MultiDestination.parseKeyCols("a; b") // two defaults
    }
    intercept[IllegalArgumentException] {
      MultiDestination.parseKeyCols("t=") // empty columns
    }
  }

  test("a mixed batch routes by collection and publishes atomically") {
    val root = tmpDir("multidest-")
    val store = new TableStore(spark, root)
    store.create("customer", custSchema)
    store.create("orders", ordSchema)
    val stream = openStream(root)
    val acks = stream.writeBatch(Seq(
      rec("customer", CdcOp.Create, "p1", """{"c_id": 1}""",
        """{"c_id": 1, "name": "ada"}"""),
      rec("orders", CdcOp.Create, "p2", """{"o_id": 10}""",
        """{"o_id": 10, "total": 5.0}"""),
      rec("customer", CdcOp.Create, "p3", """{"c_id": 2}""",
        """{"c_id": 2, "name": "bob"}"""),
      rec("orders", CdcOp.Update, "p4", """{"o_id": 10}""",
        """{"o_id": 10, "total": 7.5}""")))
    acks match {
      case Success(as: Seq[Ack]) =>
        assert(as.map(a => new String(a.position)) ===
          Seq("p1", "p2", "p3", "p4"))
      case Failure(e) => fail(e)
    }
    assert(stream.table("customer").orderBy("c_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "ada"), (2L, "bob")))
    assert(stream.table("orders").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq === Seq((10L, 7.5)))
  }

  test("a failure in ANY collection's group applies nothing to any table") {
    val root = tmpDir("multidest-")
    val store = new TableStore(spark, root)
    store.create("customer", custSchema)
    store.create("orders", ordSchema)
    val stream = openStream(root)
    assert(stream.writeBatch(Seq(
      rec("customer", CdcOp.Create, "p1", """{"c_id": 1}""",
        """{"c_id": 1, "name": "ada"}"""))).isSuccess)
    val vCust = store.currentVersion("customer")
    val vOrd = store.currentVersion("orders")
    // customer group is valid; orders group carries malformed JSON —
    // strict validation fails ITS apply, and the transaction must take
    // the already-staged customer commit down with it
    val r = stream.writeBatch(Seq(
      rec("customer", CdcOp.Create, "p2", """{"c_id": 2}""",
        """{"c_id": 2, "name": "bob"}"""),
      rec("orders", CdcOp.Create, "p3", """{"o_id": 11}""",
        """not json at all""")))
    assert(r.isFailure)
    assert(store.currentVersion("customer") === vCust,
      "the valid group must not survive the failed batch")
    assert(store.currentVersion("orders") === vOrd)
    assert(stream.table("customer").count() === 1)
  }

  test("unknown collection fails loud before any work; missing metadata needs a fallback") {
    val root = tmpDir("multidest-")
    val store = new TableStore(spark, root)
    store.create("customer", custSchema)
    val stream = openStream(root)
    val unknown = stream.writeBatch(Seq(
      rec("custmer", CdcOp.Create, "p1", """{"c_id": 1}""",
        """{"c_id": 1, "name": "x"}""")))
    assert(unknown.isFailure)
    assert(unknown.failed.get.getMessage.contains("custmer"))
    val noMeta = stream.writeBatch(Seq(
      CdcRecord("p2".getBytes, CdcOp.Create,
        key = Some(RawData("""{"c_id": 1}""")),
        after = Some(RawData("""{"c_id": 1, "name": "x"}""")))))
    assert(noMeta.isFailure)
    assert(noMeta.failed.get.getMessage.contains("opencdc.collection"))
    // with a fallback table, metadata-less records route there
    val withFallback = MultiDestination.open(spark,
      MultiDestination.Config(root,
        keyColsByCollection = Map("customer" -> Seq("c_id")),
        fallbackTable = Some("customer")))
    assert(withFallback.writeBatch(Seq(
      CdcRecord("p3".getBytes, CdcOp.Create,
        key = Some(RawData("""{"c_id": 3}""")),
        after = Some(RawData("""{"c_id": 3, "name": "fb"}"""))))).isSuccess)
    assert(stream.table("customer").count() === 1)
  }

  test("streaming sink: collection-routed micro-batches commit atomically; replays skip") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.api.{CdcStreamSink, MultiCdcStreamSink}
    val base = tmpDir("multisink-")
    val store = new TableStore(spark, s"$base/store")
    store.create("customer", custSchema)
    store.create("orders", ordSchema)
    val in = s"$base/in"
    def stage(i: Int, rows: Seq[(String, String, String, String)]): Unit = {
      rows.toDF("collection", "op", "key", "payload").coalesce(1)
        .write.parquet(s"$in/f$i")
      val dir = new java.io.File(s"$in/f$i")
      dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val tgt = new java.io.File(in, f"part-$i%03d.parquet")
        assert(f.renameTo(tgt)); tgt.setLastModified(1000000000000L + i * 1000L)
        ()
      }
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
    // batch 0: creates in both collections; batch 1: orders-only (the
    // touched-table set varies per batch); batch 2: cross-collection mix
    stage(0, Seq(
      ("customer", "create", """{"c_id": 1}""", """{"c_id": 1, "name": "ada"}"""),
      ("orders", "create", """{"o_id": 10}""", """{"o_id": 10, "total": 5.0}""")))
    stage(1, Seq(
      ("orders", "create", """{"o_id": 11}""", """{"o_id": 11, "total": 6.0}""")))
    stage(2, Seq(
      ("customer", "update", """{"c_id": 1}""", """{"c_id": 1, "name": "ada2"}"""),
      ("orders", "delete", """{"o_id": 10}""", null)))
    val ckpt = s"$base/ckpt"
    def runOnce(): Unit = {
      val sch = spark.read.parquet(in).schema
      val q = MultiCdcStreamSink.attach(spark,
        spark.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").parquet(in),
        store, Map("customer" -> Seq("c_id"), "orders" -> Seq("o_id")),
        sinkId = "ms")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    def custRows = store.read("customer").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    def ordRows = store.read("orders").orderBy("o_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(custRows === Seq((1L, "ada2")))
    assert(ordRows === Seq((11L, 6.0)))
    val tag = CdcStreamSink.batchIdTag("ms")
    assert(store.lastMetaValue("customer", tag) === Some("2"))
    assert(store.lastMetaValue("orders", tag) === Some("2"))
    val vC = store.currentVersion("customer")
    val vO = store.currentVersion("orders")
    // crash window: batch 2 committed to the tables, checkpoint marker lost
    val marker = new java.io.File(s"$ckpt/commits", "2")
    assert(marker.exists()); assert(marker.delete())
    val crc = new java.io.File(s"$ckpt/commits", ".2.crc")
    if (crc.exists()) { assert(crc.delete()); () }
    runOnce()
    assert(store.currentVersion("customer") === vC,
      "re-delivered batch must not double-apply")
    assert(store.currentVersion("orders") === vO)
    assert(custRows === Seq((1L, "ada2")) && ordRows === Seq((11L, 6.0)))
    // an UNROUTED collection fails the query loud (nothing half-applies)
    stage(3, Seq(
      ("payments", "create", """{"p_id": 1}""", """{"p_id": 1}""")))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("payments")))
    assert(store.currentVersion("customer") === vC)
    assert(store.currentVersion("orders") === vO)
  }

  test("deletes route too; per-collection keys are independent") {
    val root = tmpDir("multidest-")
    val store = new TableStore(spark, root)
    store.create("customer", custSchema)
    store.create("orders", ordSchema)
    val stream = openStream(root)
    assert(stream.writeBatch(Seq(
      rec("customer", CdcOp.Create, "p1", """{"c_id": 1}""",
        """{"c_id": 1, "name": "ada"}"""),
      rec("orders", CdcOp.Create, "p2", """{"o_id": 10}""",
        """{"o_id": 10, "total": 5.0}"""),
      rec("orders", CdcOp.Create, "p3", """{"o_id": 11}""",
        """{"o_id": 11, "total": 6.0}"""))).isSuccess)
    assert(stream.writeBatch(Seq(
      rec("orders", CdcOp.Delete, "p4", """{"o_id": 10}"""),
      rec("customer", CdcOp.Update, "p5", """{"c_id": 1}""",
        """{"c_id": 1, "name": "ada2"}"""))).isSuccess)
    assert(stream.table("orders").collect()
      .map(_.getLong(0)).toSeq === Seq(11L))
    assert(stream.table("customer").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "ada2")))
  }
}
