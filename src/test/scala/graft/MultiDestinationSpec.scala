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
