package graft

import scala.util.{Failure, Success}
import org.apache.spark.sql.types._
import graft.api.Destination
import graft.cdc._
import graft.tables.TableStore

/** API lifecycle parity with the reference connector: config validation
  * (DestinationConfigTest), spec introspection (SpecifierServiceTest), and
  * the write→ack contract (SparkDestinationStream W4). */
class DestinationSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("spec surface: name, version, parameter inventory") {
    assert(Destination.name === "graft-table")
    assert(Destination.parameters.map(_.name) ===
      Seq("store.root", "table", "key.columns", "batch.validation",
        "maintenance.auto", "maintenance.max_entries",
        "maintenance.max_bytes", "maintenance.files",
        "maintenance.target_bytes", "maintenance.min_input_files"))
    assert(Destination.parameters.filter(_.required).map(_.name) ===
      Seq("store.root", "table", "key.columns"))
    // inclusion metadata is introspectable (SpecifierService TYPE_INCLUSION)
    val bv = Destination.parameters.find(_.name == "batch.validation").get
    assert(bv.inclusion === Seq("strict", "net-only"))
  }

  test("configure: inclusion-validated parameter rejects out-of-list values") {
    val full = Map("store.root" -> "/x", "table" -> "t", "key.columns" -> "id")
    assert(Destination.configure(full + ("batch.validation" -> "net-only"))
      .get.validation === "net-only")
    Destination.configure(full + ("batch.validation" -> "lenient")) match {
      case Failure(e) => assert(e.getMessage ===
        "parameter batch.validation value 'lenient' not in [strict, net-only]")
      case Success(_) => fail("expected inclusion failure")
    }
  }

  test("configure: hadoop.* passthrough namespace; unknown prefixes rejected") {
    val full = Map("store.root" -> "/x", "table" -> "t", "key.columns" -> "id",
      "hadoop.fs.s3a.endpoint" -> "http://minio:9000",
      "hadoop.fs.s3a.access.key" -> "ak")
    val cfg = Destination.configure(full).get
    assert(cfg.hadoopProps === Map(
      "fs.s3a.endpoint" -> "http://minio:9000", "fs.s3a.access.key" -> "ak"))
    // a key OUTSIDE the namespace is an unknown parameter (exact message)
    Destination.configure(full + ("hadop.fs.s3a.endpoint" -> "x")) match {
      case Failure(e) =>
        assert(e.getMessage === "unknown parameters: hadop.fs.s3a.endpoint")
      case Success(_) => fail("expected unknown-parameter failure")
    }
  }

  test("configure: each missing required key fails with exact cause") {
    val full = Map("store.root" -> "/x", "table" -> "t", "key.columns" -> "id")
    assert(Destination.configure(full).isSuccess)
    full.keys.foreach { k =>
      Destination.configure(full - k) match {
        case Failure(e) => assert(e.getMessage.contains(k))
        case Success(_) => fail(s"expected failure without $k")
      }
    }
    Destination.configure(full + ("bogus" -> "1")) match {
      case Failure(e) => assert(e.getMessage.contains("bogus"))
      case Success(_) => fail("expected unknown-parameter failure")
    }
  }

  test("open + write/ack round-trip; acks carry record positions") {
    val root = tmpDir("dest-")
    new TableStore(spark, root).create("t", schema)
    val cfg = Destination.configure(Map(
      "store.root" -> root, "table" -> "t", "key.columns" -> "id")).get
    val stream = Destination.open(spark, cfg)
    val r1 = CdcRecord("p1".getBytes, CdcOp.Create,
      key = Some(RawData("""{"id": 1}""")),
      after = Some(RawData("""{"id": 1, "v": "a"}""")))
    val ack = stream.write(r1)
    assert(ack.isSuccess)
    assert(new String(ack.get.position) === "p1")
    assert(stream.table.count() === 1)

    val batch = Seq(
      CdcRecord("p2".getBytes, CdcOp.Update,
        key = Some(RawData("""{"id": 1}""")),
        after = Some(RawData("""{"id": 1, "v": "a2"}"""))),
      CdcRecord("p3".getBytes, CdcOp.Create,
        key = Some(RawData("""{"id": 2}""")),
        after = Some(RawData("""{"id": 2, "v": "b"}"""))))
    val acks = stream.writeBatch(batch)
    assert(acks.get.map(a => new String(a.position)) === Seq("p2", "p3"))
    val got = stream.table.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a2"), (2L, "b")))
  }

  test("auto-maintenance bounds pending tombstones on a resident stream") {
    val root = tmpDir("dest-maint-")
    val store = new TableStore(spark, root)
    store.create("t", schema)
    // the CDC-at-scale shape: updates commit equality tombstones (MoR),
    // not CoW rewrites — exactly the mode that accumulates sidecars
    store.setProperties("t", Map("write.merge.mode" -> Some("merge-on-read")))
    val stream = Destination.open(spark, Destination.configure(Map(
      "store.root" -> root, "table" -> "t", "key.columns" -> "id",
      "maintenance.auto" -> "true",
      "maintenance.max_entries" -> "2")).get)
    // seed, then a stream of update batches: every CDC apply commits one
    // equality tombstone sidecar alongside its appends — a resident
    // stream accumulates them forever without maintenance
    def upd(pos: String, id: Long, v: String) =
      CdcRecord(pos.getBytes, CdcOp.Update,
        key = Some(RawData(s"""{"id": $id}""")),
        after = Some(RawData(s"""{"id": $id, "v": "$v"}""")))
    assert(stream.write(CdcRecord("p0".getBytes, CdcOp.Create,
      key = Some(RawData("""{"id": 1}""")),
      after = Some(RawData("""{"id": 1, "v": "a"}""")))).isSuccess)
    (1 to 5).foreach { i =>
      assert(stream.writeBatch(Seq(upd(s"p$i", 1L, s"v$i"))).isSuccess)
      // the policy holds the bound after EVERY batch, not just at the end
      assert(store.pendingDeletes("t") <= 3,
        s"batch $i left ${store.pendingDeletes("t")} pending entries")
    }
    // CDC runs are un-mergeable (an append interleaves every tombstone),
    // so the policy must have escalated rewrite → materialize
    assert(stream.lastMaintenance.exists(_.isSuccess))
    assert(stream.lastMaintenance.get.get._1 != "rewrite",
      "CDC singleton runs cannot merge — rewrite would be a no-op loop")
    // rows stay exact through maintenance
    val got = stream.table.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "v5")))
    // without the flag nothing maintains (the default contract)
    val plain = Destination.open(spark, Destination.configure(Map(
      "store.root" -> root, "table" -> "t", "key.columns" -> "id")).get)
    (6 to 9).foreach(i => assert(plain.writeBatch(Seq(upd(s"p$i", 1L, s"v$i"))).isSuccess))
    assert(plain.lastMaintenance.isEmpty)
    assert(store.pendingDeletes("t") > 3)
  }

  test("auto file-packing bounds file fragmentation on a resident stream") {
    val root = tmpDir("dest-pack-")
    val store = new TableStore(spark, root)
    store.create("t", schema)
    val stream = Destination.open(spark, Destination.configure(Map(
      "store.root" -> root, "table" -> "t", "key.columns" -> "id",
      "maintenance.files" -> "true",
      "maintenance.min_input_files" -> "2")).get)
    def create(pos: String, id: Long) =
      CdcRecord(pos.getBytes, CdcOp.Create,
        key = Some(RawData(s"""{"id": $id}""")),
        after = Some(RawData(s"""{"id": $id, "v": "v$id"}""")))
    // every tiny batch commits one fragment file; at min_input_files=2
    // (most aggressive) the packer holds the live file count bounded
    // after EVERY batch — without packing a resident stream fragments
    // the table one file per ack forever
    (1 to 8).foreach { i =>
      assert(stream.writeBatch(Seq(create(s"p$i", i.toLong))).isSuccess)
      assert(store.currentRelPaths("t").size <= 2,
        s"batch $i left ${store.currentRelPaths("t").size} live files")
    }
    assert(stream.lastFilePack.exists(_.isSuccess))
    // rows stay exact through packing
    assert(stream.table.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      (1L to 8L).map(i => (i, s"v$i")))
    // without the flag nothing packs (the default contract)
    val plain = Destination.open(spark, Destination.configure(Map(
      "store.root" -> root, "table" -> "t", "key.columns" -> "id")).get)
    (9 to 12).foreach(i =>
      assert(plain.writeBatch(Seq(create(s"p$i", i.toLong))).isSuccess))
    assert(plain.lastFilePack.isEmpty)
    assert(store.currentRelPaths("t").size > 2)
  }

  test("min_input_files below 2 is rejected at configure, not at pack time") {
    val bad = Destination.configure(Map(
      "store.root" -> "/tmp/x", "table" -> "t", "key.columns" -> "id",
      "maintenance.files" -> "true",
      "maintenance.min_input_files" -> "1"))
    assert(bad.isFailure)
    assert(bad.failed.get.getMessage.contains("min_input_files"),
      s"exact-cause error expected, got: ${bad.failed.get.getMessage}")
  }

  test("default min_input_files=5 amortizes packing instead of rewriting per ack") {
    val root = tmpDir("dest-pack-")
    val store = new TableStore(spark, root)
    store.create("t", schema)
    val stream = Destination.open(spark, Destination.configure(Map(
      "store.root" -> root, "table" -> "t", "key.columns" -> "id",
      "maintenance.files" -> "true")).get)
    def create(pos: String, id: Long) =
      CdcRecord(pos.getBytes, CdcOp.Create,
        key = Some(RawData(s"""{"id": $id}""")),
        after = Some(RawData(s"""{"id": $id, "v": "v$id"}""")))
    // per-ack packing with min=2 rewrites the resident packed file on
    // EVERY ack — O(n^2) write amplification. The default (5, Iceberg's
    // min-input-files) packs only once 5 small siblings accumulate:
    // most acks pack nothing, the resident file rewrites once per 4 new
    // files, and the live count stays bounded by 5.
    var packs = 0
    (1 to 10).foreach { i =>
      assert(stream.writeBatch(Seq(create(s"p$i", i.toLong))).isSuccess)
      val (rw, _) = stream.lastFilePack.get.get
      if (rw > 0) packs += 1
      assert(store.currentRelPaths("t").size <= 5,
        s"batch $i left ${store.currentRelPaths("t").size} live files")
    }
    assert(packs === 2, s"10 acks must pack exactly twice, got $packs")
    assert(stream.table.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      (1L to 10L).map(i => (i, s"v$i")))
  }

  test("write failure surfaces the decode cause and applies nothing") {
    val root = tmpDir("dest-")
    new TableStore(spark, root).create("t", schema)
    val stream = Destination.open(spark,
      Destination.configure(Map(
        "store.root" -> root, "table" -> "t", "key.columns" -> "id")).get)
    val bad = CdcRecord("p9".getBytes, CdcOp.Delete,
      key = Some(RawData("not json")))
    stream.write(bad) match {
      case Failure(e) => assert(e.getMessage.contains("not JSON"))
      case Success(_) => fail("expected decode failure")
    }
    assert(stream.table.count() === 0)
    // open on a missing table is rejected (schema is catalog-owned)
    intercept[IllegalArgumentException] {
      Destination.open(spark, Destination.configure(Map(
        "store.root" -> root, "table" -> "missing", "key.columns" -> "id")).get)
    }
  }
}
