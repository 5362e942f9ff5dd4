package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SQL `CALL graft.system.<proc>(...)` maintenance procedures. */
class ProceduresSpec extends SparkSpec {
  import spark.implicits._

  private val root = tmpDir("proc-")
  spark.conf.set("spark.sql.catalog.gpr", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gpr.root", root)
  private def store = new TableStore(spark, root)

  test("CALL compact rewrites into the requested file count") {
    spark.sql("CREATE TABLE gpr.c1 (k BIGINT, v STRING)")
    (1 to 4).foreach(i =>
      store.append("c1", Seq((i.toLong, s"v$i")).toDF("k", "v")))
    assert(store.currentRelPaths("c1").size === 4)
    val r = spark.sql(
      "CALL gpr.system.compact(`table` => 'c1', num_files => 1)").head()
    assert(r.getLong(0) === 4L) // files_before
    assert(r.getLong(1) === 1L) // files_after
    assert(store.currentRelPaths("c1").size === 1)
    assert(spark.sql("SELECT count(*) FROM gpr.c1").head().getLong(0) === 4L)
  }

  test("CALL compact with cluster_cols z-orders the rewrite") {
    spark.sql("CREATE TABLE gpr.c2 (a BIGINT, b BIGINT) TBLPROPERTIES ('zone_cols'='a,b')")
    store.append("c2", spark.range(0, 1000).select(
      col("id").as("a"), (col("id") * 7 % 1000).as("b")))
    spark.sql(
      "CALL gpr.system.compact(`table` => 'c2', num_files => 4, cluster_cols => 'a,b')")
    assert(store.currentRelPaths("c2").size === 4)
    assert(spark.sql("SELECT count(*) FROM gpr.c2").head().getLong(0) === 1000L)
  }

  test("CALL expire_snapshots and remove_orphans clean history") {
    spark.sql("CREATE TABLE gpr.e1 (k BIGINT)")
    (1 to 3).foreach(i => store.append("e1", Seq(i.toLong).toDF("k")))
    spark.sql("CALL gpr.system.expire_snapshots('e1', 1)")
    val removed = spark.sql(
      "CALL gpr.system.remove_orphans(`table` => 'e1', older_than_ms => 0)")
      .head().getLong(0)
    assert(removed === 0L, "no orphans right after expiry on an append-only table")
    assert(spark.sql("SELECT count(*) FROM gpr.e1").head().getLong(0) === 3L)
  }

  test("CALL materialize_deletes folds pending MoR masks") {
    spark.sql("CREATE TABLE gpr.m1 (k BIGINT, v STRING)")
    store.append("m1", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    store.deleteMoR("m1", Seq(2L).toDF("k"), Seq("k"))
    assert(store.pendingDeletes("m1") === 1)
    val r = spark.sql("CALL gpr.system.materialize_deletes('m1')").head()
    assert(r.getLong(0) === 1L) // folded
    assert(store.pendingDeletes("m1") === 0)
    assert(spark.sql("SELECT k FROM gpr.m1 ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
  }

  test("CALL maintain_deletes acts on the t.deletes signal by policy") {
    spark.sql("CREATE TABLE gpr.md (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('zone_cols'='k')")
    store.append("md", (0L until 100L).map(i => (i, i.toDouble)).toDF("k", "v"))
    // clean table: none, and nothing commits
    val v0 = store.currentVersion("md")
    val c = spark.sql("CALL gpr.system.maintain_deletes('md')").head()
    assert(c.getString(0) === "none" && store.currentVersion("md") === v0)
    (0 until 5).foreach(i =>
      store.deleteMoR("md", Seq(i.toLong).toDF("k"), Seq("k")))
    val files = store.currentRelPaths("md").toSet
    // entries (5) over max_entries (3), bytes under: rewrite merges them
    val r = spark.sql("CALL gpr.system.maintain_deletes(" +
      "`table` => 'md', max_entries => 3)").head()
    assert(r.getString(0) === "rewrite")
    assert(r.getLong(1) === 5L && r.getLong(2) < 5L)
    assert(store.currentRelPaths("md").toSet === files,
      "rewrite must not touch data files")
    // byte pressure: materialize folds everything into data files
    val m = spark.sql("CALL gpr.system.maintain_deletes(" +
      "`table` => 'md', max_bytes => CAST(1 AS BIGINT))").head()
    assert(m.getString(0) === "materialize" && m.getLong(2) === 0L)
    assert(store.pendingDeletes("md") === 0)
    assert(spark.sql("SELECT count(*) FROM gpr.md").head().getLong(0) === 95L)
    // idempotent afterwards
    assert(spark.sql("CALL gpr.system.maintain_deletes('md')").head()
      .getString(0) === "none")
  }

  test("maintain_deletes escalates to materialize when runs cannot merge") {
    spark.sql("CREATE TABLE gpr.me (k BIGINT, v DOUBLE)")
    store.append("me", (0L until 50L).map(i => (i, i.toDouble)).toDF("k", "v"))
    // an APPEND between every tombstone — the CDC shape: each entry's
    // run is a singleton under the sequence rule, rewrite merges nothing
    (0 until 4).foreach { i =>
      store.deleteMoR("me", Seq(i.toLong).toDF("k"), Seq("k"))
      store.append("me", Seq((100L + i, 0.0)).toDF("k", "v"))
    }
    assert(store.pendingDeletes("me") === 4)
    val r = spark.sql("CALL gpr.system.maintain_deletes(" +
      "`table` => 'me', max_entries => 2)").head()
    assert(r.getString(0) === "materialize",
      s"un-mergeable runs must escalate past the no-op rewrite, got $r")
    assert(r.getLong(2) === 0L && store.pendingDeletes("me") === 0)
    assert(spark.sql("SELECT count(*) FROM gpr.me").head().getLong(0) === 50L)
  }

  test("CALL maintain runs the whole routine policy: deletes, packing, expiry") {
    spark.sql("CREATE TABLE gpr.mt1 (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.merge.mode'='merge-on-read')")
    // fragment the table like a resident stream would, with a pending
    // tombstone in the mix
    (1 to 6).foreach(i =>
      store.append("mt1", Seq((i.toLong, s"v$i")).toDF("k", "v")))
    store.deleteMoR("mt1", Seq(3L).toDF("k"), Seq("k"))
    assert(store.pendingDeletes("mt1") === 1)
    assert(store.currentRelPaths("mt1").size === 6)
    val r = spark.sql("CALL gpr.system.maintain(`table` => 'mt1', " +
      "max_bytes => CAST(1 AS BIGINT), keep_last => 2)").head()
    // byte pressure folded the sidecar, packing merged the fragments,
    // expiry trimmed history — and visible rows never changed
    assert(r.getString(0) === "materialize")
    assert(r.getLong(1) === 0L) // entries_after
    assert(r.getLong(2) >= 2L) // files_rewritten
    assert(r.getLong(3) < r.getLong(2)) // files_written: packed down
    assert(store.pendingDeletes("mt1") === 0)
    assert(spark.sql("SELECT k FROM gpr.mt1 ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 5L, 6L))
    // idempotent: a second call is all no-ops
    val r2 = spark.sql("CALL gpr.system.maintain(`table` => 'mt1')").head()
    assert(r2.getString(0) === "none")
    assert(r2.getLong(2) === 0L && r2.getLong(3) === 0L)
  }

  test("CALL maintain_index: refresh + tombstone fold + recall drift report") {
    import graft.ops.Similarity
    val emb = spark.range(0, 200).select(col("id").as("vec_id"),
      Similarity.quantize(transform(sequence(lit(1), lit(64)),
        d => sin((col("id") + 1) * d.cast("double")))).as("embedding"),
      (col("id") % 7).cast("int").as("label"))
    spark.sql("DROP TABLE IF EXISTS gpr.micorpus")
    store.create("micorpus", emb.schema)
    store.append("micorpus", emb)
    // first call = full build; the LSH index's recall on a clean corpus
    // sits well above the floor → action "ok"
    val r1 = spark.sql("CALL gpr.system.maintain_index(" +
      "corpus => 'micorpus', `index` => 'miidx', kind => 'lsh', " +
      "sample => 8, k => 5, recall_floor => 0.3)").head()
    assert(r1.getLong(0) === 200L, "full build indexes the corpus")
    assert(r1.getLong(3) === 40L, "8 samples x k=5 truth pairs")
    assert(r1.getDouble(4) >= 0.3, s"recall ${r1.getDouble(4)} under floor")
    assert(r1.getString(5) === "ok")
    // corpus mutation → second call maintains incrementally AND folds
    // the tombstone the maintenance itself wrote on the index
    store.deleteMoR("micorpus", (150L until 200L).toDF("vec_id"),
      Seq("vec_id"))
    val r2 = spark.sql("CALL gpr.system.maintain_index(" +
      "corpus => 'micorpus', `index` => 'miidx', kind => 'lsh', " +
      "sample => 8, k => 5, recall_floor => 0.3)").head()
    assert(r2.getLong(0) === 0L, "deletes alone re-index nothing")
    assert(r2.getString(5) === "ok")
    // an impossible floor flips the drift report, never throws
    val r3 = spark.sql("CALL gpr.system.maintain_index(" +
      "corpus => 'micorpus', `index` => 'miidx', kind => 'lsh', " +
      "recall_floor => 1.01)").head()
    assert(r3.getString(5) === "rebuild-recommended")
    // IVF and PQ kinds run the same composite end-to-end
    Seq("ivf", "pq").foreach { kind =>
      val r = spark.sql("CALL gpr.system.maintain_index(" +
        s"corpus => 'micorpus', `index` => 'mi$kind', kind => '$kind', " +
        "sample => 4, k => 3, recall_floor => 0.0)").head()
      assert(r.getLong(3) === 12L, s"$kind truth pairs")
      assert(r.getString(5) === "ok", s"$kind with floor 0 is always ok")
    }
    val e = intercept[Exception](spark.sql("CALL gpr.system.maintain_index(" +
      "corpus => 'micorpus', `index` => 'x', kind => 'nope')").head())
    assert(e.getMessage.contains("unknown index kind"))
  }

  test("CALL rebuild_index: re-seed recovers recall after distribution shift") {
    import graft.ops.Similarity
    def corpus(from: Long, until: Long)(
        gen: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
          => org.apache.spark.sql.Column) =
      spark.range(from, until).select(col("id").as("vec_id"),
        Similarity.quantize(transform(sequence(lit(1), lit(64)),
          d => gen(col("id"), d.cast("double")))).as("embedding"),
        (col("id") % 7).cast("int").as("label"))
    val a = corpus(0L, 1000L)((id, d) => sin((id + 1) * d))
    spark.sql("DROP TABLE IF EXISTS gpr.rbcorpus")
    store.create("rbcorpus", a.schema)
    store.append("rbcorpus", a)
    val call = "corpus => 'rbcorpus', `index` => 'rbidx', kind => 'pq', " +
      "sample => 8, k => 5, recall_floor => 0.5"
    val r1 = spark.sql(s"CALL gpr.system.maintain_index($call)").head()
    assert(r1.getString(5) === "ok",
      s"fresh PQ recall ${r1.getDouble(4)} must clear the floor")
    // distribution SHIFT: the corpus is wholly replaced by OFFSET
    // CLUSTERED vectors (16 cluster patterns + noise, all shifted far
    // from the old range): the OLD codebooks, trained on full-swing
    // zero-centered waves, cannot resolve the clusters, ADC ranking
    // degrades and the drift report flips
    val b = corpus(1000L, 2000L)((id, d) =>
      lit(3.0) + sin((pmod(id, lit(16L)) * 31L + 7L) * d) +
        sin(id * d) * 0.3)
    store.append("rbcorpus", b)
    store.deleteMoR("rbcorpus", (0L until 1000L).toDF("vec_id"), Seq("vec_id"))
    val r2 = spark.sql(s"CALL gpr.system.maintain_index($call)").head()
    assert(r2.getString(5) === "rebuild-recommended",
      s"drifted recall ${r2.getDouble(4)} should fall below the floor")
    // the rebuild re-seeds the codebooks from the CURRENT corpus and
    // swaps atomically; recall recovers above the floor
    val r3 = spark.sql(s"CALL gpr.system.rebuild_index($call)").head()
    assert(r3.getLong(0) === 1000L, "full rebuild indexes the whole corpus")
    assert(r3.getDouble(4) > r2.getDouble(4),
      s"recall must recover: ${r2.getDouble(4)} -> ${r3.getDouble(4)}")
    assert(r3.getString(5) === "ok",
      s"rebuilt recall ${r3.getDouble(4)} must clear the floor")
    // the atomic publish left a paired build stamp in both tables'
    // commit metadata: the query path accepts it, and an out-of-band
    // mutation that breaks the pairing fails loud instead of
    // mis-scanning (stamps ride commits now, so the break must too)
    val q = graft.ops.AnnIndex.queryPq(store, "rbidx",
      store.read("rbcorpus").limit(2), k = 3)
    assert(q.count() === 6L)
    store.append("rbidx_codebooks", store.read("rbidx_codebooks").limit(0),
      meta = Map("ann.build-id" -> "not-the-index-build"))
    val e = intercept[IllegalArgumentException](
      graft.ops.AnnIndex.queryPq(store, "rbidx",
        store.read("rbcorpus").limit(1), k = 1).count())
    assert(e.getMessage.contains("build"))
  }

  test("rebuild_index publishes index + side table ATOMICALLY: concurrent queries never mis-pair") {
    import graft.ops.{AnnIndex, Similarity}
    val emb = spark.range(0L, 200L).select(col("id").as("vec_id"),
      Similarity.quantize(transform(sequence(lit(1), lit(16)),
        d => sin((col("id") + 1) * d.cast("double")))).as("embedding"),
      (col("id") % 5).cast("int").as("label"))
    store.create("rccorpus", emb.schema, overwrite = true)
    store.append("rccorpus", emb)
    assert(AnnIndex.refreshIvf(store, "rccorpus", "rcidx") === 200L)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val probe = store.read("rccorpus").filter(col("vec_id") < 2L)
      .collect() // driver-side probe rows: the loop re-wraps them
    val probeDf = spark.createDataFrame(
      java.util.Arrays.asList(probe: _*), emb.schema)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try { AnnIndex.queryIvf(store, "rcidx", probeDf, k = 2).count(); () }
        catch { case e: Throwable => errs.add(e); () }
      }
    })
    reader.start()
    try {
      // two back-to-back rebuilds while the query loop runs: the index
      // and its centroids publish in ONE transaction, so no read can
      // observe a mis-paired (or missing) state — the old two-rename
      // window is gone, and prior-snapshot files survive the publish
      (1 to 2).foreach { _ =>
        AnnIndex.rebuildIndex(store, "rccorpus", "rcidx", "ivf",
          sample = 2, k = 2)
      }
    } finally { stop.set(true); reader.join() }
    import scala.jdk.CollectionConverters._
    assert(errs.isEmpty,
      s"concurrent queries across the atomic publish must all succeed; " +
        s"got: ${errs.asScala.take(3).map(_.toString).mkString(" | ")}")
  }

  test("CALL branch / tag / fast_forward drive the WAP flow") {
    spark.sql("CREATE TABLE gpr.b1 (k BIGINT)")
    store.append("b1", Seq(1L).toDF("k"))
    spark.sql("CALL gpr.system.create_branch('b1', 'audit')")
    store.append("b1", Seq(2L).toDF("k"), branch = Some("audit"))
    // main unchanged until publish
    assert(spark.sql("SELECT count(*) FROM gpr.b1").head().getLong(0) === 1L)
    spark.sql("CALL gpr.system.fast_forward('b1', 'audit')")
    assert(spark.sql("SELECT count(*) FROM gpr.b1").head().getLong(0) === 2L)
    spark.sql("CALL gpr.system.create_tag('b1', 'published', -1)")
    assert(store.refs("b1").contains("published"))
    spark.sql("CALL gpr.system.drop_ref('b1', 'audit')")
    assert(!store.refs("b1").contains("audit"))
  }

  test("t.history: ancestry-aware after branch commits, timestamps " +
    "monotone along the chain") {
    spark.sql("CREATE TABLE gpr.h1 (k BIGINT)")
    store.append("h1", Seq(1L).toDF("k"))
    store.append("h1", Seq(2L).toDF("k"))
    store.createBranch("h1", "side")
    // a branch-only commit: retained, but not an ancestor of MAIN
    store.append("h1", Seq(99L).toDF("k"), branch = Some("side"))
    store.append("h1", Seq(3L).toDF("k"))
    val h = spark.sql(
      "SELECT version, parent, is_current_ancestor FROM gpr.h1.history " +
        "ORDER BY version").collect()
    val byV = h.map(r => r.getInt(0) ->
      (Option(r.get(1)).map(_.asInstanceOf[Int]), r.getBoolean(2))).toMap
    // create(1), append(2), append(3) = main chain; branch append and the
    // main append that followed got distinct versions
    val ancestors = byV.filter(_._2._2).keys.toSeq.sorted
    val strays = byV.filterNot(_._2._2).keys.toSeq
    assert(strays.size === 1, s"expected 1 branch-only commit, got $byV")
    assert(ancestors.size === byV.size - 1)
    // the branch commit's parent is on the main chain (it forked there)
    assert(byV(strays.head)._1.exists(p => ancestors.contains(p)))
    // timestamps are present and ordered along ascending versions
    val ts = spark.sql(
      "SELECT made_current_at FROM gpr.h1.history ORDER BY version")
      .collect().map(_.getTimestamp(0).getTime)
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
  }

  test("CALL rewrite_deletes merges sidecars, never touches data files") {
    spark.sql("CREATE TABLE gpr.rd (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('zone_cols'='k')")
    store.append("rd", (0L until 100L).map(i => (i, i.toDouble)).toDF("k", "v"))
    // three consecutive equality tombstone batches + two position deletes,
    // NO appends in between — all mergeable
    store.deleteMoR("rd", Seq(1L, 2L).toDF("k"), Seq("k"))
    store.deleteMoR("rd", Seq(3L).toDF("k"), Seq("k"))
    store.deleteMoR("rd", Seq(4L, 5L).toDF("k"), Seq("k"))
    store.deletePos("rd", col("v") === 50.0)
    store.deletePos("rd", col("v") === 60.0)
    assert(store.pendingDeletes("rd") === 5)
    val files = store.currentRelPaths("rd").toSet
    val before = spark.sql("SELECT k FROM gpr.rd ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    val r = spark.sql(
      "CALL gpr.system.rewrite_deletes(`table` => 'rd')").head()
    assert(r.getLong(0) === 5L) // entries_before
    assert(r.getLong(1) === 2L) // one merged eq + one merged pos
    assert(store.pendingDeletes("rd") === 2)
    assert(store.currentRelPaths("rd").toSet === files,
      "data files must be untouched")
    val after = spark.sql("SELECT k FROM gpr.rd ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(after === before, "masked read must be identical")
    assert(!after.exists(Set(1L, 2L, 3L, 4L, 5L, 50L, 60L)))
  }

  test("rewrite_deletes honors the sequence rule across interleaved appends") {
    spark.sql("CREATE TABLE gpr.rd2 (k BIGINT)")
    store.append("rd2", (0L until 10L).map(Tuple1(_)).toDF("k"))
    store.deleteMoR("rd2", Seq(1L).toDF("k"), Seq("k"))
    // re-insert k=1 BETWEEN the two deletes: merging across this file
    // would raise the first delete's sequence past it and re-mask it
    store.append("rd2", Seq(1L).map(Tuple1(_)).toDF("k"))
    store.deleteMoR("rd2", Seq(2L).toDF("k"), Seq("k"))
    assert(store.pendingDeletes("rd2") === 2)
    val before = spark.sql("SELECT k FROM gpr.rd2 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(before.contains(1L) && !before.contains(2L))
    val r = spark.sql(
      "CALL gpr.system.rewrite_deletes(`table` => 'rd2')").head()
    // nothing mergeable: the interleaved append splits the run
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    val after = spark.sql("SELECT k FROM gpr.rd2 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(after === before)
    // a third tombstone right after the second DOES merge with it
    store.deleteMoR("rd2", Seq(3L).toDF("k"), Seq("k"))
    val r2 = spark.sql(
      "CALL gpr.system.rewrite_deletes(`table` => 'rd2')").head()
    assert(r2.getLong(0) === 3L && r2.getLong(1) === 2L)
    val after2 = spark.sql("SELECT k FROM gpr.rd2 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(after2 === before.filterNot(_ == 3L))
  }

  test("unknown procedure fails loudly") {
    val e = intercept[Exception](spark.sql("CALL gpr.system.nope()"))
    assert(e.getMessage.contains("no such procedure") ||
      e.getMessage.toLowerCase.contains("nope"))
  }
}
