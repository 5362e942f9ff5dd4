package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Optimistic-concurrency behavior of [[TableStore]]: interleaved
  * appenders both succeed (rebase), disjoint-file mutations commute,
  * overlapping CoW mutations abort exactly one writer CLEANLY, the
  * [[CommitCoordinator]] CAS never half-commits, and incremental reads
  * follow the committed parent chain past phantom manifests. Lives in
  * package graft.tables for the `private[tables]` test seams
  * (beforeCommitHook, bloom load counters). */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = tmpDir("concurrency-")

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.StringType)))

  test("two interleaved appenders both succeed with the net union") {
    val root = newRoot()
    val a = new TableStore(spark, root)
    val b = new TableStore(spark, root)
    a.create("t", schema)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val t1 = new Thread(() =>
      try a.append("t", (1L to 50L).map(i => (i, s"a$i")).toDF("id", "v"))
      catch { case e: Throwable => errs.add(e); () })
    val t2 = new Thread(() =>
      try b.append("t", (51L to 100L).map(i => (i, s"b$i")).toDF("id", "v"))
      catch { case e: Throwable => errs.add(e); () })
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(errs.isEmpty, s"concurrent appends must both succeed: ${errs.peek()}")
    assert(a.read("t").count() === 100)
    assert(a.read("t").select("id").as[Long].collect().toSet === (1L to 100L).toSet)
    // both commits are on the parent chain — incremental sees both
    assert(a.readAppendedSince("t", 1).count() === 100)
  }

  test("append commutes with a concurrent delete (deterministic interleave)") {
    val root = newRoot()
    val a = new TableStore(spark, root)
    val b = new TableStore(spark, root)
    a.create("t", schema, zoneCols = Seq("id"))
    a.append("t", (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    // a plans its delete against the current snapshot; b's append commits
    // FIRST (injected just before a's commit). a's delete must rebase —
    // b's freshly appended file is untouched by the rewrite.
    a.beforeCommitHook = () => {
      a.beforeCommitHook = () => ()
      b.append("t", Seq((100L, "late")).toDF("id", "v"))
    }
    a.delete("t", col("id") <= 3L)
    val got = a.read("t").select("id").as[Long].collect().toSet
    assert(got === ((4L to 10L).toSet + 100L))
  }

  test("compaction rebases over a concurrent append") {
    val root = newRoot()
    val a = new TableStore(spark, root)
    val b = new TableStore(spark, root)
    a.create("t", schema)
    a.append("t", (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    a.append("t", (11L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    a.beforeCommitHook = () => {
      a.beforeCommitHook = () => ()
      b.append("t", Seq((100L, "late")).toDF("id", "v"))
    }
    a.compact("t", numFiles = 1)
    assert(a.read("t").select("id").as[Long].collect().toSet ===
      ((1L to 20L).toSet + 100L))
  }

  test("overlapping CoW mutations: the second aborts cleanly, staged files removed") {
    val root = newRoot()
    val a = new TableStore(spark, root)
    val b = new TableStore(spark, root)
    a.create("t", schema)
    // ONE data file → any two row-level deletes overlap on it
    a.append("t", (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    a.beforeCommitHook = () => {
      a.beforeCommitHook = () => ()
      b.delete("t", col("id") === 2L) // b wins the race, rewrites the file
    }
    val e = intercept[CommitConflictException] { a.delete("t", col("id") === 1L) }
    assert(e.getMessage.contains("conflicts with current snapshot"))
    // the table is exactly as the WINNER left it
    assert(a.read("t").select("id").as[Long].collect().toSet ===
      (1L to 10L).toSet - 2L)
    // a's staged survivor files were cleaned up: nothing unreferenced
    assert(a.removeOrphans("t", olderThanMs = 0L) === Seq.empty)
    // and the loser can simply re-run against the new snapshot
    a.delete("t", col("id") === 1L)
    assert(a.read("t").select("id").as[Long].collect().toSet ===
      (1L to 10L).toSet -- Set(1L, 2L))
  }

  test("InProcessCasCoordinator: exactly one racer wins a swap") {
    val c = new InProcessCasCoordinator
    assert(c.swap("t", None, "m1"))
    val wins = new java.util.concurrent.atomic.AtomicInteger
    val threads = (1 to 16).map { i =>
      new Thread(() => {
        if (c.swap("t", Some("m1"), s"m2-$i")) { wins.incrementAndGet(); () }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() === 1)
    assert(c.current("t").exists(_.startsWith("m2-")))
    // a loser's expected value no longer matches — its swap must fail
    assert(!c.swap("t", Some("m1"), "m3"))
  }

  test("a lost pointer CAS retries cleanly and never half-commits") {
    val root = newRoot()
    // coordinator that loses the FIRST swap (simulating a raced catalog),
    // then behaves — the commit loop must delete the unreferenced
    // manifest family and succeed on retry
    val inner = new InProcessCasCoordinator
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    val flaky = new CommitCoordinator {
      override def current(table: String) = inner.current(table)
      override def swap(table: String, expected: Option[String], next: String) =
        if (failOnce.compareAndSet(true, false)) false
        else inner.swap(table, expected, next)
      override def clear(table: String): Unit = inner.clear(table)
    }
    val st = new TableStore(spark, root, coordinator = Some(flaky))
    st.create("t", schema) // consumes the injected failure + one retry
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    assert(st.read("t").select("id").as[Long].collect().toSet === Set(1L))
    // every manifest on disk is on the committed chain — the lost
    // attempt's family was deleted, so version numbers are contiguous
    // from the chain walk and no phantom .appended sidecar remains
    val d = new java.io.File(root, "t")
    val manifests = d.listFiles().map(_.getName)
      .filter(f => f.startsWith("manifest-") && f.endsWith(".txt")).sorted
    val chain = Iterator.iterate(Option(st.currentVersion("t"))) {
      case Some(v) if v > 0 => st.commitParent("t", v)
      case _ => None
    }.takeWhile(_.exists(_ > 0)).flatten.toSet
    assert(manifests.map(f => f.stripPrefix("manifest-").stripSuffix(".txt").toInt)
      .toSet === chain)
  }

  test("readAppendedSince follows the parent chain, skipping phantom manifests") {
    val root = newRoot()
    val st = new TableStore(spark, root)
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    val v = st.currentVersion("t")
    // plant a phantom: a manifest family numbered past the head whose
    // writer died before (or lost) its pointer swap — its sidecar lists
    // a file that was never committed
    val d = java.nio.file.Paths.get(root, "t")
    java.nio.file.Files.write(d.resolve(f"manifest-${v + 1}%06d.txt"),
      "ghost.parquet".getBytes)
    java.nio.file.Files.write(d.resolve(f"manifest-${v + 1}%06d.appended"),
      "ghost.parquet".getBytes)
    st.append("t", Seq((2L, "b")).toDF("id", "v")) // claims v+2, parent v
    assert(st.currentVersion("t") === v + 2)
    assert(st.commitParent("t", v + 2) === Some(v))
    // the phantom's ghost file must NOT surface (the numeric range would
    // have required it to exist and thrown)
    val inc = st.readAppendedSince("t", v).select("id").as[Long].collect().toSeq
    assert(inc === Seq(2L))
  }

  test("commit meta tags: lastMetaValue walks past untagged commits") {
    val root = newRoot()
    val st = new TableStore(spark, root)
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"),
      meta = Map("graft.stream.batchId.s" -> "7"))
    st.append("t", Seq((2L, "b")).toDF("id", "v")) // untagged (e.g. backfill)
    st.compact("t", numFiles = 1)                  // untagged rewrite
    assert(st.lastMetaValue("t", "graft.stream.batchId.s") === Some("7"))
    st.append("t", Seq((3L, "c")).toDF("id", "v"),
      meta = Map("graft.stream.batchId.s" -> "9"))
    assert(st.lastMetaValue("t", "graft.stream.batchId.s") === Some("9"))
    assert(st.lastMetaValue("t", "absent.tag") === None)
  }

  test("snapshot bloom roll-up: an absent key batch costs zero per-file loads") {
    val root = newRoot()
    val st = new TableStore(spark, root)
    st.create("t", schema, bloomCols = Seq("id"), bloomItems = 1000)
    st.append("t", (1L to 500L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(4))
    st.append("t", (501L to 1000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(4))
    // absent keys: the roll-up (ONE load per column) proves no file can
    // match — the per-file sidecars are never opened
    val f0 = st.bloomFileLoads.get(); val r0 = st.bloomRollupLoads.get()
    val none = st.candidateFilesForKeys("t",
      Seq(55555L, 66666L).toDF("id"), Seq("id"))
    assert(none === Seq.empty)
    assert(st.bloomFileLoads.get() === f0, "no per-file bloom load on a roll-up miss")
    assert(st.bloomRollupLoads.get() >= r0 + 1)
    // present keys still resolve through per-file probes
    val some = st.candidateFilesForKeys("t", Seq(42L).toDF("id"), Seq("id"))
    assert(some.nonEmpty && some.size < st.currentRelPaths("t").size)
    // correctness stays exact through the roll-up path
    st.upsert("t", Seq((42L, "updated")).toDF("id", "v"), Seq("id"))
    assert(st.read("t").filter(col("id") === 42L).select("v").as[String]
      .collect().toSeq === Seq("updated"))
    // compaction rebuilds the roll-up from scratch (no stale-bit growth):
    // still answers absent-key probes with zero file loads
    st.compact("t", numFiles = 2)
    val f1 = st.bloomFileLoads.get()
    assert(st.candidateFilesForKeys("t", Seq(77777L).toDF("id"), Seq("id")) === Nil)
    assert(st.bloomFileLoads.get() === f1)
  }
}
