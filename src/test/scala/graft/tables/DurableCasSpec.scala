package graft.tables

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import graft.{MockAbstractFs, MockFs, SparkSpec}

/** [[FileCasCoordinator]]: a durable cross-process commit pointer built
  * on create-exclusive alone — no atomic rename anywhere in the commit
  * path. The headline test races two INDEPENDENT TableStore instances
  * (separate stores, separate coordinator objects, same root) on a
  * non-`file:` scheme where rename-with-overwrite is NOT atomic: both
  * appends must land, history must stay linear. */
class DurableCasSpec extends SparkSpec {
  import spark.implicits._

  private val fsProps = Map(
    "fs.mockfs.impl" -> classOf[MockFs].getName,
    "fs.AbstractFileSystem.mockfs.impl" -> classOf[MockAbstractFs].getName)

  private def conf() = {
    val c = spark.sessionState.newHadoopConf()
    fsProps.foreach { case (k, v) => c.set(k, v) }
    c
  }

  test("CAS semantics: swap wins once, losers leave the pointer intact") {
    val dir = tmpDir("cas-")
    val a = new FileCasCoordinator(conf(), dir)
    val b = new FileCasCoordinator(conf(), dir) // independent instance
    assert(a.current("t") === None)
    assert(a.swap("t", None, "m1"))
    assert(b.current("t") === Some("m1"), "second instance sees the swap")
    assert(!b.swap("t", None, "m2"), "stale expected loses")
    assert(b.swap("t", Some("m1"), "m2"))
    assert(a.current("t") === Some("m2"))
    // clear is a tombstone, not a delete — old generations cannot resurface
    a.clear("t")
    assert(b.current("t") === None)
    assert(b.swap("t", None, "m3"))
    assert(a.current("t") === Some("m3"))
  }

  test("racing swaps from many threads: exactly one winner per generation") {
    val dir = tmpDir("cas-race-")
    val coords = (0 until 8).map(_ => new FileCasCoordinator(conf(), dir))
    assert(coords.head.swap("t", None, "v0"))
    val wins = new java.util.concurrent.atomic.AtomicInteger
    (1 to 10).foreach { gen =>
      val expected = Some(s"v${gen - 1}")
      val threads = coords.zipWithIndex.map { case (c, i) =>
        new Thread(() => {
          if (c.swap("t", expected, s"v$gen")) { wins.incrementAndGet(); () }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(coords.head.current("t") === Some(s"v$gen"))
    }
    assert(wins.get() === 10, "exactly one winner per generation")
  }

  test("ledger prunes old generations but never the head") {
    val dir = tmpDir("cas-prune-")
    val c = new FileCasCoordinator(conf(), dir)
    var prev: Option[String] = None
    (1 to 40).foreach { i =>
      assert(c.swap("t", prev, s"m$i")); prev = Some(s"m$i")
    }
    assert(c.current("t") === Some("m40"))
    val fs = new HPath(dir).getFileSystem(conf())
    val n = fs.listStatus(new HPath(dir, "t")).length
    assert(n <= FileCasCoordinator.Keep + 2, s"ledger holds $n entries")
  }

  test("two independent TableStores race appends through the CAS — both land") {
    val root = "mockfs:" + tmpDir("cas-store-")
    fsProps.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v) }
    val casDir = tmpDir("cas-ptr-")
    // each store gets its OWN coordinator instance — nothing shared
    // in-process; the directory is the only common ground
    def mkStore() = new TableStore(spark, root, fsProps,
      Some(new FileCasCoordinator(conf(), casDir)))
    val a = mkStore()
    val b = mkStore()
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    a.create("t", df.schema)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val t1 = new Thread(() =>
      try a.append("t", df.filter(col("id") % 2 === 0))
      catch { case e: Throwable => errs.add(e); () })
    val t2 = new Thread(() =>
      try b.append("t", df.filter(col("id") % 2 =!= 0))
      catch { case e: Throwable => errs.add(e); () })
    t1.start(); t2.start(); t1.join(); t2.join()
    if (!errs.isEmpty) throw errs.peek()
    val fresh = mkStore() // a third process's view
    assert(fresh.read("t").count() === 100L, "no commit lost")
    assert(fresh.read("t").select("id").distinct().count() === 100L,
      "no row duplicated")
    // history is LINEAR: every committed snapshot chains to its parent
    val head = fresh.currentVersion("t")
    var v = head
    var steps = 0
    while (v > 0 && steps < 100) {
      fresh.commitParent("t", v) match {
        case Some(p) => assert(p < v); v = p
        case None    => v = 0
      }
      steps += 1
    }
    // a CoW mutation through the same coordinator still commits cleanly
    fresh.delete("t", col("id") <= 10L)
    assert(mkStore().read("t").count() === 90L)
  }

  test("swapAll commits every pointer atomically or none") {
    val dir = tmpDir("cas-tx-")
    val a = new FileCasCoordinator(conf(), dir)
    val b = new FileCasCoordinator(conf(), dir)
    assert(a.swap("x", None, "x1") && a.swap("y", None, "y1"))
    // commit: both advance, second instance observes both
    assert(a.swapAll(Seq(("x", Some("x1"), "x2"), ("y", Some("y1"), "y2"))))
    assert(b.current("x") === Some("x2") && b.current("y") === Some("y2"))
    // stale expected on ONE table: NEITHER advances
    assert(!b.swapAll(Seq(("x", Some("x2"), "x3"), ("y", Some("y1"), "y3"))))
    assert(a.current("x") === Some("x2") && a.current("y") === Some("y2"))
    // plain CAS still works above transaction markers
    assert(a.swap("x", Some("x2"), "x3"))
    assert(b.current("x") === Some("x3"))
  }

  test("racing multi-table transactions from independent instances: no torn state") {
    val dir = tmpDir("cas-txrace-")
    val setup = new FileCasCoordinator(conf(), dir)
    assert(setup.swap("p", None, "p0") && setup.swap("q", None, "q0"))
    // 8 independent coordinator instances × 10 generations, every
    // transaction advancing BOTH pointers in lockstep: after each
    // round exactly one winner, and p/q must NEVER disagree on the
    // generation — a torn (compensated-late or half-advanced) state
    // would surface as p@i with q@j, i != j
    val coords = (0 until 8).map(_ => new FileCasCoordinator(conf(), dir))
    (1 to 10).foreach { gen =>
      val e = (Some(s"p${gen - 1}"): Option[String],
        Some(s"q${gen - 1}"): Option[String])
      val wins = new java.util.concurrent.atomic.AtomicInteger
      val threads = coords.map { c =>
        new Thread(() => {
          if (c.swapAll(Seq(("p", e._1, s"p$gen"), ("q", e._2, s"q$gen"))))
            { wins.incrementAndGet(); () }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(wins.get() === 1, s"generation $gen: ${wins.get()} winners")
      val fresh = new FileCasCoordinator(conf(), dir)
      assert(fresh.current("p") === Some(s"p$gen"))
      assert(fresh.current("q") === Some(s"q$gen"))
    }
  }

  test("a crashed transaction's reservations abort on first read — no block, no tear") {
    val dir = tmpDir("cas-crash-")
    val c = new FileCasCoordinator(conf(), dir)
    assert(c.swap("x", None, "x1") && c.swap("y", None, "y1"))
    // simulate a committer that died between reserving and deciding:
    // hand-write marker entries with NO transaction record
    val fs = new HPath(dir).getFileSystem(conf())
    def plant(key: String, gen: Long, txid: String): Unit = {
      val out = fs.create(new HPath(new HPath(dir, key), s"commit-$gen"), false)
      try out.write(s"tx:$txid".getBytes("UTF-8")) finally out.close()
    }
    plant("x", 2L, "dead-tx")
    plant("y", 2L, "dead-tx")
    // a fresh observer resolves BOTH pointers to the pre-transaction
    // values (deciding the abort as a side effect), not one old one new
    val reader = new FileCasCoordinator(conf(), dir)
    assert(reader.current("x") === Some("x1"))
    assert(reader.current("y") === Some("y1"))
    // the dead transaction is now decided: a late "committer" re-trying
    // its record loses, and normal CAS proceeds above the markers
    assert(reader.swap("x", Some("x1"), "x2"))
    assert(reader.swap("y", Some("y1"), "y2"))
    val fresh = new FileCasCoordinator(conf(), dir)
    assert(fresh.current("x") === Some("x2"))
    assert(fresh.current("y") === Some("y2"))
  }

  test("an empty unframed ledger entry on a non-local scheme fails loud") {
    // a writer that crashed between create and write leaves an empty
    // unframed entry; resolving it as "cleared" would let a racing
    // writer CAS from expected=None and silently discard the prior
    // pointer — the reader must refuse instead
    val dir = "mockfs:" + tmpDir("cas-torn-")
    spark.sparkContext.hadoopConfiguration.setIfUnset(
      "fs.mockfs.impl", classOf[MockFs].getName)
    val c = new FileCasCoordinator(conf(), dir)
    assert(c.swap("t", None, "m1"))
    val fs = new HPath(dir).getFileSystem(conf())
    fs.create(new HPath(new HPath(dir, "t"), "commit-2"), false).close()
    val reader = new FileCasCoordinator(conf(), dir)
    val e = intercept[RuntimeException](reader.current("t"))
    assert(e.getMessage.contains("refusing"),
      s"wanted the refuse-to-guess error, got: ${e.getMessage}")
  }

  test("legacy unframed entries resolve once, then serve from cache") {
    // a complete pre-framing entry is indistinguishable from an
    // in-flight write on a non-local scheme: the first read pays the
    // retry window, but the accepted value is cached per path so the
    // penalty is paid at most once per process
    val dir = "mockfs:" + tmpDir("cas-legacy-")
    val c = new FileCasCoordinator(conf(), dir)
    assert(c.swap("t", None, "m1"))
    val fs = new HPath(dir).getFileSystem(conf())
    val out = fs.create(new HPath(new HPath(dir, "t"), "commit-2"), false)
    try out.write("legacy-manifest".getBytes("UTF-8")) finally out.close()
    val reader = new FileCasCoordinator(conf(), dir)
    assert(reader.current("t") === Some("legacy-manifest")) // pays retry
    val t0 = System.nanoTime()
    assert(reader.current("t") === Some("legacy-manifest"))
    val secondMs = (System.nanoTime() - t0) / 1e6
    assert(secondMs < 400.0,
      s"second read took ${secondMs}ms — unframed-entry retry not cached")
  }

  test("readers grace an in-flight transaction before deciding the abort") {
    // a reservation whose record lands shortly after must COMMIT, not
    // be aborted by the first concurrent reader — the starvation fix
    val dir = tmpDir("cas-grace-")
    val c = new FileCasCoordinator(conf(), dir)
    assert(c.swap("x", None, "x1"))
    val fs = new HPath(dir).getFileSystem(conf())
    def frame(p: HPath, v: String): Unit = {
      val out = fs.create(p, false)
      try out.write((v + "\n#end").getBytes("UTF-8")) finally out.close()
    }
    frame(new HPath(new HPath(dir, "x"), "commit-2"), "tx:slow-tx")
    val writer = new Thread(() => {
      Thread.sleep(80) // inside the reader's grace window
      fs.mkdirs(new HPath(dir, "_tx"))
      // records self-terminate with `end` (NOT ledger-framed) and the
      // local scheme exposes them ATOMICALLY WITH CONTENT via link(2),
      // exactly as createExclusive does — a create-then-write here
      // would be a torn state production never produces locally
      val t = java.nio.file.Paths.get(dir, "_tx", "slow-tx")
      val tmp = t.resolveSibling(".tmp-grace")
      java.nio.file.Files.write(tmp, "commit\nx\tx9\nend".getBytes("UTF-8"))
      java.nio.file.Files.createLink(t, tmp)
      java.nio.file.Files.deleteIfExists(tmp)
      ()
    })
    writer.start()
    val reader = new FileCasCoordinator(conf(), dir)
    assert(reader.current("x") === Some("x9"),
      "reader aborted a transaction whose record landed within the grace")
    writer.join()
  }

  test("racing independent TableStore instances' multi-table transactions") {
    val root = "mockfs:" + tmpDir("cas-txstore-")
    fsProps.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v) }
    val casDir = tmpDir("cas-txptr-")
    def mkStore() = new TableStore(spark, root, fsProps,
      Some(new FileCasCoordinator(conf(), casDir)))
    val a = mkStore()
    val b = mkStore()
    val schema = (1L to 1L).map(i => (i, s"v$i")).toDF("id", "v").schema
    a.create("src", schema)
    a.create("dst", schema)
    // two independent processes move disjoint batches src→dst in
    // multi-table transactions; retries on conflict. Every batch must
    // land in BOTH tables or neither — across processes, through the
    // durable coordinator alone.
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def mover(st: TableStore, lo: Long, hi: Long) = new Thread(() => {
      try (lo to hi).foreach { i =>
        var done = false
        var tries = 0
        while (!done && tries < 30) {
          tries += 1
          try {
            st.transaction { tx =>
              tx.append("src", Seq((i, s"v$i")).toDF("id", "v"))
              tx.append("dst", Seq((i, s"v$i")).toDF("id", "v"))
            }
            done = true
          } catch { case _: graft.tables.CommitConflictException => () }
        }
        if (!done) sys.error(s"batch $i never committed after $tries tries")
      } catch { case e: Throwable => errs.add(e); () }
    })
    val t1 = mover(a, 1L, 8L)
    val t2 = mover(b, 101L, 108L)
    t1.start(); t2.start(); t1.join(); t2.join()
    if (!errs.isEmpty) throw errs.peek()
    val fresh = mkStore()
    val srcIds = fresh.read("src").select("id").collect().map(_.getLong(0)).sorted
    val dstIds = fresh.read("dst").select("id").collect().map(_.getLong(0)).sorted
    assert(srcIds.toSeq === ((1L to 8L) ++ (101L to 108L)))
    assert(dstIds.toSeq === srcIds.toSeq, "src and dst must advance in lockstep")
  }
}
