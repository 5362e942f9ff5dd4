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
}
