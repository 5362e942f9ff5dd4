package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.tables.{CommitCoordinator, CommitConflictException,
  InProcessCasCoordinator, TableStore}

/** Multi-table atomic transactions ([[TableStore.transaction]]): the
  * Iceberg REST `CommitTransaction` shape. Pinned here: all-or-nothing
  * visibility, read-your-writes chaining inside the body, write-set
  * conflict aborts with full staging reclaim, in-body creates publishing
  * atomically, refusal of unstageable DDL, and the coordinator-level
  * swapAll compensation contract. */
class TransactionSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def rows(st: TableStore, t: String): Seq[(Long, String)] =
    st.read(t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  private def dataFileCount(root: String, t: String): Int = {
    def rec(f: java.io.File): Int =
      if (f.isFile) (if (f.getName.endsWith(".parquet")) 1 else 0)
      else Option(f.listFiles()).map(_.map(rec).sum).getOrElse(0)
    rec(new java.io.File(s"$root/$t/data"))
  }

  private def manifestCount(root: String, t: String): Int =
    Option(new java.io.File(s"$root/$t").listFiles()).map(_.count(f =>
      f.getName.startsWith("manifest-") && f.getName.endsWith(".txt")))
      .getOrElse(0)

  test("transaction publishes every table atomically; read-your-writes inside") {
    val root = tmpDir("txn-")
    val st = new TableStore(spark, root)
    val outside = new TableStore(spark, root)
    st.create("facts", schema)
    st.create("rollup", schema)
    st.append("facts", Seq((1L, "a")).toDF("id", "v"))
    st.append("rollup", Seq((100L, "n=1")).toDF("id", "v"))

    st.transaction { tx =>
      tx.append("facts", Seq((2L, "b"), (3L, "c")).toDF("id", "v"))
      // derived table replaced IN the same transaction: delete + append
      // chain on the buffered head (read-your-writes)
      tx.delete("rollup", lit(true))
      tx.append("rollup", Seq((100L, "n=3")).toDF("id", "v"))
      assert(rows(tx, "facts").map(_._1) === Seq(1L, 2L, 3L))
      assert(rows(tx, "rollup") === Seq((100L, "n=3")))
      // nothing visible outside while the body runs
      assert(rows(outside, "facts") === Seq((1L, "a")))
      assert(rows(outside, "rollup") === Seq((100L, "n=1")))
    }
    assert(rows(outside, "facts").map(_._1) === Seq(1L, 2L, 3L))
    assert(rows(outside, "rollup") === Seq((100L, "n=3")))
  }

  test("outside commit to a touched table aborts the WHOLE transaction and reclaims staging") {
    val root = tmpDir("txn-")
    val st = new TableStore(spark, root)
    val outside = new TableStore(spark, root)
    st.create("a", schema)
    st.create("b", schema)
    st.append("a", Seq((1L, "a")).toDF("id", "v"))
    st.append("b", Seq((1L, "b")).toDF("id", "v"))
    val aFiles = dataFileCount(root, "a")
    val aManifests = manifestCount(root, "a")

    val e = intercept[CommitConflictException] {
      st.transaction { tx =>
        tx.append("a", Seq((2L, "a2")).toDF("id", "v"))
        tx.append("b", Seq((2L, "b2")).toDF("id", "v"))
        // a competing writer lands on b between prepare and publish
        outside.append("b", Seq((9L, "race")).toDF("id", "v"))
      }
    }
    assert(e.getMessage.contains("transaction"))
    // neither staged commit published — a untouched, b has ONLY the racer
    assert(rows(outside, "a") === Seq((1L, "a")))
    assert(rows(outside, "b") === Seq((1L, "b"), (9L, "race")))
    // staging reclaimed: no orphan data files or phantom manifests on a
    assert(dataFileCount(root, "a") === aFiles)
    assert(manifestCount(root, "a") === aManifests)
  }

  test("body exception aborts with no trace") {
    val root = tmpDir("txn-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    val files = dataFileCount(root, "t")
    val manifests = manifestCount(root, "t")
    intercept[IllegalStateException] {
      st.transaction { tx =>
        tx.append("t", Seq((2L, "b")).toDF("id", "v"))
        throw new IllegalStateException("boom")
      }
    }
    assert(rows(st, "t") === Seq((1L, "a")))
    assert(dataFileCount(root, "t") === files)
    assert(manifestCount(root, "t") === manifests)
  }

  test("a table created inside the transaction becomes visible atomically") {
    val root = tmpDir("txn-")
    val st = new TableStore(spark, root)
    val outside = new TableStore(spark, root)
    st.create("base", schema)
    st.append("base", Seq((1L, "a")).toDF("id", "v"))
    st.transaction { tx =>
      tx.create("derived", schema)
      tx.append("derived", Seq((10L, "d")).toDF("id", "v"))
      assert(!outside.exists("derived"))
    }
    assert(outside.exists("derived"))
    assert(rows(outside, "derived") === Seq((10L, "d")))
  }

  test("an aborted transaction's created table leaves no directory behind") {
    val root = tmpDir("txn-")
    val st = new TableStore(spark, root)
    intercept[IllegalStateException] {
      st.transaction { tx =>
        tx.create("derived", schema)
        tx.append("derived", Seq((10L, "d")).toDF("id", "v"))
        throw new IllegalStateException("boom")
      }
    }
    assert(!st.exists("derived"))
    // the eagerly-written directory metadata must be gone too —
    // otherwise a later create fails "already exists" on a table
    // nobody can see
    assert(!new java.io.File(s"$root/derived").exists())
    st.create("derived", schema) // fresh create succeeds
    st.append("derived", Seq((1L, "x")).toDF("id", "v"))
    assert(rows(st, "derived") === Seq((1L, "x")))
  }

  test("drop / overwrite-create / rename refused inside a transaction") {
    val root = tmpDir("txn-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    intercept[UnsupportedOperationException] {
      st.transaction(tx => tx.drop("t"))
    }
    intercept[UnsupportedOperationException] {
      st.transaction(tx => tx.create("t", schema, overwrite = true))
    }
    intercept[UnsupportedOperationException] {
      st.transaction(tx => tx.renameTable("t", "t2"))
    }
    // nothing happened
    assert(rows(st, "t") === Seq((1L, "a")))
    assert(st.exists("t") && !st.exists("t2"))
  }

  test("racing transactions on overlapping tables: first publisher wins, loser aborts clean") {
    val root = tmpDir("txn-")
    val coordinator = new InProcessCasCoordinator
    val st1 = new TableStore(spark, root, coordinator = Some(coordinator))
    val st2 = new TableStore(spark, root, coordinator = Some(coordinator))
    st1.create("x", schema)
    st1.create("y", schema)
    st1.append("x", Seq((1L, "x")).toDF("id", "v"))
    st1.append("y", Seq((1L, "y")).toDF("id", "v"))
    intercept[CommitConflictException] {
      st1.transaction { tx =>
        tx.append("x", Seq((2L, "tx1")).toDF("id", "v"))
        tx.append("y", Seq((2L, "tx1")).toDF("id", "v"))
        // a second transaction prepares AND publishes while tx1 is open
        st2.transaction { tx2 =>
          tx2.append("y", Seq((3L, "tx2")).toDF("id", "v"))
        }
      }
    }
    // tx2's effect is the only one visible, on every touched table
    assert(rows(st1, "x") === Seq((1L, "x")))
    assert(rows(st1, "y").map(_._1) === Seq(1L, 3L))
  }

  test("default swapAll compensates already-advanced pointers when a later CAS loses") {
    // a coordinator using ONLY the trait's default swapAll, with one
    // injected mid-set failure: pointer "a" must be rolled back
    class FlakyCoordinator extends CommitCoordinator {
      val ptrs = scala.collection.mutable.Map[String, String]()
      var failNextOn: Option[String] = None
      override def current(t: String): Option[String] = ptrs.get(t)
      override def swap(t: String, expected: Option[String],
          next: String): Boolean = {
        if (failNextOn.contains(t)) { failNextOn = None; return false }
        if (current(t) != expected) false else { ptrs(t) = next; true }
      }
      override def clear(t: String): Unit = { ptrs.remove(t); () }
    }
    val c = new FlakyCoordinator
    assert(c.swap("a", None, "a-v1"))
    assert(c.swap("b", None, "b-v1"))
    c.failNextOn = Some("b")
    val won = c.swapAll(Seq(
      ("a", Some("a-v1"), "a-v2"), ("b", Some("b-v1"), "b-v2")))
    assert(!won)
    assert(c.current("a") === Some("a-v1")) // compensated back
    assert(c.current("b") === Some("b-v1")) // never advanced
    // and a clean set still works end-to-end
    assert(c.swapAll(Seq(
      ("a", Some("a-v1"), "a-v2"), ("b", Some("b-v1"), "b-v2"))))
    assert(c.current("a") === Some("a-v2"))
    assert(c.current("b") === Some("b-v2"))
  }

  test("contended transactions with retry: no lost updates, tables stay consistent") {
    val root = tmpDir("txn-")
    val coordinator = new InProcessCasCoordinator
    val seed = new TableStore(spark, root, coordinator = Some(coordinator))
    seed.create("facts", schema)
    seed.create("tally", schema)
    val threads = 4
    val perThread = 5
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val retries = new java.util.concurrent.atomic.AtomicInteger(0)
    val futures = (0 until threads).map { t =>
      scala.concurrent.Future {
        val st = new TableStore(spark, root, coordinator = Some(coordinator))
        (0 until perThread).foreach { i =>
          val id = (t * 100 + i).toLong
          var done = false
          while (!done) {
            try {
              // every transaction must land on BOTH tables or neither —
              // under contention a lost update would skew the counts
              st.transaction { tx =>
                tx.append("facts", Seq((id, s"t$t-$i")).toDF("id", "v"))
                tx.append("tally", Seq((id, "+1")).toDF("id", "v"))
              }
              done = true
            } catch {
              case _: CommitConflictException => retries.incrementAndGet(); ()
            }
          }
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(300, "seconds"))
    pool.shutdown()
    val total = threads * perThread
    assert(seed.read("facts").count() === total)
    assert(seed.read("tally").count() === total)
    // every id that made it into facts made it into tally (atomicity
    // under contention, not just totals)
    assert(seed.read("facts").select("id")
      .except(seed.read("tally").select("id")).count() === 0)
    info(s"${retries.get()} optimistic retries across $total transactions")
  }

  test("nested transaction folds into the enclosing one") {
    val root = tmpDir("txn-")
    val st = new TableStore(spark, root)
    val outside = new TableStore(spark, root)
    st.create("t", schema)
    st.transaction { tx =>
      tx.append("t", Seq((1L, "a")).toDF("id", "v"))
      tx.transaction { inner =>
        inner.append("t", Seq((2L, "b")).toDF("id", "v"))
      }
      // the nested call published NOTHING — one atomic publish at the end
      assert(rows(outside, "t") === Nil)
    }
    assert(rows(outside, "t") === Seq((1L, "a"), (2L, "b")))
  }

  test("readConsistent: no reader observes a half-visible transaction; frames stay pinned") {
    val root = tmpDir("txn-rc-")
    val st = new TableStore(spark, root)
    st.create("rc_facts", schema)
    st.create("rc_tally", schema)
    st.transaction { tx =>
      tx.append("rc_facts", Seq((0L, "seed")).toDF("id", "v"))
      tx.append("rc_tally", Seq((0L, "seed")).toDF("id", "v"))
    }
    // pinned-ness first (deterministic): a consistent read taken NOW
    // must keep serving the same snapshot after later commits land
    val pinned = st.readConsistent(Seq("rc_facts", "rc_tally"))
    assert(pinned("rc_facts").count() === 1L)
    st.transaction { tx =>
      tx.append("rc_facts", Seq((1L, "later")).toDF("id", "v"))
      tx.append("rc_tally", Seq((1L, "later")).toDF("id", "v"))
    }
    assert(pinned("rc_facts").count() === 1L,
      "a consistent read is PINNED — later commits must not leak in")
    assert(st.read("rc_facts").count() === 2L)
    // concurrency: a writer keeps the invariant count(facts)==count(tally)
    // transactionally; every consistent read must observe it — a plain
    // read pair racing the publish window could not promise this
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val writer = new Thread(() => {
      var i = 2L
      try while (!stop.get() && i < 60L) {
        st.transaction { tx =>
          tx.append("rc_facts", Seq((i, "w")).toDF("id", "v"))
          tx.append("rc_tally", Seq((i, "w")).toDF("id", "v"))
        }
        i += 1
      } catch { case e: Throwable => writerErr.set(e) }
    })
    writer.start()
    try {
      (1 to 25).foreach { _ =>
        val fs = st.readConsistent(Seq("rc_facts", "rc_tally"))
        val (nf, nt) = (fs("rc_facts").count(), fs("rc_tally").count())
        assert(nf === nt,
          s"half-visible transaction observed: facts=$nf tally=$nt")
      }
    } finally { stop.set(true); writer.join() }
    assert(writerErr.get() === null,
      s"writer failed: ${writerErr.get()}")
    // exhausted validation fails loud, not silently skewed
    val e = intercept[IllegalStateException](
      st.readConsistent(Seq("rc_facts", "rc_tally"), maxAttempts = 0))
    assert(e.getMessage.contains("readConsistent"))
  }
}
