package graft.tables

import org.scalatest.funsuite.AnyFunSuite

/** The per-executor mask caches must be bounded by ESTIMATED BYTES —
  * one SPJ mask entry can expand 256 MB of sidecar, and every masked V1
  * read creates a fresh DV broadcast, so an unbounded (or entry-count-
  * only) cache is a slow per-executor memory leak across queries. */
class BoundedLoadingCacheSpec extends AnyFunSuite {

  test("byte bound evicts eldest, never the entry just used") {
    val c = new BoundedLoadingCache(maxBytes = 100L, maxEntries = 1000)
    c.getOrBuild("a")("x" * 10)(_ => 40L)
    c.getOrBuild("b")("y" * 10)(_ => 40L)
    assert(c.size === 2 && c.accountedBytes === 80L)
    // third entry pushes past 100 bytes → "a" (eldest) evicted
    c.getOrBuild("c")("z" * 10)(_ => 40L)
    assert(!c.contains("a") && c.contains("b") && c.contains("c"))
    assert(c.accountedBytes === 80L)
    // an entry LARGER than the whole budget still caches (evicting the
    // rest) — a cache smaller than one mask degrades, never fails
    c.getOrBuild("big")("w")(_ => 500L)
    assert(c.contains("big") && c.size === 1 && c.accountedBytes === 500L)
    // and is immediately replaceable by the next large entry
    c.getOrBuild("big2")("v")(_ => 500L)
    assert(!c.contains("big") && c.contains("big2"))
  }

  test("LRU: access refreshes recency") {
    val c = new BoundedLoadingCache(maxBytes = 100L, maxEntries = 1000)
    c.getOrBuild("a")("x")(_ => 40L)
    c.getOrBuild("b")("y")(_ => 40L)
    c.getOrBuild("a")(fail("must hit, not rebuild"))(_ => 40L)
    c.getOrBuild("c")("z")(_ => 40L) // evicts b (a was touched)
    assert(c.contains("a") && !c.contains("b") && c.contains("c"))
  }

  test("entry bound holds independently of bytes") {
    val c = new BoundedLoadingCache(maxBytes = Long.MaxValue, maxEntries = 3)
    (1 to 10).foreach(i => c.getOrBuild(Integer.valueOf(i))("v")(_ => 1L))
    assert(c.size === 3)
    assert(c.accountedBytes === 3L)
  }

  test("single-flight: concurrent misses on one key build once") {
    val c = new BoundedLoadingCache(maxBytes = 1L << 20, maxEntries = 8)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        val v = c.getOrBuild("k") {
          builds.incrementAndGet(); Thread.sleep(20); "built"
        }(_ => 10L)
        assert(v === "built")
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(builds.get() === 1)
    assert(c.accountedBytes === 10L)
  }

  test("eviction mid-build stays bounded (no double accounting)") {
    val c = new BoundedLoadingCache(maxBytes = 50L, maxEntries = 2)
    (1 to 20).foreach(i => c.getOrBuild(Integer.valueOf(i))("v")(_ => 30L))
    assert(c.size <= 2 && c.accountedBytes <= 60L)
    c.reset()
    assert(c.size === 0 && c.accountedBytes === 0L)
  }
}
