package graft.tables

/** Per-executor cache of deserialized mask state (SPJ delete masks,
  * DV probe bitmaps), bounded by ESTIMATED BYTES — not entry count —
  * because one entry can hold the in-memory expansion of up to
  * `SpjMaskMaxBytes` of sidecar data: 32 such entries is multiple GB
  * of pinned executor memory, while 32 small ones is nothing. LRU on
  * access order; the entry just used is never evicted (a cache smaller
  * than one mask degrades to per-call builds, not failure).
  *
  * Single-flight: a concurrent miss on the same key builds ONCE (the
  * holder's `lazy val` monitor), and the global lock is never held
  * during build IO. A holder evicted while still building finishes and
  * hands its value to the builder's caller but is not re-inserted —
  * boundedness wins over hit rate under eviction races. */
private[tables] final class BoundedLoadingCache(
    maxBytes: Long, maxEntries: Int) {

  private final class Holder(build: () => AnyRef, sizeOf: AnyRef => Long) {
    lazy val value: AnyRef = build()
    lazy val bytes: Long = math.max(0L, sizeOf(value))
    var accounted = false // guarded by `cache`'s monitor
  }

  private var total = 0L
  private val cache =
    new java.util.LinkedHashMap[AnyRef, Holder](16, 0.75f, true)

  def getOrBuild[T <: AnyRef](key: AnyRef)(build: => T)(
      sizeOf: T => Long): T = {
    val h = cache.synchronized {
      var v = cache.get(key)
      if (v == null) {
        v = new Holder(() => build, x => sizeOf(x.asInstanceOf[T]))
        cache.put(key, v)
      }
      v
    }
    val result = h.value // build + size estimate OUTSIDE the global lock
    val b = h.bytes
    cache.synchronized {
      // account once, and only if this holder is still the mapped one
      // (it may have been evicted mid-build, or superseded after reset)
      if (!h.accounted && (cache.get(key) eq h)) {
        h.accounted = true
        total += b
        val it = cache.entrySet().iterator()
        while ((total > maxBytes || cache.size() > maxEntries) &&
            it.hasNext) {
          val e = it.next()
          if (e.getValue ne h) {
            if (e.getValue.accounted) total -= e.getValue.bytes
            it.remove()
          }
        }
      }
    }
    result.asInstanceOf[T]
  }

  /** Test hooks. */
  private[tables] def reset(): Unit = cache.synchronized {
    cache.clear(); total = 0L
  }
  private[tables] def size: Int = cache.synchronized(cache.size())
  private[tables] def accountedBytes: Long = cache.synchronized(total)
  private[tables] def contains(key: AnyRef): Boolean =
    cache.synchronized(cache.containsKey(key))
}
