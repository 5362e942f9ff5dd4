package graft.tables

/** The commit-pointer authority: where a table's `_current` snapshot
  * pointer LIVES and how it is atomically advanced.
  *
  * [[TableStore]]'s default implementation keeps the pointer in a
  * `_current` file advanced by atomic rename — correct on `file:` and
  * HDFS, but S3A implements rename as copy+delete, leaving a small
  * non-atomic window (documented in TableStore's class doc). The
  * reference closes that window by fronting the pointer with a real
  * catalog (Iceberg REST catalog commit, reference
  * `SparkUtils.java:46-50` + `docker-compose.yaml:37-51`); this trait is
  * that catalog seam: deployments back it with any store offering
  * compare-and-swap (a database row, DynamoDB conditional put, a REST
  * catalog), and the rename caveat disappears.
  *
  * Contract:
  *   - `swap` must be ATOMIC compare-and-swap: advance the pointer to
  *     `next` iff it currently equals `expected` (`None` = table has no
  *     pointer yet), returning whether it won. Losing a swap must leave
  *     the pointer untouched — TableStore then deletes the just-written
  *     manifest files (never referenced by any pointer), so a failed CAS
  *     never half-commits.
  *   - `current` must never observe an intermediate state: it returns
  *     the last successfully swapped value.
  */
trait CommitCoordinator {

  /** Current manifest name of `table`, None if the table has never
    * committed (or was cleared). */
  def current(table: String): Option[String]

  /** Atomically: pointer(table) = next iff pointer(table) == expected.
    * Returns true iff this call performed the swap. */
  def swap(table: String, expected: Option[String], next: String): Boolean

  /** Forget the pointer (table drop / re-create). */
  def clear(table: String): Unit

  /** Multi-pointer commit — the catalog capability behind
    * [[TableStore.transaction]] (Iceberg's REST `CommitTransaction`
    * endpoint is the same contract: N tables advance together or not at
    * all, backed by whatever transactionality the catalog store has).
    *
    * Advance EVERY `(table, expected, next)` pointer, or none; returns
    * whether the whole set swapped. `swaps` must not repeat a table.
    *
    * This DEFAULT implementation is optimistic compose-from-CAS:
    * validate every pointer first (cheap rejection, no side effects),
    * then swap in order; if a later swap loses, already-advanced
    * pointers are compensated back via reverse CAS. The compensation
    * window is real — a coordinator backed by a transactional store
    * (one DB transaction, one conditional multi-key put) should
    * override this with a genuinely atomic version, as
    * [[InProcessCasCoordinator]] does. A compensation that itself loses
    * (a third writer advanced a half-committed pointer meanwhile)
    * throws rather than silently leaving a torn transaction;
    * [[TableStore.transaction]] narrows the window to near-zero by
    * holding every touched table's commit lock across this call. */
  def swapAll(swaps: Seq[(String, Option[String], String)]): Boolean = {
    require(swaps.map(_._1).distinct.size == swaps.size,
      "swapAll: duplicate table in transaction commit set")
    if (swaps.exists { case (t, e, _) => current(t) != e }) return false
    val done = scala.collection.mutable.ListBuffer[(String, Option[String], String)]()
    val won = swaps.forall { case s @ (t, e, n) =>
      val ok = swap(t, e, n)
      if (ok) done += s
      ok
    }
    if (!won) {
      val stuck = done.reverse.filterNot { case (t, e, n) =>
        e match {
          case Some(prev) => swap(t, Some(n), prev)
          case None => if (current(t).contains(n)) { clear(t); true } else false
        }
      }
      if (stuck.nonEmpty) throw new IllegalStateException(
        "transaction compensation failed — pointer(s) advanced by a " +
          s"third writer mid-rollback: ${stuck.map(_._1).mkString(", ")}; " +
          "back the coordinator with a transactional store for " +
          "cross-process transactions")
    }
    won
  }
}

/** In-process CAS coordinator: the pointer lives in a JVM-local
  * concurrent map with real compare-and-swap semantics — the reference
  * shape for catalog-backed deployments, and the implementation the
  * concurrency specs race against (no filesystem rename in the commit
  * path at all). Pointers do not survive the process; a durable
  * deployment backs the same trait with an external CAS store. */
final class InProcessCasCoordinator extends CommitCoordinator {
  private val ptrs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  override def current(table: String): Option[String] = Option(ptrs.get(table))

  override def swap(table: String, expected: Option[String],
      next: String): Boolean = expected match {
    case None    => ptrs.putIfAbsent(table, next) == null
    case Some(e) => ptrs.replace(table, e, next)
  }

  override def clear(table: String): Unit = { ptrs.remove(table); () }

  /** Transaction-vs-transaction atomicity via one lock (the stand-in
    * for the backing store's transaction): two swapAlls serialize, so
    * the compensation path in the default implementation never runs
    * between them. A SINGLE swap racing a swapAll stays lock-free and
    * resolves through the per-key CHM CAS — the swapAll loses cleanly
    * and compensates, all-or-nothing either way.
    * [[TableStore.transaction]] additionally holds every touched
    * table's commit lock, which serializes single-table committers
    * too (they hold the same lock across their swap). */
  override def swapAll(
      swaps: Seq[(String, Option[String], String)]): Boolean = synchronized {
    super.swapAll(swaps)
  }
}
