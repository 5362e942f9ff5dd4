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
}
