package graft.tables

/** Coordinator overlay backing ONE open [[TableStore.transaction]].
  *
  * Every snapshot commit inside the transaction runs its normal prepare
  * (data files staged and promoted, manifest family written, conflict
  * checks against the head) but its pointer swap lands HERE instead of
  * the real coordinator: buffered in `pending`, keyed by pointer key
  * (`table` or `table@branch`). `current` overlays the buffer over the
  * inner coordinator, so within the transaction later operations chain
  * on earlier ones (read-your-writes) while every outside reader still
  * resolves the untouched inner pointers — nothing is visible until
  * [[commit]] publishes the whole buffer through
  * [[CommitCoordinator.swapAll]], atomically.
  *
  * Isolation: the first buffered swap of a key records the INNER head
  * observed at that moment as the transaction's expected value; commit
  * CAS-validates it, so any outside commit to a touched table between
  * prepare and publish fails the WHOLE transaction (clean abort, staged
  * manifests and files reclaimed via the registered abort actions).
  * Untouched tables are unconstrained — the transaction conflicts on
  * what it wrote, not on what it read (write-set snapshot isolation,
  * the same guarantee a single-table optimistic commit gives).
  *
  * Out of scope by construction: DROP / overwrite-create / rename of a
  * table that already has a committed pointer (`clear` refuses) —
  * those are destructive directory operations that cannot be staged.
  * Creating a NEW table inside a transaction works: its directory
  * metadata is written eagerly but the table does not `exists()` for
  * anyone else until the buffered None→v1 swap publishes.
  */
private[tables] final class TxOverlayCoordinator(
    private[tables] val inner: CommitCoordinator) extends CommitCoordinator {

  // pointer key -> (inner expected at first buffered swap, pending next)
  private val pending =
    scala.collection.mutable.LinkedHashMap[String, (Option[String], String)]()
  private val abortActions = scala.collection.mutable.ListBuffer[() => Unit]()
  private var closed = false

  private def open(): Unit =
    if (closed) throw new IllegalStateException(
      "transaction already committed or aborted")

  override def current(table: String): Option[String] = synchronized {
    pending.get(table).map(t => Some(t._2)).getOrElse(inner.current(table))
  }

  override def swap(table: String, expected: Option[String],
      next: String): Boolean = synchronized {
    open()
    pending.get(table) match {
      case Some((e0, cur)) =>
        if (!expected.contains(cur)) false
        else { pending.update(table, (e0, next)); true }
      case None =>
        val cur = inner.current(table)
        if (cur != expected) false
        else { pending.update(table, (cur, next)); true }
    }
  }

  override def clear(table: String): Unit = synchronized {
    open()
    // harmless for a pointer that never existed (create() of a fresh
    // table clears defensively before its first commit); destructive
    // for anything committed or already staged in this transaction
    if (current(table).isDefined) throw new UnsupportedOperationException(
      s"clear($table) inside a transaction: DROP / overwrite-create / " +
        "rename cannot be staged — run them outside the transaction")
  }

  /** Register cleanup for one prepared-but-unpublished commit (delete
    * its manifest family and staged data files); runs on abort, in
    * reverse registration order. */
  def onAbort(action: () => Unit): Unit = synchronized {
    open(); abortActions += action; ()
  }

  /** Pointer keys this transaction has staged commits for. */
  def touchedKeys: Seq[String] = synchronized { pending.keys.toSeq }

  /** Publish every buffered swap atomically; false = lost a pointer
    * race (caller aborts). Leaves the overlay OPEN on failure so
    * [[abort]] can still run the cleanup actions. */
  def commitAll(): Boolean = synchronized {
    open()
    val ok = pending.isEmpty ||
      inner.swapAll(pending.toSeq.map { case (k, (e, n)) => (k, e, n) })
    if (ok) closed = true
    ok
  }

  /** Run the registered cleanups and close; idempotent, exceptions from
    * individual cleanups are swallowed (they delete never-referenced
    * staging — removeOrphans collects anything a cleanup missed). */
  def abort(): Unit = synchronized {
    if (!closed) {
      closed = true
      abortActions.reverseIterator.foreach { a =>
        try a() catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }
}
