package graft.tables

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Durable CROSS-PROCESS [[CommitCoordinator]] built on nothing but
  * CREATE-EXCLUSIVE file semantics — no atomic rename anywhere in the
  * commit path, so it is correct on stores where the default
  * rename-based pointer is not (S3-style object stores offer
  * conditional create / if-none-match PUT; HDFS and POSIX have O_EXCL).
  * This is the zero-dependency stand-in for the catalog the reference
  * fronts its tables with (Iceberg REST catalog commit,
  * `SparkUtils.java:46-50`): any number of INDEPENDENT TableStore
  * processes sharing one coordinator directory get linearizable pointer
  * history.
  *
  * Layout: `<dir>/<key>/commit-<N>` — an append-only ledger, one file
  * per successful swap, each holding the manifest name (empty =
  * cleared). The pointer's value is the HIGHEST-numbered entry.
  *
  * CAS protocol: read the head `(n, value)`; if `value != expected`,
  * lose. Otherwise attempt create-exclusive of `commit-<n+1>` — of two
  * racers exactly one create succeeds, and the loser's TableStore
  * deletes its unreferenced manifest family and rebases, the same
  * optimistic loop a real catalog drives. Entries are never rewritten
  * or renamed; old entries are pruned only once they are
  * [[FileCasCoordinator.Keep]] generations behind the head (a reader
  * listing concurrently still resolves the head correctly because the
  * head entry is never deleted).
  *
  * == Atomic multi-pointer commit ==
  *
  * [[swapAll]] here is GENUINELY atomic — it does not use the
  * compensate-on-loss default. The protocol is consensus by
  * create-exclusive, in three steps:
  *
  *  1. RESERVE: for each table (in sorted order) CAS a ledger entry
  *     whose value is the marker `tx:<txid>` instead of a manifest
  *     name. A lost reservation aborts the whole transaction.
  *  2. DECIDE: create-exclusive the transaction record
  *     `<dir>/_tx/<txid>` holding `commit` plus the table→manifest
  *     mapping. Creating this ONE file is the linearization point: the
  *     transaction is committed iff the record exists and says commit.
  *  3. REPAIR (best-effort): re-assert each table's head as a normal
  *     entry so later readers stop resolving through the record.
  *
  * A reader that finds a `tx:` marker at a head resolves it through
  * the record; if the record does not exist yet, the reader DECIDES
  * THE ABORT by create-exclusive-writing `abort` into it — of the
  * committer's `commit` and any reader's `abort` exactly one create
  * wins, so every observer agrees forever. A reader waits a short
  * grace period before deciding the abort (a live committer lands its
  * record within ms of the last reservation), and a committer whose
  * DECIDE loses that race retries the whole transaction a bounded
  * number of times — concurrent read load cannot starve multi-table
  * commits, while sustained contention still surfaces as an ordinary
  * CAS failure for the caller to rebase. An
  * aborted marker resolves to the PREVIOUS entry's value, so aborted
  * reservations leave no torn state — they only consume a generation
  * number. A crash at ANY point leaves either no record (aborted by
  * the next observer) or a commit record (every pointer advances) —
  * never a partial advance. Decided records are immutable and cached;
  * they are tiny and kept (crash-window evidence), while marker
  * entries age out of the ledger under the normal Keep window once
  * repaired/superseded. */
final class FileCasCoordinator(conf: Configuration, dir: String)
  extends CommitCoordinator {

  import FileCasCoordinator.{Keep, TxDirName, TxPrefix}

  private val base = new HPath(dir)
  private val fs: FileSystem = base.getFileSystem(conf)

  /** Decided transaction outcomes are immutable: cache them so steady-
    * state reads of a repaired-but-still-marker head cost no FS reads. */
  private val txCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Map[String, String]]]()

  /** Ledger entries are immutable once complete, so an accepted value is
    * cached per path: repeat head() walks cost no FS reads, and — the
    * case that motivated the cache — a legacy (pre-framing) entry on a
    * non-local scheme pays its cannot-tell-from-in-flight retry window
    * at most once per process instead of on every read. Bounded because
    * pruning retires old paths while the cache would not. */
  private val ledgerCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val LedgerCacheMax = 4096

  private def keyDir(table: String): HPath = {
    require(table != TxDirName,
      s"table key $table collides with the transaction-record directory")
    // table keys are fs-safe names ('@' joins branch refs)
    new HPath(base, table.replace("@", "__at__"))
  }

  private def txPath(id: String): HPath =
    new HPath(new HPath(base, TxDirName), id)

  private def entries(table: String): Seq[(Long, HPath)] = {
    val d = keyDir(table)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("commit-"))
      .flatMap(p => p.getName.stripPrefix("commit-").toLongOption.map(_ -> p))
      .sortBy(_._1)
  }

  private def readEntry(p: HPath): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
  }

  /** Ledger entries are FRAMED (`<value>\n#end`) so create-then-write
    * schemes cannot serve a truncated value as the pointer: a reader
    * observing an unframed entry on a non-local scheme retries (a live
    * writer closes in ms) and then accepts it as a legacy/crashed
    * write — a crashed writer's partial value becomes a loudly-invalid
    * head rather than silently resolving to "cleared" and letting a
    * racer clobber the generation. The local scheme writes entries
    * atomically with content (link(2)), so unframed = legacy =
    * complete there. */
  private def writeLedger(target: HPath, value: String): Boolean =
    createExclusive(target, value + "\n#end")

  private def readLedgerValue(p: HPath): String = {
    val cached = ledgerCache.get(p.toString)
    if (cached != null) return cached
    def parse(raw: String): Option[String] =
      if (raw.endsWith("#end"))
        Some(raw.stripSuffix("#end").trim)
      else if (fs.getScheme == "file") Some(raw)
      else None
    var raw = readEntry(p)
    var waits = 0
    while (parse(raw).isEmpty && waits < 50) {
      Thread.sleep(10); waits += 1; raw = readEntry(p)
    }
    var cacheable = true
    val value = parse(raw).getOrElse {
      // Unframed after the retry window on a non-local scheme. An EMPTY
      // partial is the dangerous case: a writer that crashed between
      // create and write would resolve as "cleared", letting a racing
      // writer CAS from expected=None and silently discard the prior
      // pointer — refuse to guess, exactly as txOutcome does for an
      // incomplete record. A NON-empty unframed entry is accepted as a
      // legacy (pre-framing) complete write — but only CACHED after a
      // stability probe: caching a still-growing slow write would pin
      // the torn prefix for the process lifetime, turning a transient
      // race into a persistent wrong pointer (a torn value fails loud
      // downstream either way; the probe keeps it healable).
      if (raw.isEmpty) sys.error(
        s"ledger entry $p is empty and unframed after the retry " +
          "window (writer crashed between create and write?) — " +
          "refusing to resolve it as a cleared pointer")
      Thread.sleep(200)
      val again = readEntry(p)
      if (again == raw) raw
      else parse(again).getOrElse {
        // changed and STILL unframed: a live slow writer — accept the
        // newest content for this read but do not cache it
        cacheable = false
        if (again.isEmpty) sys.error(
          s"ledger entry $p is empty and unframed after the retry " +
            "window — refusing to resolve it as a cleared pointer")
        again
      }
    }
    if (cacheable) {
      if (ledgerCache.size >= LedgerCacheMax) ledgerCache.clear()
      ledgerCache.putIfAbsent(p.toString, value)
      ()
    }
    value
  }

  /** Create-exclusive write — the one primitive everything here is
    * built on. Returns whether THIS call created the file.
    *
    * On the local scheme the file appears ATOMICALLY WITH ITS FULL
    * CONTENT: the value is written to a hidden temp file first and
    * exposed by `link(2)` (create-exclusive with content) — a plain
    * O_EXCL create-then-write would let a concurrent reader observe a
    * created-but-empty entry and, for a transaction record, misread a
    * committed transaction as aborted. Non-local schemes keep the
    * FS's own create-exclusive (atomic creation on HDFS; conditional
    * PUT — content-atomic by nature — is the documented backing for
    * S3-style stores); [[txOutcome]] additionally refuses to decide
    * from empty content there. */
  private def createExclusive(target: HPath, value: String): Boolean =
    try {
      if (fs.getScheme == "file") {
        val t = java.nio.file.Paths.get(target.toUri.getPath)
        val tmp = t.resolveSibling(
          s".tmp-${java.util.UUID.randomUUID()}")
        java.nio.file.Files.write(tmp, value.getBytes("UTF-8"))
        try { java.nio.file.Files.createLink(t, tmp); true }
        finally { java.nio.file.Files.deleteIfExists(tmp); () }
      } else {
        val out = fs.create(target, false)
        try out.write(value.getBytes("UTF-8")) finally out.close()
        true
      }
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException if fs.exists(target) => false
    }

  /** Outcome of transaction `id`: Some(table→manifest) = committed,
    * None = aborted. An absent record is UNDECIDED — this call decides
    * the abort (create-exclusive `abort`); if the committer's `commit`
    * wins that race instead, the re-read observes it. Either way the
    * outcome is decided exactly once and never changes. */
  private def txOutcome(id: String): Option[Map[String, String]] = {
    val cached = txCache.get(id)
    if (cached != null) return cached
    val p = txPath(id)
    var content =
      if (fs.exists(p)) readEntry(p)
      else {
        // Grace before turning reader into abort-decider: a live
        // committer writes its record within ms of the last
        // reservation, so waiting briefly lets in-flight swapAlls land
        // instead of being starved by concurrent read load. Only after
        // the record stays absent do we decide the abort.
        var g = 0
        while (!fs.exists(p) && g < 20) { Thread.sleep(10); g += 1 }
        if (fs.exists(p)) readEntry(p)
        else {
          fs.mkdirs(new HPath(base, TxDirName))
          createExclusive(p, "abort")
          readEntry(p) // ours or the committer's — decided either way
        }
      }
    // non-local schemes create-then-write, so a record can be visible
    // before (all of) its bytes: NEVER decide (let alone cache) an
    // outcome from content that is not a COMPLETE record — a commit
    // record ends with its `end` terminator line, an abort record is
    // exactly "abort"; anything else is an in-flight write. Retry
    // briefly (a live writer closes in ms), then fail LOUD. Deciding
    // from a truncated read ("" or a commit prefix) would flip or
    // corrupt a committed transaction's outcome for this process
    // forever.
    def complete(c: String): Boolean =
      c == "abort" ||
        (c.startsWith("commit") && c.linesIterator.toSeq.lastOption
          .contains("end"))
    var waits = 0
    while (!complete(content) && waits < 50) {
      Thread.sleep(10); waits += 1; content = readEntry(p)
    }
    if (!complete(content)) sys.error(
      s"transaction record $p exists without a complete decision " +
        "(writer crashed between create and write?) — refusing to " +
        "guess the outcome")
    val out =
      if (content == "abort") None
      else Some(content.linesIterator.drop(1).takeWhile(_ != "end")
        .flatMap { l =>
          l.split('\t') match {
            case Array(t, m) => Some(t -> m)
            case _ => None
          }
        }.toMap)
    txCache.putIfAbsent(id, out)
    out
  }

  /** Head of the ledger with transaction markers RESOLVED:
    * (next-free generation - 1 i.e. the raw max generation, value).
    * Walks back through aborted markers to the newest real value; a
    * committed marker resolves through its record's mapping. Walking
    * past the oldest retained entry (> Keep consecutive crashed
    * transactions — see prune) fails loudly rather than resurrecting
    * an older generation as the head. */
  private def head(table: String): (Long, Option[String]) = {
    val es = entries(table)
    if (es.isEmpty) return (0L, None)
    val rawGen = es.last._1
    var i = es.size - 1
    while (i >= 0) {
      val v = readLedgerValue(es(i)._2)
      if (v.startsWith(TxPrefix)) {
        txOutcome(v.stripPrefix(TxPrefix)) match {
          case Some(mapping) =>
            val m = mapping.getOrElse(table, sys.error(
              s"transaction record for $table names no manifest — " +
                "corrupt commit record"))
            return (rawGen, Some(m))
          case None => i -= 1 // aborted reservation: look further back
        }
      } else {
        return (rawGen, if (v.isEmpty) None else Some(v))
      }
    }
    // every retained entry is an aborted marker; the real value was
    // pruned away — refuse to guess
    if (es.head._1 > 1L) sys.error(
      s"commit ledger for $table holds only aborted transaction " +
        "markers in its retained window — cannot resolve the pointer")
    (rawGen, None)
  }

  override def current(table: String): Option[String] = head(table)._2

  override def swap(table: String, expected: Option[String],
      next: String): Boolean = casWrite(table, expected, next)

  override def clear(table: String): Unit = {
    // a tombstone entry, not a delete: deleting files would let an
    // older generation resurface as the head
    val (_, cur) = head(table)
    if (cur.isDefined) { casWrite(table, cur, ""); () }
  }

  private def casWrite(table: String, expected: Option[String],
      value: String): Boolean = {
    val (n, cur) = head(table)
    if (cur != expected) return false
    val d = keyDir(table)
    if (n == 0L) fs.mkdirs(d)
    val won = writeLedger(new HPath(d, s"commit-${n + 1}"), value)
    if (won) prune(table, n + 1)
    won
  }

  /** Atomic multi-pointer commit (see class doc): reservations + ONE
    * decided-by-create-exclusive transaction record, replacing the
    * compensate-on-loss default — there is no window in which a crash
    * or a racing observer can see some pointers advanced and others
    * not. */
  override def swapAll(swaps: Seq[(String, Option[String], String)]): Boolean = {
    require(swaps.map(_._1).distinct.size == swaps.size,
      "swapAll: duplicate table in transaction commit set")
    swaps match {
      case Seq() => return true
      case Seq((t, e, n)) => return swap(t, e, n) // no record needed
      case _ => ()
    }
    // A lost DECIDE race (a reader aborted our in-flight reservations
    // before the record landed) is retryable: the aborted markers walk
    // back to the expected heads, so the same expecteds can still win.
    // Bounded so sustained contention surfaces as a normal CAS failure
    // (caller rebases) instead of an unbounded spin.
    var attempt = 0
    var decided = attemptSwapAll(swaps)
    while (decided.isEmpty && attempt < 3) {
      attempt += 1; decided = attemptSwapAll(swaps)
    }
    decided.getOrElse(false)
  }

  /** One transaction attempt. Some(result) = decided (committed or a
    * genuine CAS loss); None = our DECIDE lost to a reader's abort —
    * the one retryable outcome. */
  private def attemptSwapAll(
      swaps: Seq[(String, Option[String], String)]): Option[Boolean] = {
    val txid = java.util.UUID.randomUUID().toString
    val reserved = scala.collection.mutable.ListBuffer[(String, Long)]()
    val ok = swaps.sortBy(_._1).forall { case (t, e, _) =>
      val (n, cur) = head(t)
      cur == e && {
        val d = keyDir(t)
        if (n == 0L) fs.mkdirs(d)
        val won = writeLedger(new HPath(d, s"commit-${n + 1}"),
          TxPrefix + txid)
        if (won) reserved += ((t, n + 1))
        won
      }
    }
    if (!ok) {
      // decide the abort ourselves so our dangling reservations resolve
      // immediately instead of waiting for the next reader
      fs.mkdirs(new HPath(base, TxDirName))
      createExclusive(txPath(txid), "abort")
      txCache.putIfAbsent(txid, None)
      return Some(false)
    }
    // `end` terminator = the completeness witness txOutcome requires
    // before trusting a commit record on create-then-write schemes
    val content = "commit\n" +
      swaps.map { case (t, _, n) => s"$t\t$n" }.mkString("\n") + "\nend"
    fs.mkdirs(new HPath(base, TxDirName))
    val committed = createExclusive(txPath(txid), content)
    if (!committed) return None // a racing observer decided the abort
    txCache.putIfAbsent(txid,
      Some(swaps.map { case (t, _, n) => t -> n }.toMap))
    // best-effort repair: a normal head entry per table, so future
    // reads resolve without touching the record; losing the create to
    // a writer that already advanced past us is fine
    reserved.foreach { case (t, gen) =>
      swaps.find(_._1 == t).foreach { case (_, _, n) =>
        writeLedger(new HPath(keyDir(t), s"commit-${gen + 1}"), n)
        prune(t, gen + 1)
      }
    }
    Some(true)
  }

  /** Best-effort ledger pruning: entries more than [[FileCasCoordinator.Keep]]
    * generations behind the just-written head are dead (the head is the
    * max, and it is never deleted). */
  private def prune(table: String, headN: Long): Unit =
    try entries(table).foreach { case (n, p) =>
      if (n < headN - FileCasCoordinator.Keep) { fs.delete(p, false); () }
    } catch { case scala.util.control.NonFatal(_) => () }
}

object FileCasCoordinator {
  /** Ledger generations retained behind the head. */
  val Keep: Long = 16L
  /** Ledger-entry marker prefix naming an in-flight transaction. */
  private[tables] val TxPrefix = "tx:"
  /** Directory of decided transaction records. */
  private[tables] val TxDirName = "_tx"
}
