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
  * head entry is never deleted). */
final class FileCasCoordinator(conf: Configuration, dir: String)
  extends CommitCoordinator {

  private val base = new HPath(dir)
  private val fs: FileSystem = base.getFileSystem(conf)

  private def keyDir(table: String): HPath =
    // table keys are fs-safe names ('@' joins branch refs)
    new HPath(base, table.replace("@", "__at__"))

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

  /** Head of the ledger: (generation, value); generation 0 = empty. */
  private def head(table: String): (Long, Option[String]) =
    entries(table).lastOption match {
      case None => (0L, None)
      case Some((n, p)) =>
        val v = readEntry(p)
        (n, if (v.isEmpty) None else Some(v))
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
    val target = new HPath(d, s"commit-${n + 1}")
    val won =
      try {
        if (fs.getScheme == "file") {
          // RawLocalFileSystem's create(overwrite=false) is
          // check-then-create; O_EXCL via java.nio is atomic
          java.nio.file.Files.write(
            java.nio.file.Paths.get(target.toUri.getPath),
            value.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          true
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
    if (won) prune(table, n + 1)
    won
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
}
