package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, RawLocalFileSystem}

/** Test-only Hadoop filesystem with a NON-`file:` scheme, backed by the
  * local disk. TableStore branches on `fs.getScheme == "file"` for its
  * commit primitives (java.nio ATOMIC_MOVE + O_EXCL create on the local
  * fast path; FileContext rename-with-overwrite + `fs.create(overwrite =
  * false)` locks everywhere else — the HDFS-shaped path). Registering
  * `mockfs:` routes a whole TableStoreSpec workload through the second
  * branch, which otherwise never runs in tests. */
class MockFs extends RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: URI = URI.create("mockfs:///")

  /** RawLocalFileSystem statuses load permissions LAZILY via
    * `Paths.get(status.getPath.toUri)` — which rejects any scheme other
    * than `file:`. Re-wrap as plain FileStatus with concrete (default)
    * permissions so nothing ever triggers that load; TableStore never
    * reads permissions. */
  private def eager(s: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(s.getLen, s.isDirectory,
      s.getReplication, s.getBlockSize, s.getModificationTime, s.getAccessTime,
      if (s.isDirectory) org.apache.hadoop.fs.permission.FsPermission.getDirDefault
      else org.apache.hadoop.fs.permission.FsPermission.getFileDefault,
      "test", "test", s.getPath)

  override def getFileStatus(f: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileStatus =
    eager(super.getFileStatus(f))

  override def listStatus(f: org.apache.hadoop.fs.Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(eager)
}

/** FileContext-side binding (`fs.AbstractFileSystem.mockfs.impl`): Hadoop
  * instantiates this reflectively with (URI, Configuration). */
class MockAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new MockFs, conf, "mockfs", false)
