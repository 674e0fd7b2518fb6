package graft

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A RawLocalFileSystem whose `setTimes` is a SILENT NO-OP — the
  * object-store posture (the Hadoop FileSystem base class ignores
  * setTimes, and blob-store implementations commonly inherit that).
  * The FileFeed guard spec mounts it under the `noset://` scheme to
  * prove the ordered feed detects unhonored mtime stamps and fails
  * fast instead of silently degrading its order contract. */
class NoSetTimesFs extends RawLocalFileSystem {
  override def getScheme: String = "noset"
  override def getUri: java.net.URI = java.net.URI.create("noset:///")
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit = ()
}
