package graft.io

import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission

/** Local `file://` filesystem without per-file `chmod` forks or `.crc`
  * sidecars.
  *
  * Hadoop's default local FS (`LocalFileSystem` = checksummed
  * `RawLocalFileSystem`) calls `setPermission` on every file create and
  * every mkdir; without the libhadoop native library that call is
  * `Shell.execCommand("chmod", …)` — a full fork+exec PER FILE. A
  * dynamic-partition dump into ~1000 shard dirs paid ~4 forks per leaf
  * (file + checksum sidecar + dirs): measured 14.3 s for a 5000-row write
  * whose raw-JVM equivalent is 0.05 s. On a real cluster the data lands on
  * HDFS/S3 where permissions are metadata RPCs, so this overhead is a
  * local-mode artifact, not a scale cost — but it taxed every local write
  * (the correctness gate, tests, bench) by the same per-file constant.
  *
  * Permissions are irrelevant in a single-user local run, so: no-op the
  * chmod, and extend Raw (not Checksum) so no `.crc` twin doubles the file
  * count. Registered via `spark.hadoop.fs.file.impl` in [[graft.Engine]].
  */
class BareLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}
