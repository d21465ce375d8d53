package graft.io

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
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
  * chmod in the RAW delegate, and disable checksum write/verify so no
  * `.crc` twin doubles the file count.
  *
  * Shape (round 16): MUST extend [[LocalFileSystem]], not
  * [[RawLocalFileSystem]] — Hadoop's `FileSystem.getLocal(conf)` casts
  * the `file://` filesystem to `LocalFileSystem`, and library code all
  * over the stack goes through it (`copyFromLocalFile`, and notably the
  * RocksDB state-store file manager uploading SST files to the
  * checkpoint DFS). The original Raw-extending shape made every such
  * call path throw ClassCastException — found by the round-16 RocksDB
  * state-store drive. Registered via `spark.hadoop.fs.file.impl` in
  * [[graft.Engine]].
  */
class BareLocalFileSystem extends LocalFileSystem(new BareRawLocalFileSystem) {
  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    // no .crc sidecars on write, no checksum reads on open
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}

/** The raw delegate: local FS with the per-file chmod fork no-op'd. */
class BareRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}
