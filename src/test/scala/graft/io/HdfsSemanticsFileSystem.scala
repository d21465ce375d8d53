package graft.io

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** HDFS-SEMANTICS filesystem shim (VERDICT r16 #1): a second, genuinely
  * different `FileSystem` implementation to drive the artifact commit
  * protocol against — every round-16 atomicity claim was proven only on
  * `file://`, whose POSIX rename(2) happily replaces an existing empty
  * destination. This shim enforces the rename contract HDFS actually has:
  *
  *   - `rename(src, dst)` NEVER implicitly overwrites: an existing `dst`
  *     (file OR directory — stricter than HDFS's move-into-directory
  *     special case, and strictness is what kills sloppy protocols)
  *     returns false;
  *   - `rename` into a missing parent returns false (HDFS returns false
  *     rather than creating parents);
  *   - `append` is unsupported (the common HDFS deployment posture and
  *     every object store).
  *
  * Storage is local disk under `fs.shimhdfs.root` (default
  * `$java.io.tmpdir/graft_shimhdfs`), one subtree per URI authority, via a
  * [[BareRawLocalFileSystem]] delegate with both-direction path
  * translation — so `shimhdfs://case/...` paths flow through Spark's
  * parquet reader/writer, the IndexStore control plane, and the Dump
  * ledger exactly as a real remote URI would (scheme-qualified statuses,
  * FS resolved from the session hadoopConf), while the rename/overwrite
  * semantics are the hostile ones. Registered per-session via
  * `spark.hadoop.fs.shimhdfs.impl` (specs) or GRAFT_ENGINE_CONF (drives);
  * never active unless a conf names it.
  *
  * [[HdfsSemanticsFileSystem.beforeRename]] is the fault-injection seam
  * for the swap-window specs: it fires at the top of every rename, where
  * a test can observe the reader-visible absence window of commitBuild's
  * delete→rename swap or re-create the destination to force the
  * rename-refused branch that only an HDFS-semantics FS can take.
  */
class HdfsSemanticsFileSystem extends FileSystem {
  private var myUri: URI = _
  private var storeRoot: String = _
  private var store: BareRawLocalFileSystem = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    val auth = Option(name.getAuthority).getOrElse("default")
    myUri = URI.create(s"${name.getScheme}://$auth")
    storeRoot = conf.get("fs.shimhdfs.root",
      s"${System.getProperty("java.io.tmpdir")}/graft_shimhdfs") +
      s"/$auth"
    store = new BareRawLocalFileSystem
    store.initialize(URI.create("file:///"), conf)
    workDir = new Path(s"$myUri/")
    new java.io.File(storeRoot).mkdirs()
  }

  override def getScheme: String = myUri.getScheme
  override def getUri: URI = myUri

  /** shimhdfs path → backing local path (under storeRoot). */
  private def toLocal(p: Path): Path = {
    val q = makeQualified(p)
    new Path(s"file:$storeRoot${q.toUri.getPath}")
  }

  /** backing local path → shimhdfs path (statuses must come back
    * scheme-qualified, or listing-based readers silently flip FS). */
  private def fromLocal(p: Path): Path = {
    val lp = p.toUri.getPath
    require(lp.startsWith(storeRoot), s"not a store path: $p")
    val rel = lp.stripPrefix(storeRoot)
    new Path(myUri.getScheme, myUri.getAuthority,
      if (rel.isEmpty) "/" else rel)
  }

  private def translate(st: FileStatus): FileStatus = {
    st.setPath(fromLocal(st.getPath))
    st
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    store.open(toLocal(f), bufferSize)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    store.create(toLocal(f), permission, overwrite, bufferSize, replication,
      blockSize, progress)

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new java.io.IOException(
      "shimhdfs does not support append (modeling the common HDFS " +
        "deployment posture and every object store)")

  override def rename(src: Path, dst: Path): Boolean = {
    val hook = HdfsSemanticsFileSystem.beforeRename
    if (hook != null) hook(makeQualified(src), makeQualified(dst))
    val (ls, ld) = (toLocal(src), toLocal(dst))
    if (!store.exists(ls)) false
    else if (store.exists(ld)) false // HDFS: no implicit overwrite, ever
    else if (ld.getParent != null && !store.exists(ld.getParent)) false
    else store.rename(ls, ld)
  }

  override def delete(f: Path, recursive: Boolean): Boolean =
    store.delete(toLocal(f), recursive)

  override def listStatus(f: Path): Array[FileStatus] =
    store.listStatus(toLocal(f)).map(translate)

  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }
  override def getWorkingDirectory: Path = workDir

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    store.mkdirs(toLocal(f), permission)

  override def getFileStatus(f: Path): FileStatus =
    translate(store.getFileStatus(toLocal(f)))
}

object HdfsSemanticsFileSystem {
  /** Fault-injection hook: invoked at the top of every [[rename]] with the
    * qualified (src, dst). Set by swap-window specs; MUST be reset to null
    * in a finally. */
  @volatile var beforeRename: (Path, Path) => Unit = null

  /** Conf entries that register the shim on a session. */
  val ImplKey = "fs.shimhdfs.impl"
  val ImplClass: String = classOf[HdfsSemanticsFileSystem].getName
}
