package graft

import graft.io.{Dump, HdfsSemanticsFileSystem}
import graft.sim.IndexStore
import org.apache.hadoop.fs.Path

/** The artifact commit protocol on a SECOND FileSystem semantics
  * (VERDICT r16 #1): every r16 atomicity drive ran on `file://`, one
  * FileSystem implementation with POSIX rename. These specs run the
  * commit/freshness/crash battery and the ledger replace on
  * [[graft.io.HdfsSemanticsFileSystem]] — no-overwrite rename, no append,
  * rename-into-missing-parent refused — so the branches only an
  * HDFS-semantics FS can take (rename returns false, delete→rename swap)
  * actually execute. The full-suite twin is the shimhdfs:// Verify drive
  * (BASELINE round 17). */
class ShimHdfsSpec extends SparkSpec {

  private def fs(p: String) = {
    spark.sparkContext.hadoopConfiguration
      .set(HdfsSemanticsFileSystem.ImplKey, HdfsSemanticsFileSystem.ImplClass)
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
  }

  private def uniq(tag: String) =
    s"$tag${System.nanoTime()}"

  test("shim semantics: rename never overwrites, refuses missing parents; " +
    "append unsupported; parquet round-trips through the shim") {
    import spark.implicits._
    val root = s"shimhdfs://sem/${uniq("t")}"
    val f = fs(root)
    assert(f.isInstanceOf[HdfsSemanticsFileSystem],
      s"conf did not resolve the shim: ${f.getClass}")
    f.mkdirs(new Path(s"$root/a"))
    f.create(new Path(s"$root/a/x"), true).close()
    f.create(new Path(s"$root/a/y"), true).close()
    // no implicit overwrite: dst exists (file) => false, both survive
    assert(!f.rename(new Path(s"$root/a/x"), new Path(s"$root/a/y")))
    assert(f.exists(new Path(s"$root/a/x")) &&
      f.exists(new Path(s"$root/a/y")))
    // dst exists (directory) => false too — stricter than HDFS's
    // move-into-dir special case, documented on the shim
    f.mkdirs(new Path(s"$root/b"))
    assert(!f.rename(new Path(s"$root/a"), new Path(s"$root/b")))
    // missing destination parent => false, not created
    assert(!f.rename(new Path(s"$root/a/x"), new Path(s"$root/nope/x")))
    assert(!f.exists(new Path(s"$root/nope")))
    intercept[java.io.IOException](f.append(new Path(s"$root/a/x")))
    // Spark's parquet writer+reader resolve the shim from the session
    // hadoopConf and see scheme-qualified statuses end to end
    Seq((1L, "p"), (2L, "q")).toDF("id", "tag")
      .write.mode("overwrite").parquet(s"$root/pq")
    val back = spark.read.parquet(s"$root/pq")
    assert(back.count() == 2)
    assert(back.where($"id" === 2L).select("tag").head().getString(0) == "q")
  }

  test("commitBuild on the shim: first build, rebuild-over-existing " +
    "(delete+rename swap), and crash-mid-build all keep the invariants") {
    import spark.implicits._
    val p = s"shimhdfs://commit/${uniq("art")}"
    fs(p)
    val fp = (10L, 5L, 99L)
    val ph = IndexStore.paramsHash("shim=1")
    assert(!IndexStore.isFresh(spark, p, fp, ph))
    // first build: target absent — no swap window at all
    assert(IndexStore.commitBuild(spark, p) { tmp =>
      Seq(("v1", 1L)).toDF("tag", "v")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/member")
      IndexStore.writeManifest(spark, tmp, fp, ph)
    })
    assert(IndexStore.isFresh(spark, p, fp, ph))
    assert(spark.read.parquet(s"$p/member").select("tag").head()
      .getString(0) == "v1")
    // crash mid-build: target untouched, tmp swept by the next committer
    val boom = intercept[RuntimeException] {
      IndexStore.commitBuild(spark, p) { tmp =>
        Seq(("partial", 1L)).toDF("tag", "v")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/member")
        throw new RuntimeException("injected kill")
      }
    }
    assert(boom.getMessage.contains("injected kill"))
    assert(IndexStore.isFresh(spark, p, fp, ph))
    assert(spark.read.parquet(s"$p/member").select("tag").head()
      .getString(0) == "v1")
    // rebuild over the EXISTING artifact: on this FS a bare rename would
    // refuse (dst exists) — the delete+rename swap is the only way through,
    // and it must land the complete new artifact
    val fp2 = (11L, 6L, 100L)
    assert(IndexStore.commitBuild(spark, p) { tmp =>
      Seq(("v2", 2L)).toDF("tag", "v")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/member")
      IndexStore.writeManifest(spark, tmp, fp2, ph)
    })
    assert(IndexStore.isFresh(spark, p, fp2, ph))
    assert(!IndexStore.isFresh(spark, p, fp, ph))
    assert(spark.read.parquet(s"$p/member").select("tag").head()
      .getString(0) == "v2")
    // no tmp garbage
    val left = fs(p).globStatus(new Path(s"$p.build-*"))
    assert(left == null || left.isEmpty,
      s"tmp leftovers: ${Option(left).toSeq.flatten.mkString(",")}")
  }

  test("swap window pinned: during the delete→rename swap a reader sees a " +
    "MISSING artifact (stale, loud, never corrupt), and a concurrent " +
    "re-creation refuses the rename, leaving the fully-built tmp for the " +
    "sweeper") {
    import spark.implicits._
    val p = s"shimhdfs://window/${uniq("art")}"
    val f = fs(p)
    val fp = (1L, 1L, 1L)
    val ph = IndexStore.paramsHash("w=1")
    def commit(tag: String, fpx: (Long, Long, Long)): Boolean =
      IndexStore.commitBuild(spark, p) { tmp =>
        Seq((tag, 1L)).toDF("tag", "v")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/member")
        IndexStore.writeManifest(spark, tmp, fpx, ph)
      }
    assert(commit("v1", fp))
    // (a) reader-visible absence window: at the commit rename of the
    // REBUILD, the live target has already been deleted — a concurrent
    // reader's freshness probe inside that window reads STALE (absence),
    // which sends it to a rebuild, never to a torn artifact.
    val fp2 = (2L, 2L, 2L)
    var sawWindow = false
    HdfsSemanticsFileSystem.beforeRename = (_, dst) => {
      if (dst.toString == p) {
        assert(!f.exists(new Path(p)), "target should be absent mid-swap")
        assert(!IndexStore.isFresh(spark, p, fp2, ph),
          "a mid-swap reader must see stale, not fresh")
        sawWindow = true
      }
    }
    try assert(commit("v2", fp2))
    finally HdfsSemanticsFileSystem.beforeRename = null
    assert(sawWindow, "the swap-window hook never fired on the target")
    assert(IndexStore.isFresh(spark, p, fp2, ph))
    // (b) hostile concurrency: another process re-creates the target
    // after our delete, every time — rename refuses (the branch POSIX
    // can never take: its rename would replace the empty dir), commitBuild
    // returns false and must LEAVE the fully-built tmp (ADVICE r16: the
    // old finally deleted it, discarding both artifacts at once).
    val fp3 = (3L, 3L, 3L)
    HdfsSemanticsFileSystem.beforeRename = (_, dst) => {
      if (dst.toString == p) f.mkdirs(new Path(p))
    }
    val refused =
      try commit("v3", fp3)
      finally HdfsSemanticsFileSystem.beforeRename = null
    assert(!refused, "rename against a persistently re-created target " +
      "must report refusal")
    val tmps = f.globStatus(new Path(s"$p.build-*"))
    assert(tmps != null && tmps.length == 1,
      "the fully-built tmp must survive a refused rename for the sweeper")
    assert(spark.read
      .parquet(s"${tmps.head.getPath}/member").select("tag").head()
      .getString(0) == "v3", "the surviving tmp must be the COMPLETE build")
    // (c) the next committer sweeps the orphan and commits clean
    assert(commit("v4", fp3))
    assert(IndexStore.isFresh(spark, p, fp3, ph))
    assert(spark.read.parquet(s"$p/member").select("tag").head()
      .getString(0) == "v4")
    val left = f.globStatus(new Path(s"$p.build-*"))
    assert(left == null || left.isEmpty)
  }

  test("incremental-dump ledger on the shim: the atomic tmp+rename " +
    "replace works without overwrite-rename, and windows stay exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = uniq("led")
    val ledger = s"shimhdfs://ledger/$base/chain.ledger"
    fs(ledger)
    // dumps themselves are local (the TSV writer is FS-agnostic, but keep
    // the focus on the LEDGER's shim path)
    val out = java.nio.file.Files
      .createTempDirectory("graft_shim_ledger").toString
    val df = Seq((1L, 100L), (2L, 200L), (3L, 300L))
      .toDF("id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val w1 = Dump.incrementalDump(df, "ts", 150L, ledger, out)
    assert(w1 == Dump.DumpWindow(1L, Long.MinValue, 150L))
    // second append: the ledger file EXISTS now — on this FS the replace
    // must take the delete+rename fallback (no overwrite-rename), and the
    // chain must read back complete
    val w2 = Dump.incrementalDump(df, "ts", 300L, ledger, out)
    assert(w2 == Dump.DumpWindow(2L, 150L, 300L))
    assert(Dump.readLedger(spark, ledger) == Seq(w1, w2))
    // no tmp siblings survive a clean replace
    val tmps = fs(ledger).globStatus(new Path(s"$ledger.tmp-*"))
    assert(tmps == null || tmps.isEmpty)
  }
}
