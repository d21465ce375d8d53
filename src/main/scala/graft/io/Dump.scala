package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Bulk dump / export / import operators (reference §2.1 S4–S11:
  * db/dump.py — TSV/CSV table dumps chunked at 500k rows/file, sharded
  * per-recording JSON dumps, dataset CSV import/export).
  *
  * Spark-first translation: the reference's hand-rolled COPY loops with
  * cursor batching (DUMP_CHUNK_SIZE=10k) become single distributed writes;
  * its ROWS_PER_FILE=500,000 chunking is `maxRecordsPerFile`; its
  * `<mbid-prefix>/` directory sharding (db/dump.py:619-628) is
  * `partitionBy` on derived prefix columns, which also gives partition
  * pruning on read-back. All writers are driver-light: no collect, no
  * per-row driver loops.
  */
object Dump {

  /** Reference ROWS_PER_FILE (db/dump.py:38). */
  val RowsPerFile = 500000

  /** S4/S11 — TSV table dump, chunked like the reference's 500k-row files.
    * Optional time-range slice (reference incremental dumps,
    * db/dump.py:321-333) should be applied by the caller as a filter so it
    * pushes down to the scan. */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", "true")
      .option("maxRecordsPerFile", RowsPerFile)
      // reference dumps are zstd (db/dump.py:631); hadoop's zstd text codec
      // needs native libs absent here, so gzip locally — swap via config
      // where the cluster ships libzstd.
      .option("compression", "gzip")
      .csv(path)

  /** S5 — TSV import with an explicit schema (the reference checks the
    * schema version before COPY FROM; here the schema IS the contract). */
  def readTsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("sep", "\t").option("header", "true")
      .csv(path)

  /** S7 — sharded JSON dump: one JSON document per row, sharded into
    * directories by the first two / next one characters of the key, exactly
    * the reference's `<gid[0:2]>/<gid[2:3]>/` layout (db/dump.py:619-628).
    * `partitionBy` turns the shard dirs into partition-pruned paths. */
  def writeJsonSharded(df: DataFrame, keyCol: String, path: String): Unit =
    df.withColumn("shard1", substring(col(keyCol).cast("string"), 1, 2))
      .withColumn("shard2", substring(col(keyCol).cast("string"), 3, 1))
      // Cluster rows by shard BEFORE the dynamic-partition write: without
      // this, every write task holds an open file per shard dir it sees
      // (up to n_tasks × n_shards tiny files — measured 22 s vs 3 s at
      // sf0.1 for ~1000 dirs × 32 tasks). After the shuffle each task owns
      // a few whole shards, so the dump is one file per shard per 500k
      // rows — the layout a 1000-executor run needs too.
      .repartition(col("shard1"), col("shard2"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard1", "shard2")
      .option("maxRecordsPerFile", RowsPerFile)
      .json(path)

  /** Read-back of a sharded JSON dump (partition columns restored). The
    * schema is explicit, like [[readTsv]]: schema inference would scan every
    * JSON file once BEFORE the real read (doubling I/O on a dump with
    * millions of shard files) and can silently widen types so the
    * round-trip frame no longer matches what was written. */
  def readJsonSharded(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S9 — dataset CSV import: `<id>,<class>` rows plus optional
    * `description[:<class>],<text>` header rows, mirroring the reference's
    * conditional row parser (webserver/views/datasets.py:457-535). Returns
    * (kind, id, cls): kind = 'description' | 'class_description' | 'member'. */
  def parseDatasetCsv(lines: DataFrame, lineCol: String): DataFrame = {
    // simple unquoted grammar (the reference's rows are plain `<id>,<class>`;
    // quoted fields with embedded commas would need spark.read.csv).
    // Column API throughout — no expr() string splicing, so a column name
    // needing backticks can't break (or change) the parse.
    val line = col(lineCol)
    val c0 = trim(substring_index(line, ",", 1))
    val rest = when(instr(line, ",") === 0, lit(null))
      .otherwise(trim(line.substr(instr(line, ",") + 1, length(line))))
    lines.select(
      when(c0 === "description", lit("description"))
        .when(c0.startsWith("description:"), lit("class_description"))
        .otherwise(lit("member")).as("kind"),
      when(c0.startsWith("description:"),
          trim(c0.substr(lit(13), length(c0))))
        .when(c0 === "description", lit(null))
        .otherwise(c0).as("id"),
      rest.as("cls"))
  }

  /** S10 — dataset export: (class → members) rows flattened to annotation
    * CSV shape (reference webserver/views/datasets.py:132-268). */
  def datasetAnnotations(dataset: DataFrame): DataFrame =
    dataset.select(col("class"), explode(col("recordings")).as("recording_id"))
      .orderBy("class", "recording_id")

  // --------------------------------------------------------------------
  // Archive envelope (reference db/dump.py:203-386, :449-497: tar.zst
  // archives with `MANIFEST`, `SCHEMA_SEQUENCE` and `TIMESTAMP` members
  // ahead of the data). Container here is zip — java.util.zip is in the
  // JVM, tar/zstd native tooling is not — but the envelope CONTRACT is
  // the reference's: members are manifest-listed, the schema version is
  // checked BEFORE any data is extracted, and a version mismatch aborts
  // the import (db/dump.py:449-465). At cluster scale the archive step
  // runs per shard (one archive per dump partition) rather than over one
  // driver-side stream.
  // --------------------------------------------------------------------

  /** Dump schema version (reference db.SCHEMA_VERSION): imports refuse an
    * archive whose recorded version differs. */
  val SchemaSequence = 1

  /** Thrown when an archive's SCHEMA_SEQUENCE doesn't match the engine's. */
  final class SchemaMismatchException(msg: String)
    extends IllegalStateException(msg)

  /** Resolve `p` for the LOCAL envelope tooling (tar/zip over java.io):
    * scheme-less paths pass through, `file:` URIs lose their scheme,
    * anything else is refused loudly BEFORE any work starts. Round 16
    * moved the sharded sets' ROOT control files (SCHEMA_SEQUENCE, root
    * MANIFEST, the incremental ledger) onto the path's Hadoop FileSystem,
    * which made the posture half-URI (ADVICE r16): an `hdfs://` archiveDir
    * wrote its root manifest fine, then every executor's local
    * FileOutputStream threw mid-set. The envelope tooling is DELIBERATELY
    * local — the reference writes local tar.zst archives too
    * (db/dump.py:203-386) and java.util.zip.ZipFile needs a seekable local
    * file — so the supported URI surface is exactly `file:`; a remote
    * scheme fails here, by name, with nothing partially written. */
  private[io] def localPathOf(p: String, what: String): String = {
    val u = new org.apache.hadoop.fs.Path(p).toUri
    u.getScheme match {
      case null => p
      case "file" => u.getPath
      case s => throw new IllegalArgumentException(
        s"$what runs the local archive-envelope tooling (reference-" +
          s"faithful tar/zip over java.io) and supports only local paths " +
          s"or file: URIs; got scheme '$s' in '$p'. Stage the archive set " +
          "locally and ship it, or keep only the ROOT control files " +
          "(manifest/ledger) on shared storage.")
    }
  }

  /** List a dump directory's regular files, as sorted root-relative paths. */
  private def listMembers(dumpDir: String): Seq[String] = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(dumpDir)
    val walk = Files.walk(root)
    try walk.filter(Files.isRegularFile(_)).toArray.toSeq
      .map(p => root.relativize(p.asInstanceOf[java.nio.file.Path]).toString)
      .sorted
    finally walk.close()
  }

  /** Write one envelope zip (`SCHEMA_SEQUENCE`, `TIMESTAMP`, `MANIFEST`,
    * then `data/<member>`) containing the given members of `dumpDir`.
    * Called on the driver for the single-shard case and inside executor
    * tasks for the sharded case — it deliberately touches nothing but its
    * arguments. */
  private def writeEnvelopeZip(dumpDir: String, archive: String,
      files: Seq[String]): Unit = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(dumpDir)
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(archive)))
    def member(name: String, bytes: Array[Byte]): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(bytes)
      zos.closeEntry()
    }
    try {
      member("SCHEMA_SEQUENCE", SchemaSequence.toString.getBytes("UTF-8"))
      member("TIMESTAMP", java.time.Instant.now().toString.getBytes("UTF-8"))
      member("MANIFEST", files.mkString("\n").getBytes("UTF-8"))
      for (f <- files)
        member(s"data/$f", Files.readAllBytes(root.resolve(f)))
    } finally zos.close()
  }

  /** Package a dump directory into ONE archive file — the single-shard
    * case (small dumps, tests, the envelope contract itself). For anything
    * a single process shouldn't hold, use [[writeShardedArchives]]: this
    * variant streams every member through the caller's JVM. */
  def writeArchive(dumpDir: String, archive: String): Unit = {
    val (d, a) = (localPathOf(dumpDir, "writeArchive"),
      localPathOf(archive, "writeArchive"))
    writeEnvelopeZip(d, a, listMembers(d))
  }

  // --------------------------------------------------------------------
  // tar.zst envelope — byte-level REFERENCE-ECOSYSTEM parity (db/dump.py
  // :226-252, :631-634, :968-1014). The zip envelope above carries the
  // same contract JVM-natively; this container is for exchanging dumps
  // with the reference's own tooling: `zstd -d | tar x` reads ours, and
  // ours reads an archive produced by the reference's tarfile|zstd pipe.
  // Layout (member ORDER is the import contract — the reference streams
  // the tar and validates SCHEMA_SEQUENCE as it passes, so metadata
  // precedes data):
  //   <name>/SCHEMA_SEQUENCE      schema version
  //   <name>/TIMESTAMP            "YYYY-MM-DD HH:MM:SS.ffffff"
  //   <name>/COPYING              CC0 dedication (db/licenses/)
  //   <name>/abdump/<member...>   data files, nested paths preserved
  //     (db/dump.py:255-260; partitioned tables nest one level deeper,
  //      <table>/<table>-<n> — db/dump.py:203-238)
  // --------------------------------------------------------------------

  /** COPYING member body: the reference ships its dumps into the public
    * domain under CC0 (db/licenses/COPYING-PublicDomain); the member's
    * presence and placement are the ecosystem contract. */
  private val CopyingText =
    "Creative Commons Legal Code\n\nCC0 1.0 Universal\n\n" +
      "The person who associated a work with this deed has dedicated the " +
      "work to\nthe public domain by waiving all of his or her rights to " +
      "the work\nworldwide under copyright law, including all related and " +
      "neighboring\nrights, to the extent allowed by law.\n"

  /** zstd level matching the reference's `zstd --compress -10`
    * (db/dump.py:539, 631 — "good tradeoff between compression speed and
    * final file size with AB data"). */
  private val ZstdLevel = 10

  /** Package a dump directory as a reference-layout `.tar.zst` — the
    * ecosystem-exchange twin of [[writeArchive]]. The archive NAME becomes
    * the tar's root directory (basename up to the first dot, exactly the
    * reference's `os.path.basename(path).split('.')[0]`). */
  def writeTarZstArchive(dumpDir0: String, archive0: String): Unit = {
    import java.nio.file.{Files, Paths}
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val dumpDir = localPathOf(dumpDir0, "writeTarZstArchive")
    val archive = localPathOf(archive0, "writeTarZstArchive")
    val name = Paths.get(archive).getFileName.toString.split("\\.")(0)
    val root = Paths.get(dumpDir)
    val tos = new TarArchiveOutputStream(
      new com.github.luben.zstd.ZstdOutputStream(
        new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(archive)), ZstdLevel), "UTF-8")
    tos.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    // the reference's lowlevel_json dump members run to tens of GiB:
    // sizes past the 8 GiB octal header limit need the POSIX big-number
    // extension (LONGFILE_POSIX above only covers long NAMES)
    tos.setBigNumberMode(TarArchiveOutputStream.BIGNUMBER_POSIX)
    def member(path: String, bytes: Array[Byte]): Unit = {
      val e = new TarArchiveEntry(s"$name/$path")
      e.setSize(bytes.length.toLong)
      tos.putArchiveEntry(e)
      tos.write(bytes)
      tos.closeArchiveEntry()
    }
    // data members STREAM through a fixed buffer — a multi-GiB table
    // file must never require a single byte[] (readAllBytes caps at
    // Integer.MAX_VALUE and OOMs long before)
    def fileMember(path: String, src: java.nio.file.Path): Unit = {
      val e = new TarArchiveEntry(s"$name/$path")
      e.setSize(Files.size(src))
      tos.putArchiveEntry(e)
      val in = Files.newInputStream(src)
      try {
        val buf = new Array[Byte](1 << 16)
        var nRead = in.read(buf)
        while (nRead >= 0) {
          if (nRead > 0) tos.write(buf, 0, nRead)
          nRead = in.read(buf)
        }
      } finally in.close()
      tos.closeArchiveEntry()
    }
    try {
      member("SCHEMA_SEQUENCE", SchemaSequence.toString.getBytes("UTF-8"))
      // Python datetime.isoformat(" ") — space separator, microseconds.
      // FIXED width: LocalDateTime.toString varies its fractional digits
      // (and drops ":ss" entirely on exact minutes), which "%Y-%m-%d
      // %H:%M:%S.%f" parsers reject.
      member("TIMESTAMP", java.time.LocalDateTime.now().format(
        java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")).getBytes("UTF-8"))
      member("COPYING", CopyingText.getBytes("UTF-8"))
      for (f <- listMembers(dumpDir))
        fileMember(s"abdump/$f", root.resolve(f))
    } finally tos.close()
  }

  /** Stream-import a reference-layout `.tar.zst` into `destDir` — the
    * twin of [[readArchive]] and the mirror of the reference's
    * `import_db_dump` (db/dump.py:449-497): the tar is read as a STREAM,
    * `SCHEMA_SEQUENCE` is validated as it passes, and — stricter than the
    * reference, which silently imports whatever precedes it — any data
    * member arriving before the schema was validated aborts, so a
    * reordered or truncated archive can never half-import. Member paths
    * under `<anything>/abdump/` extract with the same containment guard
    * as the zip reader. Returns extracted member names. */
  def readTarZstArchive(archive0: String, destDir: String,
      expectedSchema: Int = SchemaSequence): Seq[String] = {
    import java.nio.file.{Files, Paths}
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    val archive = localPathOf(archive0, "readTarZstArchive")
    val tis = new TarArchiveInputStream(
      new com.github.luben.zstd.ZstdInputStream(
        new java.io.BufferedInputStream(
          new java.io.FileInputStream(archive))), "UTF-8")
    val dest = Paths.get(localPathOf(destDir, "readTarZstArchive"))
      .toAbsolutePath.normalize()
    Files.createDirectories(dest)
    val extracted = Seq.newBuilder[String]
    var schemaSeen = false
    try {
      var e = tis.getNextEntry
      while (e != null) {
        val base = e.getName.split("/").last
        val dataIdx = e.getName.indexOf("/abdump/")
        // the schema member is the TOP-LEVEL <name>/SCHEMA_SEQUENCE only:
        // a data member that happens to be named .../abdump/.../SCHEMA_
        // SEQUENCE must extract as data, not hijack the validation branch
        if (!e.isDirectory && base == "SCHEMA_SEQUENCE" && dataIdx < 0) {
          val v = new String(tis.readAllBytes(), "UTF-8").trim.toInt
          if (v != expectedSchema)
            throw new SchemaMismatchException(
              s"archive schema $v != expected $expectedSchema")
          schemaSeen = true
        } else if (!e.isDirectory && dataIdx >= 0) {
          if (!schemaSeen)
            throw new SchemaMismatchException(
              s"data member ${e.getName} precedes SCHEMA_SEQUENCE — " +
                "refusing to import an unvalidated stream")
          val rel = e.getName.substring(dataIdx + "/abdump/".length)
          val out = dest.resolve(rel).normalize()
          require(out.startsWith(dest),
            s"member path escapes destination: ${e.getName}")
          Files.createDirectories(out.getParent)
          // stream, never buffer: data members can be multi-GiB
          Files.copy(tis, out,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          extracted += rel
        }
        e = tis.getNextEntry
      }
    } finally tis.close()
    extracted.result()
  }

  /** Root manifest name of a sharded archive set. */
  private val RootManifest = "MANIFEST"

  /** Package a dump directory into one archive PER SHARD, zipped on the
    * executors (the reference chunks its tar members per archive for
    * exactly this reason — no single process holds the whole dump,
    * db/dump.py:203-386, 744-760). The driver only lists member PATHS and
    * assigns them round-robin to shards; each executor task zips its own
    * `shard-<id>.zip` with the same envelope as [[writeArchive]]. A root
    * `MANIFEST` (shard name + member count per line, the
    * manifest-of-manifests) and root `SCHEMA_SEQUENCE` are written last,
    * so a reader can refuse the whole set before opening any shard.
    * Executors read the dump and write archives through shared storage
    * (cluster: a DFS path; here: the shared local FS of local mode). */
  def writeShardedArchives(spark: SparkSession, dumpDir: String,
      archiveDir: String, shards: Int = 16): Unit = {
    // refuse a non-local archive/dump scheme BEFORE any work (ADVICE r16:
    // the r16 half-URI posture wrote the root manifest to hdfs:// fine,
    // then every executor's local envelope stream threw mid-set); the
    // normalized local forms feed the envelope tooling, the ORIGINAL
    // archiveDir keeps driving the Hadoop-FS root-file path below, so a
    // file:/// URI exercises the real URI control plane end to end.
    val dumpLocal = localPathOf(dumpDir, "writeShardedArchives")
    val archiveLocal = localPathOf(archiveDir, "writeShardedArchives")
    val members = listMembers(dumpLocal)
    val byShard = members.zipWithIndex
      .groupMap { case (_, i) => i % shards } { case (f, _) => f }
      .toSeq.sortBy(_._1)
    // root control files go through the archive dir's Hadoop filesystem
    // (round 16): the shard archives themselves are produced per-executor
    // with local-file tooling (reference-faithful tar/zip envelopes), but
    // the DRIVER-side root manifest must work on any shared-storage URI —
    // it is the piece a multi-host reader resolves first.
    val fs = hadoopFs(spark, archiveDir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(archiveDir))
    spark.sparkContext
      .parallelize(byShard, byShard.size.max(1))
      .foreach { case (sid, files) =>
        writeEnvelopeZip(dumpLocal, s"$archiveLocal/shard-$sid.zip", files)
      }
    writeSmall(fs, s"$archiveDir/SCHEMA_SEQUENCE",
      SchemaSequence.toString.getBytes("UTF-8"))
    writeSmall(fs, s"$archiveDir/$RootManifest",
      byShard.map { case (sid, files) => s"shard-$sid.zip,${files.size}" }
        .mkString("\n").getBytes("UTF-8"))
  }

  private def hadoopFs(spark: SparkSession,
      p: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeSmall(fs: org.apache.hadoop.fs.FileSystem, p: String,
      bytes: Array[Byte]): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(p), true)
    try out.write(bytes) finally out.close()
  }

  private def readSmall(fs: org.apache.hadoop.fs.FileSystem,
      p: String): String = {
    val in = fs.open(new org.apache.hadoop.fs.Path(p))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Atomically REPLACE the small file at `target` with `bytes` (ADVICE
    * r16: `fs.create(overwrite=true)` truncates the target immediately, so
    * a crash mid-write could tear or empty a file that is someone's source
    * of truth — the incremental-dump ledger). Same pattern as
    * IndexStore.commitBuild: write a unique tmp sibling COMPLETELY, then
    * rename it over the target. On POSIX/file:// the rename is one atomic
    * replace (rename(2) over an existing file); on no-overwrite
    * filesystems (HDFS semantics) the fallback is delete+rename, whose
    * crash window leaves the target momentarily ABSENT — but the complete
    * new body survives at the tmp path, so recovery is a rename, never a
    * reconstruction. Stale tmp siblings from crashed prior writers are
    * swept first (they are strictly older bodies of the same file). */
  private def replaceSmall(fs: org.apache.hadoop.fs.FileSystem, target: String,
      bytes: Array[Byte]): Unit = {
    val t = new org.apache.hadoop.fs.Path(target)
    try {
      val stale = fs.globStatus(new org.apache.hadoop.fs.Path(s"$target.tmp-*"))
      if (stale != null) stale.foreach(st => fs.delete(st.getPath, false))
    } catch { case scala.util.control.NonFatal(_) => () }
    val tmp = new org.apache.hadoop.fs.Path(
      s"$target.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    writeSmall(fs, tmp.toString, bytes)
    var renamed = fs.rename(tmp, t)
    if (!renamed) { // no-overwrite FS (or missing parent): clear and retry
      if (fs.exists(t)) fs.delete(t, false)
      renamed = fs.rename(tmp, t)
    }
    if (!renamed) {
      // leave the complete tmp in place — it IS the new body; deleting it
      // here could lose both copies on a hostile filesystem
      sys.error(s"could not replace $target: rename refused twice " +
        s"(complete new body left at $tmp)")
    }
  }

  /** Unpack a sharded archive set written by [[writeShardedArchives]]:
    * the ROOT schema version is validated before any shard is opened
    * (same refusal contract as [[readArchive]]), the root manifest names
    * the shards, and each shard extracts on an executor with the full
    * per-shard validation (version, member manifest, zip-slip guard). */
  def readShardedArchives(spark: SparkSession, archiveDir: String,
      destDir: String, expectedSchema: Int = SchemaSequence): Unit = {
    import java.nio.file.{Files, Paths}
    // same local-scheme refusal as the writer — loud, named, before any
    // shard extraction starts (the root files below still ride the
    // ORIGINAL possibly-file:-URI path through the Hadoop FS)
    val archiveLocal = localPathOf(archiveDir, "readShardedArchives")
    val destLocal = localPathOf(destDir, "readShardedArchives")
    // driver-side root validation through the archive dir's Hadoop
    // filesystem (round 16, VERDICT r15): the root manifest is what a
    // multi-host reader resolves before any shard opens, so it must work
    // on a shared-storage URI, not just driver-local POSIX paths
    val fs = hadoopFs(spark, archiveDir)
    val rootVersion = readSmall(fs, s"$archiveDir/SCHEMA_SEQUENCE").trim.toInt
    if (rootVersion != expectedSchema)
      throw new SchemaMismatchException(
        s"archive set schema $rootVersion != expected $expectedSchema")
    val shards = readSmall(fs, s"$archiveDir/$RootManifest")
      .split("\n").filter(_.nonEmpty).toSeq
      .map { l => val Array(name, n) = l.split(","); (name, n.toInt) }
    for ((name, _) <- shards) {
      // same containment discipline as the member-path zip-slip guard:
      // a shard name from the manifest must be a plain sibling file name
      require(!name.contains("/") && !name.contains("\\") &&
        name != ".." && name.matches("shard-\\d+\\.zip"),
        s"root manifest shard name escapes the archive dir: $name")
      require(fs.exists(new org.apache.hadoop.fs.Path(s"$archiveDir/$name")),
        s"root manifest lists missing shard $name")
    }
    Files.createDirectories(Paths.get(destLocal))
    val extracted = spark.sparkContext
      .parallelize(shards, shards.size.max(1))
      .map { case (name, expected) =>
        // the recorded member count pins each shard to the root manifest's
        // snapshot: a stale shard-N.zip surviving a reshard (or a partial
        // rewrite) fails loudly instead of extracting a mixed member set
        val members =
          readArchive(s"$archiveLocal/$name", destLocal, expectedSchema)
        if (members.size != expected)
          throw new IllegalStateException(
            s"shard $name extracted ${members.size} members, " +
              s"root manifest records $expected")
        (name, members)
      }.collect()
    // member names must be DISJOINT across shards: a hand-edited or
    // corrupted shard set with duplicate data/ members would otherwise
    // extract last-write-wins silently. Checked on the driver over the
    // collected name lists (member counts are envelope-sized, not data-
    // sized); the failure is loud rather than preventive by design — the
    // write side assigns members round-robin, so duplicates only ever mean
    // a tampered or corrupted set.
    val dup = extracted.flatMap(_._2).groupBy(identity)
      .collect { case (m, hits) if hits.length > 1 => m }
    if (dup.nonEmpty)
      throw new IllegalStateException(
        s"duplicate members across shards: ${dup.toSeq.sorted.take(5).mkString(", ")}")
  }

  /** Unpack an archive into `destDir` after validating its schema version
    * and manifest. Throws [[SchemaMismatchException]] when the recorded
    * version differs from `expectedSchema`; refuses member paths that
    * escape the destination (zip-slip). Returns the extracted member names
    * (the sharded reader checks their count against the root manifest and
    * their cross-shard disjointness). */
  def readArchive(archive: String, destDir: String,
      expectedSchema: Int = SchemaSequence): Seq[String] = {
    import java.nio.file.{Files, Paths}
    val zf = new java.util.zip.ZipFile(localPathOf(archive, "readArchive"))
    try {
      def text(name: String): String = {
        val e = zf.getEntry(name)
        require(e != null, s"archive is missing the $name member")
        new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
      }
      val version = text("SCHEMA_SEQUENCE").trim.toInt
      if (version != expectedSchema)
        throw new SchemaMismatchException(
          s"archive schema $version != expected $expectedSchema")
      val manifest = text("MANIFEST").split("\n").filter(_.nonEmpty).toSeq
      val dest = Paths.get(localPathOf(destDir, "readArchive"))
        .toAbsolutePath.normalize()
      Files.createDirectories(dest)
      for (m <- manifest) {
        val e = zf.getEntry(s"data/$m")
        require(e != null, s"archive is missing manifest member $m")
        val out = dest.resolve(m).normalize()
        require(out.startsWith(dest), s"member path escapes destination: $m")
        Files.createDirectories(out.getParent)
        Files.write(out, zf.getInputStream(e).readAllBytes())
      }
      manifest
    } finally zf.close()
  }

  // --------------------------------------------------------------------
  // Incremental dumps (reference db/dump.py:871-913): dump N covers the
  // window (end_{N-1}, end_N]; a ledger records (dump_id, start, end) per
  // dump, so consecutive dumps are disjoint by construction and their
  // union covers everything up to the last end. The reference keeps the
  // ledger in an `incremental_dumps` DB table; here it is a tiny CSV file
  // (driver-side bookkeeping, like the rest of the dump envelope).
  // --------------------------------------------------------------------

  /** One ledger row: dump `dumpId` covered (startMicros, endMicros]. */
  case class DumpWindow(dumpId: Long, startMicros: Long, endMicros: Long)

  /** Ledger reads go through the ledger path's Hadoop filesystem
    * (round 16): the ledger is the incremental chain's source of truth
    * and on a real deployment lives on shared storage next to the dumps
    * — the same FS-agnostic posture as the artifact-store manifests. */
  def readLedger(spark: SparkSession, ledger: String): Seq[DumpWindow] = {
    val fs = hadoopFs(spark, ledger)
    val p = new org.apache.hadoop.fs.Path(ledger)
    if (!fs.exists(p)) Seq.empty
    else readSmall(fs, ledger).split("\n").toSeq.filter(_.nonEmpty).map { l =>
      val Array(i, s, e) = l.split(",")
      DumpWindow(i.toLong, s.toLong, e.toLong)
    }
  }

  /** Directory of dump `dumpId` under `outDir` — readers derive paths from
    * the LEDGER via this, never from a directory listing (see
    * [[incrementalDump]]'s crash semantics). */
  def dumpPath(outDir: String, dumpId: Long): String = s"$outDir/dump_$dumpId"

  /** The (startMicros, endMicros] slice of `df` on `tsCol`, as plain column
    * predicates (they push down to parquet row groups). `dayCol` names the
    * layout's date PARTITION column when there is one (e.g. `event_day` on
    * [[graft.Tables.eventsPartitioned]]): the derived day-range predicate
    * is partition-column-only, so it prunes whole directories before any
    * file I/O — without it only row-group pushdown applies. Day bounds are
    * computed in the session time zone, matching how the partition column
    * was derived (`to_date(ts)` under the engine's fixed UTC). */
  def windowSlice(df: DataFrame, tsCol: String, startMicros: Long,
      endMicros: Long, dayCol: Option[String] = None): DataFrame = {
    val tsSlice =
      if (startMicros == Long.MinValue)
        df.filter(col(tsCol) <= timestamp_micros(lit(endMicros)))
      else df.filter(col(tsCol) > timestamp_micros(lit(startMicros)) &&
        col(tsCol) <= timestamp_micros(lit(endMicros)))
    dayCol.fold(tsSlice) { dc =>
      val upper = col(dc) <= to_date(timestamp_micros(lit(endMicros)))
      tsSlice.filter(
        if (startMicros == Long.MinValue) upper
        else upper && col(dc) >= to_date(timestamp_micros(lit(startMicros))))
    }
  }

  /** Dump the rows of `df` with `tsCol` in (last end, `endMicros`] as TSV,
    * then append the window to the ledger.
    *
    * Crash semantics — at-least-once, LEDGER-KEYED: the ledger row is
    * appended only AFTER the dump directory is fully written. A crash
    * between the two leaves an orphaned `dump_N` directory that no ledger
    * row references; the next call re-dumps the same window under a fresh
    * id. That orphan is dead data, not duplication, BECAUSE readers resolve
    * dump directories through the ledger ([[readIncrementalDumps]] /
    * [[dumpPath]]) and never by listing `outDir`. (Appending the ledger row
    * first would instead turn a crash into a silent HOLE — a claimed window
    * with no data — which is strictly worse for an auditable dump chain.) */
  def incrementalDump(df: DataFrame, tsCol: String, endMicros: Long,
      ledger: String, outDir: String,
      dayCol: Option[String] = None): DumpWindow = {
    val spark = df.sparkSession
    val prev = readLedger(spark, ledger)
    val start = if (prev.isEmpty) Long.MinValue else prev.map(_.endMicros).max
    require(endMicros > start,
      s"end $endMicros must advance past the last dump end $start")
    val id = (0L +: prev.map(_.dumpId)).max + 1
    writeTsv(windowSlice(df, tsCol, start, endMicros, dayCol),
      dumpPath(outDir, id))
    // append = rewrite through the FS layer (HDFS append support is
    // config-dependent and object stores have none; the ledger is tiny —
    // one line per dump — so read+rewrite is the portable append). The
    // rewrite is ATOMIC — tmp sibling + rename ([[replaceSmall]], ADVICE
    // r16): a plain overwrite truncates the ledger before the new body
    // lands, so a crash there could erase the ENTIRE window history, and a
    // vanished ledger silently restarts the chain (start=MinValue, reused
    // dump ids, overlapping windows → duplicate rows downstream). With the
    // rename, a writer crash leaves either the old complete ledger or the
    // new one. The at-least-once dump contract is unchanged: the row lands
    // only after the dump directory is fully written.
    val fs = hadoopFs(spark, ledger)
    val body = (prev.map(w => s"${w.dumpId},${w.startMicros},${w.endMicros}")
      :+ s"$id,$start,$endMicros").mkString("", "\n", "\n")
    replaceSmall(fs, ledger, body.getBytes("UTF-8"))
    DumpWindow(id, start, endMicros)
  }

  /** Read back the union of all LEDGER-LISTED incremental dumps — the
    * ledger, not the directory listing, decides what exists (orphaned
    * directories from a crashed dump are invisible here by construction). */
  def readIncrementalDumps(spark: SparkSession, ledger: String,
      outDir: String, schema: StructType): DataFrame = {
    val windows = readLedger(spark, ledger)
    require(windows.nonEmpty, s"ledger $ledger lists no dumps")
    windows.map(w => readTsv(spark, dumpPath(outDir, w.dumpId), schema))
      .reduce(_.unionByName(_))
  }
}
