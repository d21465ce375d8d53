package graft

import graft.io.Dump
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-trip semantics of the dump/export/import surface (reference §2.1
  * S4–S11: db/dump.py). */
class DumpSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString

  test("S4/S5: TSV dump round-trips through an explicit schema") {
    val out = tmp("tsv")
    val src = Tables.customer(spark, sfTiny)
      .select("c_custkey", "c_name", "c_acctbal")
    Dump.writeTsv(src, out)
    val back = Dump.readTsv(spark, out, src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }

  test("S7: sharded JSON dump lays out prefix dirs and round-trips") {
    val out = tmp("json")
    val src = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), md5(col("text")).as("gid"), col("lang"))
    Dump.writeJsonSharded(src, "gid", out)
    // shard dirs exist: shard1=<2 hex chars>/shard2=<1 hex char>
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.matches("shard1=[0-9a-f]{2}")))
    // explicit read schema = written data columns + the shard partition
    // columns (restored as strings from the directory names)
    val readSchema = org.apache.spark.sql.types.StructType(
      src.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("shard1",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("shard2",
          org.apache.spark.sql.types.StringType)))
    val back = Dump.readJsonSharded(spark, out, readSchema)
    assert(back.count() == src.count())
    // partition pruning fires on the shard column
    val firstShard = dirs.head.stripPrefix("shard1=")
    val pruned = back.filter(col("shard1") === firstShard)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(plan.contains("PartitionFilters: [isnotnull(shard1"), plan)
  }

  test("S9: dataset CSV import parses member and description rows") {
    val lines = Seq(
      "description,My dataset",
      "  description:rock,Rock songs", // leading whitespace must not shift parse
      "0dad432b-16cc-4bf0-8961-fd31d124b01b,rock",
      "e8afe383-1478-497e-90b1-7885c7f37f6e,jazz").toDF("line")
    val parsed = Dump.parseDatasetCsv(lines, "line").collect()
    assert(parsed(0).getString(0) == "description" && parsed(0).getString(2) == "My dataset")
    assert(parsed(1).getString(0) == "class_description" &&
      parsed(1).getString(1) == "rock" && parsed(1).getString(2) == "Rock songs")
    assert(parsed(2).getString(0) == "member" &&
      parsed(2).getString(1) == "0dad432b-16cc-4bf0-8961-fd31d124b01b" &&
      parsed(2).getString(2) == "rock")
  }

  test("archive envelope round-trips and refuses a schema mismatch") {
    val dumpDir = tmp("arch_dump")
    val src = Tables.nation(spark, sfTiny)
    Dump.writeTsv(src, dumpDir)
    val archive = tmp("arch") + "/dump.zip"
    Dump.writeArchive(dumpDir, archive)
    // version check failure: nothing is extracted, the import aborts
    val badDest = tmp("arch_bad")
    intercept[Dump.SchemaMismatchException] {
      Dump.readArchive(archive, badDest, expectedSchema = Dump.SchemaSequence + 1)
    }
    assert(new java.io.File(badDest).listFiles().forall(_ => false))
    // matching version: extracted data reads back equal to the source
    val dest = tmp("arch_out")
    Dump.readArchive(archive, dest)
    val back = Dump.readTsv(spark, dest, src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }

  test("tar.zst envelope round-trips, keeps reference member order, and " +
    "refuses mismatch/unvalidated streams") {
    val dumpDir = tmp("tz_dump")
    val src = Tables.nation(spark, sfTiny)
    Dump.writeTsv(src, dumpDir)
    // a partitioned-table-style nested member too (db/dump.py:203-238
    // lays out <table>/<table>-<n>)
    Files.createDirectories(java.nio.file.Paths.get(s"$dumpDir/lowlevel_json"))
    Files.write(java.nio.file.Paths.get(
      s"$dumpDir/lowlevel_json/lowlevel_json-1"),
      "1\t{}\n2\t{}\n".getBytes("UTF-8"))
    // adversarial member name: a DATA file called SCHEMA_SEQUENCE under
    // abdump/ must extract as data, not hijack the top-level validation
    // branch (its content is deliberately non-numeric)
    Files.createDirectories(java.nio.file.Paths.get(s"$dumpDir/meta"))
    Files.write(java.nio.file.Paths.get(s"$dumpDir/meta/SCHEMA_SEQUENCE"),
      "not a number\n".getBytes("UTF-8"))
    val archive = tmp("tz_arch") + "/acousticbrainz-dataset-dump-20260814-000000.tar.zst"
    Dump.writeTarZstArchive(dumpDir, archive)
    // round-trip: every member byte-identical
    val dest = tmp("tz_out")
    val members = Dump.readTarZstArchive(archive, dest)
    assert(members.contains("lowlevel_json/lowlevel_json-1"))
    assert(members.contains("meta/SCHEMA_SEQUENCE"),
      "data member named SCHEMA_SEQUENCE was hijacked by validation")
    for (m <- members)
      assert(java.util.Arrays.equals(
        Files.readAllBytes(java.nio.file.Paths.get(s"$dumpDir/$m")),
        Files.readAllBytes(java.nio.file.Paths.get(s"$dest/$m"))), m)
    val back = Dump.readTsv(spark, dest, src.schema)
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
    // schema refusal extracts NOTHING (metadata precedes data in-stream)
    val badDest = tmp("tz_bad")
    intercept[Dump.SchemaMismatchException] {
      Dump.readTarZstArchive(archive, badDest,
        expectedSchema = Dump.SchemaSequence + 1)
    }
    assert(new java.io.File(badDest).listFiles().forall(_ => false))
  }

  test("tar.zst archives interchange byte-for-byte with the reference's " +
    "own tooling (system tar + zstd)") {
    val zstdBin = Seq("/root/miniconda/bin/zstd", "/usr/bin/zstd",
      "/usr/local/bin/zstd").find(p => new java.io.File(p).canExecute)
    val tarBin = Seq("/usr/bin/tar", "/bin/tar")
      .find(p => new java.io.File(p).canExecute)
    assume(zstdBin.isDefined && tarBin.isDefined,
      "system tar/zstd unavailable — interop covered by the JVM round-trip")
    import scala.sys.process._
    val dumpDir = tmp("it_dump")
    Dump.writeTsv(Tables.nation(spark, sfTiny), dumpDir)
    // OUR writer → THEIR reader: the real tar|zstd pipeline lists the
    // reference layout in the reference ORDER (schema before data)
    val name = "acousticbrainz-dataset-dump-20260814-111111"
    val archive = tmp("it_arch") + s"/$name.tar.zst"
    Dump.writeTarZstArchive(dumpDir, archive)
    val listing = (s"${zstdBin.get} -d --stdout $archive" #|
      s"${tarBin.get} -t").!!.split("\n").toSeq
    assert(listing.take(3) == Seq(s"$name/SCHEMA_SEQUENCE",
      s"$name/TIMESTAMP", s"$name/COPYING"), listing.mkString("\n"))
    assert(listing.drop(3).forall(_.startsWith(s"$name/abdump/")))
    val sysOut = tmp("it_sysout")
    (s"${zstdBin.get} -d --stdout $archive" #|
      s"${tarBin.get} -x -C $sysOut").!!
    assert(new String(Files.readAllBytes(java.nio.file.Paths.get(
      s"$sysOut/$name/SCHEMA_SEQUENCE")), "UTF-8").trim.toInt ==
      Dump.SchemaSequence)
    // TIMESTAMP is FIXED-width "%Y-%m-%d %H:%M:%S.%f" — the format the
    // reference ecosystem's parsers expect (LocalDateTime.toString would
    // vary its fraction digits and drop :00 seconds entirely)
    val ts = new String(Files.readAllBytes(java.nio.file.Paths.get(
      s"$sysOut/$name/TIMESTAMP")), "UTF-8")
    assert(ts.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{6}"""),
      s"TIMESTAMP not reference-parseable: '$ts'")
    // THEIR writer → OUR reader: an archive produced by the reference's
    // exact pipe (tarfile | zstd — here the system tools) imports cleanly
    val stage = tmp("it_stage")
    val sname = "acousticbrainz-dataset-dump-20260814-222222"
    Files.createDirectories(java.nio.file.Paths.get(s"$stage/$sname/abdump"))
    Files.write(java.nio.file.Paths.get(s"$stage/$sname/SCHEMA_SEQUENCE"),
      Dump.SchemaSequence.toString.getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(s"$stage/$sname/TIMESTAMP"),
      "2026-08-14 00:00:00.000000".getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(s"$stage/$sname/abdump/dataset"),
      "id\tname\n7\trock\n".getBytes("UTF-8"))
    val theirArchive = tmp("it_their") + s"/$sname.tar.zst"
    // member order matters: schema first, like _dump_tables
    (Process(Seq(tarBin.get, "-c", "-C", stage,
      s"$sname/SCHEMA_SEQUENCE", s"$sname/TIMESTAMP",
      s"$sname/abdump/dataset")) #>
      new java.io.File(theirArchive + ".tar")).!!
    (s"${zstdBin.get} -10 ${theirArchive + ".tar"} -o $theirArchive").!!
    val theirDest = tmp("it_theirout")
    val got = Dump.readTarZstArchive(theirArchive, theirDest)
    assert(got == Seq("dataset"))
    assert(new String(Files.readAllBytes(java.nio.file.Paths.get(
      s"$theirDest/dataset")), "UTF-8") == "id\tname\n7\trock\n")
  }

  test("sharded archives round-trip, refuse at the root, and spread members") {
    val dumpDir = tmp("shard_dump")
    val src = Tables.customer(spark, sfTiny)
      .select("c_custkey", "c_name", "c_acctbal")
    // repartition so the dump has enough files to actually shard
    Dump.writeTsv(src.repartition(8), dumpDir)
    val archiveDir = tmp("shard_arch")
    Dump.writeShardedArchives(spark, dumpDir, archiveDir, shards = 3)
    // the member set is SPREAD: several shard zips exist, each a valid
    // envelope, and the root manifest's counts add up to the dump's files
    val shardZips = new java.io.File(archiveDir).listFiles()
      .filter(_.getName.endsWith(".zip")).map(_.getName).sorted
    assert(shardZips.length == 3, shardZips.mkString(","))
    val rootLines = Files.readAllLines(
      java.nio.file.Paths.get(s"$archiveDir/MANIFEST"))
    val counted = rootLines.size()
    assert(counted == 3)
    // root-level refusal: no shard is opened, nothing extracted
    val badDest = tmp("shard_bad")
    intercept[Dump.SchemaMismatchException] {
      Dump.readShardedArchives(spark, archiveDir, badDest,
        expectedSchema = Dump.SchemaSequence + 1)
    }
    assert(new java.io.File(badDest).listFiles().forall(_ => false))
    // round-trip: extracted shards reassemble the full dump
    val dest = tmp("shard_out")
    Dump.readShardedArchives(spark, archiveDir, dest)
    val back = Dump.readTsv(spark, dest, src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }

  test("sharded archives on a file:/// URI archiveDir run the URI control " +
    "plane end to end; a remote scheme is refused loudly, by name, before " +
    "any work (ADVICE r16: the half-URI posture)") {
    val dumpDir = tmp("uri_dump")
    val src = Tables.nation(spark, sfTiny)
    Dump.writeTsv(src.repartition(4), dumpDir)
    // file:/// URI: the ROOT control files ride the Hadoop FS with the
    // URI intact, the per-executor envelope streams get the normalized
    // local form — the whole set round-trips
    val archiveLocal = tmp("uri_arch")
    val archiveUri = s"file://$archiveLocal"
    Dump.writeShardedArchives(spark, dumpDir, archiveUri, shards = 2)
    assert(new java.io.File(s"$archiveLocal/MANIFEST").exists())
    assert(new java.io.File(s"$archiveLocal/shard-0.zip").exists())
    val dest = tmp("uri_out")
    Dump.readShardedArchives(spark, archiveUri, dest)
    val back = Dump.readTsv(spark, dest, src.schema)
    assert(back.count() == src.count())
    // remote scheme: refused with a NAMED error before anything is
    // written — the r16 posture wrote the root manifest to the remote FS
    // and then threw from every executor's local FileOutputStream
    val e = intercept[IllegalArgumentException] {
      Dump.writeShardedArchives(spark, dumpDir, "hdfs://nn/dumps/x")
    }
    assert(e.getMessage.contains("scheme 'hdfs'") &&
      e.getMessage.contains("writeShardedArchives"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Dump.readShardedArchives(spark, "s3a://bucket/dumps/x", dest)
    }
    assert(e2.getMessage.contains("scheme 's3a'"), e2.getMessage)
    intercept[IllegalArgumentException] {
      Dump.writeTarZstArchive(dumpDir, "hdfs://nn/a.tar.zst")
    }
    intercept[IllegalArgumentException] {
      Dump.readArchive("s3a://bucket/a.zip", dest)
    }
  }

  test("a crashed ledger writer leaves either the old or the new complete " +
    "ledger — tmp residue is swept, the chain never restarts (ADVICE r16)") {
    val ledger = tmp("ledger_crash") + "/chain.ledger"
    val out = tmp("ledger_crash_out")
    val df = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val w1 = Dump.incrementalDump(df, "ts", 150L, ledger, out)
    // simulate a writer killed mid-tmp-write: a TORN tmp sibling next to
    // an intact ledger (the only residue the tmp+rename protocol can
    // leave on file://, where the final rename is one atomic replace)
    Files.write(java.nio.file.Paths.get(s"$ledger.tmp-dead1234"),
      "2,15".getBytes("UTF-8"))
    // readers are untouched by the residue
    assert(Dump.readLedger(spark, ledger) == Seq(w1))
    // the next writer sweeps it and appends atomically
    val w2 = Dump.incrementalDump(df, "ts", 300L, ledger, out)
    assert(Dump.readLedger(spark, ledger) == Seq(w1, w2))
    val dir = new java.io.File(ledger).getParentFile
    assert(dir.listFiles().map(_.getName).filter(_.contains(".tmp-")).isEmpty,
      "stale ledger tmp residue must be swept by the next writer")
  }

  test("duplicate members across shards fail loudly, not last-write-wins") {
    val dumpDir = tmp("dupshard_dump")
    Dump.writeTsv(Tables.nation(spark, sfTiny), dumpDir)
    // hand-craft a corrupted shard set: both shards are FULL archives of
    // the same dump (identical member names), with a root manifest whose
    // counts match — only the disjointness check can catch this
    val archiveDir = tmp("dupshard_arch")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(archiveDir))
    Dump.writeArchive(dumpDir, s"$archiveDir/shard-0.zip")
    Dump.writeArchive(dumpDir, s"$archiveDir/shard-1.zip")
    val n = new java.io.File(dumpDir).listFiles().count(_.isFile)
    Files.write(java.nio.file.Paths.get(s"$archiveDir/SCHEMA_SEQUENCE"),
      Dump.SchemaSequence.toString.getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(s"$archiveDir/MANIFEST"),
      s"shard-0.zip,$n\nshard-1.zip,$n".getBytes("UTF-8"))
    val dest = tmp("dupshard_out")
    val e = intercept[Exception] {
      Dump.readShardedArchives(spark, archiveDir, dest)
    }
    assert(e.getMessage.contains("duplicate members"), e.getMessage)
  }

  test("incremental window slice prunes day partitions via dayCol") {
    val ev = Tables.eventsPartitioned(spark, sfTiny)
    val Array(lo, hi) = ev
      .selectExpr("CAST(percentile(unix_micros(ts), 0.25) AS BIGINT)",
        "CAST(percentile(unix_micros(ts), 0.5) AS BIGINT)")
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val slice = Dump.windowSlice(ev, "ts", lo, hi, dayCol = Some("event_day"))
    assert(slice.count() > 0)
    val scanLine = slice.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters"))
    assert(scanLine.exists(_.contains("event_day")),
      s"expected directory-level pruning on event_day, got: $scanLine")
  }

  test("incremental dumps are disjoint and union-complete over the ledger") {
    val ledger = tmp("ledger") + "/ledger.csv"
    val out = tmp("incr_out")
    val ev = Tables.events(spark, sfTiny)
    val Array(mid, hi) = ev
      .selectExpr("CAST(percentile(unix_micros(ts), 0.5) AS BIGINT)",
        "unix_micros(MAX(ts))")
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val w1 = Dump.incrementalDump(ev, "ts", mid, ledger, out)
    val w2 = Dump.incrementalDump(ev, "ts", hi, ledger, out)
    assert(w1.dumpId == 1 && w2.dumpId == 2 && w2.startMicros == mid)
    val schema = ev.select("event_id", "ts", "user_id").schema
    def ids(id: Long) = Dump
      .readTsv(spark, s"$out/dump_$id",
        org.apache.spark.sql.types.StructType(schema.take(1)))
      .select("event_id")
    val n1 = ids(1).count()
    val n2 = ids(2).count()
    assert(n1 > 0 && n2 > 0)
    // disjoint: the two slices share no event; union-complete: together
    // they are exactly the corpus up to the last ledger end
    assert(ids(1).intersect(ids(2)).count() == 0)
    assert(n1 + n2 == ev.count())
    // a third dump must advance the window — same end is refused
    intercept[IllegalArgumentException] {
      Dump.incrementalDump(ev, "ts", hi, ledger, out)
    }
    // readers key on the LEDGER: an orphaned dump directory (the residue
    // of a crash between writeTsv and the ledger append) is invisible
    val idSchema = org.apache.spark.sql.types.StructType(schema.take(1))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(Dump.dumpPath(out, 99)))
    Dump.writeTsv(ev.limit(5).select("event_id"), Dump.dumpPath(out, 99))
    val unioned = Dump.readIncrementalDumps(spark, ledger, out, idSchema)
    assert(unioned.count() == ev.count(),
      "ledger-keyed read-back must ignore orphaned dump directories")
  }

  test("S10: dataset export flattens class -> recordings to annotations") {
    val ds = Seq(("rock", Seq(3L, 1L)), ("jazz", Seq(2L)))
      .toDF("class", "recordings")
    val ann = Dump.datasetAnnotations(ds).as[(String, Long)].collect().toSeq
    assert(ann == Seq(("jazz", 2L), ("rock", 1L), ("rock", 3L)))
  }
}
