package graft

import graft.ingest.Ingest
import org.apache.spark.sql.functions._

/** Submission-ingest pipeline semantics (reference §3.2: dedup, offsets,
  * cap, validation — db/data.py:114-288). */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(String, String, Int)]) =
    rows.toDF("gid", "payload", "submitted")

  private val empty = frame(Seq.empty)
    .withColumn("submission_offset", lit(0L)).filter(lit(false))

  test("canonical JSON + sha256 match Python json.dumps sort_keys golden") {
    // golden: python3 json.dumps({'b':'x','a':1,'c':[1,2],'d':{'z':True,
    // 'y':'u'}}, sort_keys=True, separators=(',',':')) → sha256
    val df = Seq((1L, "x", Seq(1L, 2L), ("u", true)))
      .toDF("a", "b", "c", "d")
      .select(struct($"a", $"b", $"c",
        $"d".cast("struct<y:string,z:boolean>").as("d")).as("payload"))
    val schema = df.schema("payload").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val out = df.select(
      Ingest.canonicalJson($"payload", schema).as("canon"),
      Ingest.contentHash(Ingest.canonicalJson($"payload", schema)).as("h"))
      .collect()(0)
    assert(out.getString(0) ==
      """{"a":1,"b":"x","c":[1,2],"d":{"y":"u","z":true}}""")
    assert(out.getString(1) ==
      "4859732872295bf143d94e384748020bcd734955594631426af3134500556ce9")
    // field order of the INPUT struct must not matter
    val shuffled = Seq((("u", true), "x", 1L, Seq(1L, 2L)))
      .toDF("d", "b", "a", "c")
      .select(struct($"d".cast("struct<y:string,z:boolean>").as("d"),
        $"b", $"a", $"c").as("payload"))
    val schema2 = shuffled.schema("payload").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(shuffled.select(Ingest.canonicalJson($"payload", schema2))
      .collect()(0).getString(0) == out.getString(0))
    // …and the payload need not share the SCHEMA's field order either:
    // alignment is by name (a positional struct cast would silently emit
    // a=d's value here). Same bytes under the ORIGINAL schema.
    assert(shuffled.select(Ingest.canonicalJson($"payload", schema))
      .collect()(0).getString(0) == out.getString(0))
  }

  test("canonical JSON sorts MAP keys too, matching Python sort_keys") {
    // golden: json.dumps({'tags':{'zz key':['2'],'a':['1'],'m':['x','y']},
    // 'id':7}, sort_keys=True, separators=(',',':')) → sha256
    val df = Seq("""{"tags":{"zz key":["2"],"a":["1"],"m":["x","y"]},"id":7}""")
      .toDF("raw")
      .select(from_json($"raw",
        org.apache.spark.sql.types.DataType.fromDDL(
          "struct<id: bigint, tags: map<string, array<string>>>"))
        .as("payload"))
    val schema = df.schema("payload").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val out = df.select(
      Ingest.canonicalJson($"payload", schema).as("canon"),
      Ingest.contentHash(Ingest.canonicalJson($"payload", schema)).as("h"))
      .collect()(0)
    assert(out.getString(0) ==
      """{"id":7,"tags":{"a":["1"],"m":["x","y"],"zz key":["2"]}}""")
    assert(out.getString(1) ==
      "bf7feb1a9b0f62f282a4b3395fad6ba2f0f4bacff7a9b55dcabbca9321839d21")
  }

  test("canonical JSON floats and unicode match Python repr + ensure_ascii") {
    // golden: json.dumps({'a':0.1,'b':1e16,'c':-0.0001,'d':[1.5,44100.0,
    // 2.5e-09,0.0],'e':12345678.0,'f':'café — emoji \U0001F600'},
    // sort_keys=True, separators=(',',':')) → sha256. Exercises the three
    // divergences the native expression closes: shortest-round-trip float
    // repr with Python's fixed/exponential switch points (Java flips to E
    // notation at 1e7 — 'e' pins that), ensure_ascii \uXXXX escapes incl.
    // a surrogate pair, and ".0" on integral doubles.
    val df = Seq((0.1, 1e16, -0.0001, Seq(1.5, 44100.0, 2.5e-09, 0.0),
        12345678.0, "café — emoji 😀"))
      .toDF("a", "b", "c", "d", "e", "f")
      .select(struct($"a", $"b", $"c", $"d", $"e", $"f").as("payload"))
    val schema = df.schema("payload").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val out = df.select(
      Ingest.canonicalJson($"payload", schema).as("canon"),
      Ingest.contentHash(Ingest.canonicalJson($"payload", schema)).as("h"))
      .collect()(0)
    assert(out.getString(0) ==
      "{\"a\":0.1,\"b\":1e+16,\"c\":-0.0001," +
        "\"d\":[1.5,44100.0,2.5e-09,0.0],\"e\":12345678.0," +
        "\"f\":\"caf\\u00e9 \\u2014 emoji \\ud83d\\ude00\"}")
    assert(out.getString(1) ==
      "fc4f8b10e8f975e0364f8decffe8209e378ad11aac7fcf6adeb135871f732a1d")
  }

  test("raw canonical JSON hashes the REAL reference fixtures to Python bytes") {
    // goldens: sha256(json.dumps(json.load(f), sort_keys=True,
    // separators=(',',':')).encode()) over the reference's own test
    // documents (db/test_data/) — the full Essentia low-level document
    // (50,959 canonical bytes, mixed int/float arrays in
    // tonal.chords_histogram et al.) and the high-level document. This is
    // the EXACT dedup-key computation of db/data.py:250-257.
    val fixtures = Seq(
      ("/root/reference/db/test_data/" +
        "0dad432b-16cc-4bf0-8961-fd31d124b01b.json",
        "8a8a8795100536a93e42b564c93955e62c08f3d31d0ed49da0abdd0098ac1cbb"),
      ("/root/reference/db/test_data/" +
        "0dad432b-16cc-4bf0-8961-fd31d124b01b_highlevel.json",
        "9e719e135218a4b0c9e381ab28d33978264d059fbedfb3fa03959df2036d3734"))
    for ((path, want) <- fixtures) {
      val raw = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      val got = Seq(raw).toDF("raw")
        .select(Ingest.contentHash(Ingest.canonicalJsonString($"raw")))
        .collect()(0).getString(0)
      assert(got == want, s"fixture $path canonical hash diverged")
    }
  }

  test("raw canonical JSON accepts CPython's non-finite literals") {
    // CPython json.load accepts NaN/Infinity/-Infinity by default and
    // json.dumps re-emits them (allow_nan=True) — a submission the
    // reference parses and dedup-hashes must round-trip here too. Golden:
    // sha256(json.dumps(json.loads(doc), sort_keys=True,
    // separators=(',',':')).encode()) from CPython.
    val doc = """{"a":NaN,"b":[Infinity,-Infinity],"c":1.5}"""
    val out = Seq(doc).toDF("raw").select(
      Ingest.canonicalJsonString($"raw").as("canon"),
      Ingest.contentHash(Ingest.canonicalJsonString($"raw")).as("h"))
      .collect()(0)
    assert(out.getString(0) == doc)
    assert(out.getString(1) ==
      "0bd32f2b1b381f121b036655c16174346f89f3d5df2282a05284c53e04918490")
  }

  test("exact duplicates within a batch are dropped, earliest kept") {
    val in = frame(Seq(("g1", "doc-a", 1), ("g1", "doc-a", 2), ("g1", "doc-b", 3)))
    val out = Ingest.ingestBatch(empty, in)
    assert(out.count() == 2)
    assert(out.filter($"payload" === "doc-a").select("submitted")
      .collect()(0).getInt(0) == 1)
  }

  test("duplicates against the existing table are dropped") {
    val existing = frame(Seq(("g1", "doc-a", 1)))
      .withColumn("submission_offset", lit(0L))
    val in = frame(Seq(("g1", "doc-a", 5), ("g1", "doc-c", 6)))
    val out = Ingest.ingestBatch(existing, in)
    assert(out.select("payload").as[String].collect().toSeq == Seq("doc-c"))
  }

  test("offsets are dense per gid and continue from the existing max") {
    val existing = frame(Seq(("g1", "old-1", 1), ("g1", "old-2", 2)))
      .withColumn("submission_offset",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("gid").orderBy("submitted")).cast("long") - 1)
    val in = frame(Seq(("g1", "new-1", 10), ("g1", "new-2", 11), ("g2", "x", 1)))
    val out = Ingest.ingestBatch(existing, in)
    val g1 = out.filter($"gid" === "g1").orderBy("submission_offset")
      .select("submission_offset").as[Long].collect().toSeq
    assert(g1 == Seq(2L, 3L))
    val g2 = out.filter($"gid" === "g2")
      .select("submission_offset").as[Long].collect().toSeq
    assert(g2 == Seq(0L))
  }

  test("duplicate-submission cap rejects offsets beyond the limit") {
    val in = frame((1 to 15).map(i => ("g1", s"doc-$i", i)))
    val out = Ingest.ingestBatch(empty, in)
    assert(out.count() == Ingest.MaxDuplicateSubmissions)
    assert(out.agg(max("submission_offset")).collect()(0).getLong(0) ==
      Ingest.MaxDuplicateSubmissions - 1)
  }

  test("binary sha1 matches the reference digest (F2: hl_calc.py:161-169)") {
    // golden: python3 hashlib.sha1(b'abc').hexdigest()
    val out = Seq("abc").toDF("payload")
      .select(Ingest.binarySha1($"payload".cast("binary")))
      .collect()(0).getString(0)
    assert(out == "a9993e364706816aba3e25717850c26c9cd0d89d")
  }

  test("validation flags missing required fields with a reason") {
    val in = Seq(("g1", "p", "2024"), (null, "p", "2024"), ("g2", null, "2024"))
      .toDF("gid", "payload", "submitted")
    val v = Ingest.validate(in, Seq("gid", "payload"))
    assert(v.filter($"valid").count() == 1)
    assert(v.filter($"reject_reason" === "missing:gid").count() == 1)
    assert(v.filter($"reject_reason" === "missing:payload").count() == 1)
  }
}
