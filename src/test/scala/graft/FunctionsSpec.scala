package graft

import graft.functions.{HashFunctions, TextFunctions, VectorFunctions}
import graft.multimodal.BinaryColumns
import org.apache.spark.sql.functions._

/** Unit-level behavior of the expression library on known inputs. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("text functions on a known sentence") {
    val df = Seq("the quick brown fox the end").toDF("text")
    val row = df.select(
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.distinctTokenCount($"text").as("d"),
      TextFunctions.wordSetCount($"text", Seq("the")).as("s")).collect()(0)
    assert(row.getLong(0) == 6 && row.getLong(1) == 5 && row.getLong(2) == 2)
  }

  test("tokenization ignores leading/trailing whitespace and empty text") {
    val rows = Seq("  hello   world  ", "", "   ").toDF("text")
      .select(TextFunctions.tokenCount($"text")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 0L, 0L))
  }

  test("shingle fingerprint is stable and order-sensitive") {
    val fp = (t: String) => Seq(t).toDF("text")
      .select(TextFunctions.shingleFingerprint($"text", 8)).collect()(0).getString(0)
    assert(fp("hello world hello") == fp("hello world hello"))
    // disjoint shingle sets → different minima
    assert(fp("aaaa bbbb cccc dddd") != fp("wwww xxxx yyyy zzzz"))
  }

  test("simhash of near-identical docs differs in few bits") {
    val sh = (t: String) => Seq(t).toDF("text")
      .select(HashFunctions.simhashBits($"text")).collect()(0).getString(0)
    val a = sh("spark window join filter scan merge sort table row column")
    val b = sh("spark window join filter scan merge sort table row group")
    val c = sh("completely different words entirely unrelated content here now")
    def ham(x: String, y: String) = x.zip(y).count(p => p._1 != p._2)
    assert(a.length == 64)
    assert(ham(a, b) < ham(a, c))
  }

  test("vector dot/cosine/angular on known vectors") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(2.0, 0.0)))
      .toDF("a", "b", "c")
    val r = df.select(
      VectorFunctions.dot($"a", $"c").as("dac"),
      VectorFunctions.cosine($"a", $"b").as("orth"),
      VectorFunctions.cosine($"a", $"c").as("par"),
      VectorFunctions.angularDistance($"a", $"b").as("ang")).collect()(0)
    assert(r.getDouble(0) == 2.0)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - math.sqrt(2.0)) < 1e-12)
  }

  test("LSH hyperplanes are deterministic and bucket identical vectors together") {
    val hp1 = VectorFunctions.lshHyperplanes(8, 4)
    val hp2 = VectorFunctions.lshHyperplanes(8, 4)
    assert(hp1 == hp2)
    val df = Seq((Seq(1.0, 2.0, 3.0, 4.0), Seq(1.0, 2.0, 3.0, 4.0)))
      .toDF("a", "b")
    val r = df.select(
      VectorFunctions.lshBucket($"a", hp1).as("ba"),
      VectorFunctions.lshBucket($"b", hp1).as("bb")).collect()(0)
    assert(r.getString(0) == r.getString(1) && r.getString(0).length == 8)
  }

  test("native hamming_distance matches a reference implementation") {
    val df = Seq(
      ("0000", "0000", 0), ("0000", "1111", 4), ("0101", "0110", 2),
      ("abc", "abd", 1), ("ab", "abcd", 2)).toDF("a", "b", "want")
    // registered via GraftExtensions (SQL + call_function path)
    val got = df.select(call_function("hamming_distance", $"a", $"b").as("h"),
      $"want").collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // interpreted path (no codegen) must agree
    val e = graft.plans.HammingDistance
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(e.hamming(u("0101"), u("0110")) == 2)
    // null propagation
    val nulls = Seq((null.asInstanceOf[String], "x")).toDF("a", "b")
      .select(call_function("hamming_distance", $"a", $"b")).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("native md5x4 is byte-identical to the built-in 4-md5 concat") {
    val df = Seq("hello world", "", "a b c", "ünïcödé").toDF("s")
    val builtin = concat((0 until 4).map(j =>
      md5(concat(lit(s"$j:"), $"s"))): _*)
    val rows = df.select(call_function("md5x4", $"s").as("native"),
      builtin.as("builtin")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
    assert(rows.head.getString(0).length == 128)
  }

  test("native hex32 parses slices like conv and nulls invalid input") {
    val df = Seq(("0000001adeadbeef", 0), ("0000001ADEADBEEF", 8),
      ("xyz", 0), ("ab", 0)).toDF("h", "off")
    val got = df.select(call_function("hex32", $"h", $"off")).collect()
    assert(got(0).getLong(0) == 26L)
    assert(got(1).getLong(0) == 0xdeadbeefL)
    assert(got(2).isNullAt(0) && got(3).isNullAt(0))
  }

  test("native vec_dot equals the higher-order fold") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val fold = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val r = df.select(call_function("vec_dot", $"a", $"b"), fold).collect()(0)
    assert(r.getDouble(0) == 32.0 && r.getDouble(1) == 32.0)
  }

  test("native grid_dot is bit-identical to the DECIMAL(38,0) fold, " +
    "including long-overflow accumulations") {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val g = 600000000L // the 1e-9 grid bound (|val| < 0.6)
    val rnd = new scala.util.Random(17)
    def vec(n: Int) = Seq.fill(n)(rnd.nextLong() % g)
    val cases: Seq[(Seq[Long], Seq[Long])] = Seq(
      (vec(64), vec(64)),
      (vec(5), vec(5)),
      // all max-magnitude same sign: 64·(6e8)² ≈ 2.3e19 > Long.MaxValue —
      // forces the BigInteger promotion branch
      (Seq.fill(64)(g), Seq.fill(64)(g)),
      (Seq.fill(64)(-g), Seq.fill(64)(g)),
      // sign-alternating around the overflow boundary
      (Seq.tabulate(64)(i => if (i % 2 == 0) g else -g), Seq.fill(64)(g)),
      (Seq.empty[Long], Seq.empty[Long]))
    // (mismatched lengths are excluded: zip_with null-pads them into a
    // null fold while grid_dot takes the shorter prefix — grid vectors
    // are equal-length by construction, where the two agree)
    val df = cases.toDF("a", "b")
    val fold = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0).cast(DecimalType(38, 0)),
      (acc, x) => (acc + x.cast(DecimalType(38, 0))).cast(DecimalType(38, 0)))
      .cast(DoubleType)
    val rows = df.select(call_function("grid_dot", $"a", $"b"), fold).collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"grid_dot forked from the decimal fold on $c: " +
          s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
    // the overflow case is non-vacuous: the exact sum exceeds Long range
    assert(BigInt(g) * g * 64 > BigInt(Long.MaxValue))
  }

  test("WAV/BMP codecs round-trip header fields through real bytes") {
    val docs = Tables.documents(spark, sfTiny).limit(20)
    val wav = BinaryColumns.decodeWav(spark,
      BinaryColumns.wavPayload(docs, "doc_id", "text")).collect()
    assert(wav.length == 20)
    for (m <- wav) {
      assert(m.sample_rate == 8000 + (m.media_id % 5) * 4000, m)
      assert(m.channels == 1 + m.media_id % 2, m)
      assert(m.bits == 16 && m.duration_ms >= 0, m)
    }
    val bmp = BinaryColumns.decodeBmp(spark,
      BinaryColumns.bmpPayload(docs, "doc_id", "text")).collect()
    assert(bmp.length == 20)
    for (m <- bmp) {
      assert(m.width == 1 + m.media_id % 640, m)
      assert(m.height == 1 + m.media_id % 480, m)
      assert(m.bpp == 24 && m.img_bytes >= 0, m)
    }
  }

  test("undecodable payloads emit the sentinel row, not a task failure") {
    import spark.implicits._
    val junk = Seq((1L, "not a riff header at all"), (2L, ""))
      .toDF("doc_id", "text")
    val wav = BinaryColumns.decodeWav(spark,
      BinaryColumns.withPayload(junk, "doc_id", "text")).collect()
    assert(wav.forall(m => m.duration_ms == -1 && m.sample_rate == 0))
    val bmp = BinaryColumns.decodeBmp(spark,
      BinaryColumns.withPayload(junk, "doc_id", "text")).collect()
    assert(bmp.forall(m => m.img_bytes == -1 && m.width == 0))
  }
}
