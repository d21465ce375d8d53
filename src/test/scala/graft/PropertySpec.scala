package graft

import graft.functions.HashFunctions
import graft.multimodal.BinaryColumns
import graft.operators.Skew
import graft.plans.{HammingDistance, SimHash64Impl}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen

/** Property-based invariants (SURVEY §5 test plan): pure-function laws run
  * wide via ScalaCheck generators (sampled manually — the scalatest/
  * scalacheck bridge isn't in the offline dep cache); Spark-evaluated
  * properties batch their generated cases into one DataFrame per test to
  * keep job count low. */
class PropertySpec extends SparkSpec {

  /** Sample a generator n times (retrying empty samples). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(_ => g.sample)
  import spark.implicits._

  private val bitString: Gen[String] =
    Gen.listOfN(64, Gen.oneOf('0', '1')).map(_.mkString)

  test("Chunked.chunkId: bounded in [0, maxChunks], monotone in v, for " +
    "any observed range; non-identifier names rejected at the call site") {
    import graft.operators.Chunked
    val ranges: Gen[(Long, Long)] = for {
      lo <- Gen.chooseNum(-1000000000000L, 1000000000000L)
      span <- Gen.chooseNum(0L, 2000000000000L)
    } yield (lo, lo + span)
    val cases = samples(ranges, 60).flatMap { case (lo, hi) =>
      // probe the range edges + interior points
      val vs = Seq(lo, hi, lo + (hi - lo) / 2, lo + (hi - lo) / 3,
        hi - (hi - lo) / 7).distinct
      vs.map(v => (v, lo, hi))
    }
    val got = cases.toDF("v", "lo", "hi")
      .withColumn("id", Chunked.chunkId("v", "lo", "hi"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for ((v, lo, hi, id) <- got)
      assert(id >= 0 && id <= Chunked.MaxChunks,
        s"chunkId($v in [$lo,$hi]) = $id out of [0, ${Chunked.MaxChunks}]")
    // monotone: within one range, higher v never gets a lower chunk
    for (((_, lo, hi), group) <- got.groupBy(t => (0, t._2, t._3))) {
      val sorted = group.sortBy(_._1)
      assert(sorted.map(_._4).sliding(2).forall(
        p => p.length < 2 || p(0) <= p(1)),
        s"chunkId not monotone on [$lo,$hi]: ${sorted.mkString(",")}")
    }
    // ADVICE r12: raw-string interpolation rejects non-identifiers HERE
    intercept[IllegalArgumentException](Chunked.chunkId("v; DROP", "lo", "hi"))
    intercept[IllegalArgumentException](Chunked.chunkId("v", "a.b", "hi"))
  }

  test("hamming_distance is a metric on bit strings") {
    def h(x: String, y: String) =
      HammingDistance.hamming(UTF8String.fromString(x), UTF8String.fromString(y))
    for (Seq(a, b, c) <- samples(Gen.listOfN(3, bitString), 200)) {
      assert(h(a, a) == 0)
      assert(h(a, b) == h(b, a))
      assert(h(a, c) <= h(a, b) + h(b, c)) // triangle inequality
      assert(h(a, b) == a.zip(b).count(p => p._1 != p._2))
    }
  }

  test("simhash64 of one token is that token's hash bits; order-invariant sums") {
    def sim(ts: Seq[String]): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hexes = ts.map(t => md.digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
      SimHash64Impl.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          hexes.map(UTF8String.fromString).toArray)).toString
    }
    val tokLists = samples(
      Gen.listOfN(5, Gen.alphaNumStr.suchThat(_.nonEmpty)), 100)
    for (toks <- tokLists) {
      // permutation invariance: simhash is a sum over tokens
      assert(sim(toks) == sim(toks.reverse))
    }
  }

  test("pairCombos emits exactly the ordered pairs of its input") {
    val lists = samples(
      Gen.chooseNum(0, 6).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(0L, 50L)).map(_.distinct.sorted)), 40)
    val df = lists.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("row_id", "ids")
    val got = df.select(col("row_id"),
        explode(HashFunctions.pairCombos(col("ids"))).as("p"))
      .select(col("row_id"), col("p.doc_a"), col("p.doc_b"))
      .as[(Long, Long, Long)].collect().toSet
    val want = lists.zipWithIndex.flatMap { case (l, i) =>
      for (a <- l; b <- l if a < b) yield (i.toLong, a, b)
    }.toSet
    assert(got == want)
  }

  test("jaccardPairs is id-representation-free: ids above 2^32 work") {
    // the same corpus under two id assignments — small ids and ids offset
    // past 2^32 (the old packed-long key's hard cap) — must yield the same
    // pair structure with the same jaccard scores
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "a completely different document about spark engines",
      "the quick brown fox jumps over the lazy dog today",
      "a completely different document about spark engines too")
    val off = (1L << 40) + 7
    def framed(offset: Long) =
      texts.zipWithIndex.map { case (t, i) => (i + offset, t) }
        .toDF("doc_id", "text")
        .select(col("doc_id"),
          HashFunctions.wordShingles(col("text"), 3).as("sh"))
    def pairs(offset: Long): Set[(Long, Long, Long, Double)] =
      graft.operators.DedupPack.jaccardPairs(framed(offset))
        .as[(Long, Long, Long, Double)].collect()
        .map { case (a, b, s, j) => (a - offset, b - offset, s, j) }.toSet
    val small = pairs(0L)
    assert(small.nonEmpty, "fixture should produce at least one near-dup pair")
    assert(pairs(off) == small)
  }

  test("jaccardPairs drops a posting above MaxShingleDf — the pair-" +
    "explosion guard the 8x scale-smoke measured") {
    // one shingle shared by cap+1 documents (quadratic pair mass if
    // generated: (cap+1)·cap/2 pairs) and one shared by exactly two:
    // the hot posting must be dropped wholesale, the cold one must pair
    import graft.operators.DedupPack
    val hotN = DedupPack.MaxShingleDf + 1
    val rows = (1 to hotN).map(i => (i.toLong, Seq("hot shingle only"))) ++
      Seq((2000001L, Seq("cold pair shingle")),
        (2000002L, Seq("cold pair shingle")))
    val sh = rows.toDF("doc_id", "sh")
    val got = DedupPack.jaccardPairs(sh)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((2000001L, 2000002L)),
      s"expected only the cold pair, got ${got.size} pairs")
  }

  test("wordShingles: n-gram count, distinctness, and short-text fallback") {
    val texts = samples(Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "cc", "ddd"))
        .map(_.mkString(" "))), 60)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("row_id", "text")
    val got = df.select(col("row_id"),
        HashFunctions.wordShingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect()
    for ((i, sh) <- got) {
      val toks = texts(i.toInt).split("\\s+").toSeq
      if (toks.length >= 3) {
        val want = toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
        assert(sh == want, s"text '${texts(i.toInt)}'")
      } else assert(sh == Seq(texts(i.toInt)), "short-text fallback")
    }
  }

  test("ingest is idempotent: re-ingesting an ingested batch adds nothing") {
    val batch = Seq(
      ("g1", "p1", 1), ("g1", "p2", 2), ("g2", "p1", 1), ("g2", "p1", 3))
      .toDF("gid", "payload", "submitted")
    val first = ingest.Ingest.ingestBatch(
      batch.withColumn("submission_offset", lit(0L)).filter(lit(false)), batch)
    val again = ingest.Ingest.ingestBatch(first, batch)
    assert(again.count() == 0)
  }

  test("salted aggregation equals the direct aggregation bit-for-bit") {
    // skewed input: 90% of rows share one key
    val skewed = Tables.lineitem(spark, sfTiny)
      .withColumn("k", when(col("l_orderkey") % 10 =!= 0, lit(0L))
        .otherwise(col("l_orderkey")))
    val salted = Skew.saltedSumCount(skewed, col("k"), col("l_quantity"),
        col("l_orderkey") * 100 + col("l_linenumber"), 16)
      .orderBy("key").collect().map(_.toString).toSeq
    val direct = skewed.groupBy(col("k").as("key"))
      .agg(Exprs.dsum(col("l_quantity")).as("total"), count(lit(1)).as("n"))
      .orderBy("key").collect().map(_.toString).toSeq
    assert(salted == direct)
  }

  test("salt-replicated skew join equals the plain join and keys the hot " +
    "slice on (key, salt) with no broadcast") {
    // the many-rows-per-key regime j13's broadcast variant can't serve:
    // auto-broadcast disabled, no explicit broadcast anywhere — the hot
    // keys spread over salt buckets instead
    val ev = Tables.events(spark, sfTiny)
    val cust = Tables.customer(spark, sfTiny)
    def sel(df: DataFrame) = df
      .select("event_id", "user_id", "c_name").orderBy("event_id")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plain = sel(ev.join(cust, col("user_id") === col("c_custkey")))
        .collect()
      val split = sel(Skew.saltReplicatedJoin(ev, cust, col("user_id"),
        col("c_custkey"), col("event_id"), k = 16, buckets = 4,
        hotKeys = Some(Seq("3", "7"))))
      val got = split.collect()
      assert(got.nonEmpty && got.sameElements(plain))
      val plan = split.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"salt variant must not broadcast:\n$plan")
      assert(plan.contains("_fsalt"),
        s"hot join not keyed on the salt:\n$plan")
      // the shipped MG-driven form is equally invisible
      val mg = sel(Skew.saltReplicatedJoin(ev, cust, col("user_id"),
        col("c_custkey"), col("event_id"), k = 4, buckets = 4)).collect()
      assert(mg.sameElements(plain))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("frequentKeys honors the Misra-Gries guarantee on a skewed column") {
    // 90% of rows share one synthetic hot key; the rest keep their source
    val docs = Tables.documents(spark, sfTiny)
      .withColumn("sk", when(col("doc_id") % 10 =!= 0, lit("hot"))
        .otherwise(col("source")))
      .repartition(8)
    val n = docs.count()
    val k = 4
    val got = Skew.frequentKeys(docs, col("sk"), k)
      .as[(String, Long)].collect().toMap
    assert(got.size <= k)
    val exact = docs.groupBy(col("sk")).count()
      .as[(String, Long)].collect().toMap
    // every true heavy hitter (freq > n/k) MUST be present — and the
    // constructed column guarantees at least one exists
    val heavies = exact.filter(_._2 > n / k).keys.toSeq
    assert(heavies.contains("hot"))
    heavies.foreach { key =>
      assert(got.contains(key), s"missing heavy hitter $key")
    }
    // reported counts are lower bounds within n/k of the truth
    got.foreach { case (key, lb) =>
      val t = exact(key)
      assert(lb <= t && t - lb <= n / k + 1,
        s"$key: lb=$lb true=$t n/k=${n / k}")
    }
    // a column with a single value reports it exactly: no decrements fire
    val one = Skew.frequentKeys(docs.withColumn("c", lit("x")), col("c"), 2)
      .as[(String, Long)].collect()
    assert(one.toSeq == Seq(("x", n)))
  }

  test("exact integer cube root: the double-cbrt + CASE-adjust chain " +
    "equals the BigInt floor cube root on perfect cubes, their " +
    "neighbours, and wide random-ish values") {
    // the adaptive DOULION threshold K = ⌊(C·m²)^⅓⌋ hinges on this chain
    // being EXACT where a bare floor(cbrt(double)) is off by one — k³±1
    // and the doubles nearest huge cubes are precisely those boundaries
    val ks = (1L to 60L).map(k => k * k * k) ++
      Seq(7L, 26L, 28L, 63L, 65L, 999L, 1000L, 1001L) ++
      (1 to 60).map(i => (1L << 40) + i * 2654435761L) ++
      (30 to 55).flatMap { b =>
        val k = 1L << b; Seq(k * 7 - 1, k * 7, k * 7 + 1) }
    val cases = ks.distinct.map(x => Tuple1(BigDecimal(x)))
    val got = cases.toDF("x")
      .select(col("x").cast("decimal(38,0)").as("x"))
      .withColumn("c0", expr(operators.GraphPack.CbrtCandidateSql))
      .withColumn("k", expr(operators.GraphPack.IcbrtCaseSql))
      .select("x", "k").collect()
    for (r <- got) {
      val x = BigInt(r.getDecimal(0).toBigInteger)
      val k = r.getLong(1)
      assert(BigInt(k).pow(3) <= x && BigInt(k + 1).pow(3) > x,
        s"icbrt($x) = $k is not the floor cube root")
    }
    assert(got.length == ks.distinct.length)
  }

  test("ulp-boundary quantization golden: the engine's decimal-grid " +
    "rounding of the committed boundary-hunting set is byte-stable") {
    // The round-11 tolerance-class audit (BASELINE.md "Known cross-engine
    // tolerance class") is prose; this is its measuring gate. The value
    // set deliberately HUNTS the rounding boundaries the class lives on:
    // for each k, the double nearest (k+0.5)·1e-9 (the DECIMAL(38,9)
    // half-grid) and (k+0.5)·1e-6 (the round(·,6) grid), plus 1 and 2
    // ulp steps either side — 10 probes per k, 2000 values. The engine
    // half pins Spark's quantization of every probe against the
    // committed golden (regenerate: GRAFT_REGEN_ULP_GOLDEN=1); the
    // DuckDB half is tools/tolerance_probe.py, which replays the SAME
    // bit-exact doubles (keyed by IEEE bits, col 2) through DuckDB's
    // CAST/round and measures the cross-engine divergence — accepted
    // only while max divergence <= 1 unit in the last published digit.
    val values: Seq[(String, Double)] = (1 to 200).flatMap { k =>
      def steps(base: Double, tag: String): Seq[(String, Double)] = {
        val up1 = Math.nextUp(base); val up2 = Math.nextUp(up1)
        val dn1 = Math.nextDown(base); val dn2 = Math.nextDown(dn1)
        Seq(s"$tag:$k:0" -> base, s"$tag:$k:+1" -> up1,
          s"$tag:$k:+2" -> up2, s"$tag:$k:-1" -> dn1, s"$tag:$k:-2" -> dn2)
      }
      steps((k + 0.5) * 1e-9, "d9") ++ steps((k + 0.5) * 1e-6, "r6")
    }
    val got = values.toDF("name", "x")
      .select(col("name"),
        // reflect returns a STRING — cast to bigint before hex, or hex()
        // encodes the decimal digits' bytes instead of the IEEE bits
        lpad(lower(hex(expr("cast(reflect('java.lang.Double', " +
          "'doubleToLongBits', x) as bigint)"))), 16, "0").as("bits"),
        col("x").cast("decimal(38,9)").cast("string").as("dec9"),
        round(col("x"), 6).cast("string").as("round6"))
      .orderBy("name").collect()
      .map(r => s"${r.getString(0)}\t${r.getString(1)}\t" +
        s"${r.getString(2)}\t${r.getString(3)}")
    val goldenPath = java.nio.file.Paths
      .get("src/test/resources/ulp_quant_golden.tsv")
    if (sys.env.contains("GRAFT_REGEN_ULP_GOLDEN")) {
      java.nio.file.Files.writeString(goldenPath,
        "# name\tieee_bits_hex\tcast_decimal_38_9\tround_6 — engine\n" +
        "# quantization of the ulp-boundary probe set (PropertySpec);\n" +
        "# cross-engine half: tools/tolerance_probe.py\n" +
        got.mkString("\n") + "\n")
      info(s"golden regenerated: ${got.length} probes")
    } else {
      import scala.jdk.CollectionConverters._
      assert(java.nio.file.Files.exists(goldenPath),
        s"missing $goldenPath — regenerate with GRAFT_REGEN_ULP_GOLDEN=1")
      val pinned = java.nio.file.Files.readAllLines(goldenPath).asScala
        .filterNot(l => l.startsWith("#") || l.isBlank).toSeq
      assert(pinned.size == got.length,
        s"golden has ${pinned.size} rows, engine produced ${got.length}")
      val diffs = pinned.zip(got).filter { case (p, g) => p != g }
      assert(diffs.isEmpty,
        s"engine quantization drifted from the committed golden " +
          s"(first: ${diffs.headOption})")
    }
  }

  test("frame sampling of an empty payload emits zero frames") {
    val media = Seq((1L, Array.empty[Byte])).toDF("media_id", "payload")
      .withColumn("n_bytes", lit(0L))
    assert(BinaryColumns.sampleFrames(media, 32, 1).count() == 0)
  }

  test("frame sampling covers the payload with the configured stride") {
    val media = BinaryColumns.withPayload(
      Tables.documents(spark, sfTiny).limit(50), "doc_id", "text")
    val frames = BinaryColumns.sampleFrames(media, frameBytes = 32, everyK = 2)
    // LEFT join from media so a payload with wrongly-zero frames is a
    // violation (coalesce to 0), not a silently-excluded row
    val byId = media.select(col("media_id"), col("n_bytes"))
      .join(frames.groupBy("media_id")
        .agg(count(lit(1)).as("n"), max(col("frame_bytes")).as("mx")),
        Seq("media_id"), "left")
    // every k-th frame of ceil(n_bytes/32) total frames
    val bad = byId.filter(
      coalesce(col("n"), lit(0L)) =!=
        ceil(ceil(col("n_bytes") / 32.0) / 2.0).cast("long") ||
      coalesce(col("mx"), lit(0L)) > 32)
    assert(bad.count() == 0)
  }
}
