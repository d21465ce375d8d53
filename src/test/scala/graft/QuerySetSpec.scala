package graft

import graft.api.BulkParams
import graft.operators.SimilarityPack
import org.apache.spark.sql.functions._

/** Parameterized ANN query sets: the reference's similarity API serves
  * arbitrary bulk lookup lists (api/v1/similarity.py:114-185); here the
  * whole ANN/top-K family takes an injected query frame, and the
  * oracle-gated entries are ONE instantiation of that path (the fixed
  * ids < 10 set). */
class QuerySetSpec extends SparkSpec {
  import spark.implicits._

  private def mbidOf(i: Long): String = f"00000000-0000-4000-8000-$i%012d"

  test("the oracle-gated default set is one instantiation of topkFor") {
    val ids = (0L until 10L).toDF("vec_id")
    val fixed = SparkEntry.queries("n4_topk_cosine")(spark, sfTiny)
      .collect().map(_.toString).toSeq
    val injected = SimilarityPack.topkFor(spark, sfTiny, ids)
      .collect().map(_.toString).toSeq
    assert(injected == fixed)
  }

  test("index-served bulk lookups honor arbitrary query frames too") {
    val ids = (0L until 10L).toDF("vec_id")
    // fixed-set instantiation matches the oracle-gated served entries …
    assert(SimilarityPack.indexedTopkFor(spark, sfTiny, ids)
      .collect().map(_.toString).toSeq ==
      SparkEntry.queries("ann_tuned_indexed")(spark, sfTiny)
        .collect().map(_.toString).toSeq)
    assert(SimilarityPack.ivfPqTopkFor(spark, sfTiny, ids)
      .collect().map(_.toString).toSeq ==
      SparkEntry.queries("ann_ivfpq_indexed")(spark, sfTiny)
        .collect().map(_.toString).toSeq)
    // … and an arbitrary set serves the full per-query contract
    val req = Seq(123L, 404L).toDF("vec_id")
    val out = SimilarityPack.indexedTopkFor(spark, sfTiny, req)
    assert(out.select("query_id").distinct().as[Long].collect().toSet ==
      Set(123L, 404L))
    assert(out.count() == 20)
    // an empty request is a valid request: zero rows, no failure
    val none = spark.emptyDataset[Long].toDF("vec_id")
    assert(SimilarityPack.topkFor(spark, sfTiny, none).count() == 0)
    assert(SimilarityPack.indexedTopkFor(spark, sfTiny, none).count() == 0)
  }

  test("composed serving honors every remove_dups mode and threshold=None") {
    import graft.api.IndexParams
    val ids = Seq(5L, 23L, 77L, 311L).toDF("vec_id")
    def prm(rd: String, th: Option[String], nn: String = "7") =
      IndexParams.check("mfccs",
        nNeighbours = Some(nn), threshold = th, removeDups = Some(rd))
        .toOption.get
    def rows(rd: String, th: Option[String]) =
      SimilarityPack.composedServe(spark, sfTiny, ids, prm(rd, th))
        .collect().map(_.toString).toSeq
    val none = rows("none", Some("0.61"))
    val same = rows("samescore", Some("0.61"))
    val all = rows("all", Some("0.61"))
    // the oracle-gated entry IS the `all` instantiation
    assert(all == SparkEntry.queries("n4_serve_composed")(spark, sfTiny)
      .collect().map(_.toString).toSeq)
    // dedup strength ordering: none ⊇ samescore ⊇ all, strict at the
    // fixture for `all` (a same-recording pair inside top-7) and every
    // mode's rows are a subset of `none`'s
    assert(none.size >= same.size && same.size >= all.size)
    assert(all.size < none.size, "`all` dedup never fired")
    assert(same.toSet.subsetOf(none.toSet) && all.toSet.subsetOf(none.toSet))
    // threshold=None disables distance filtering entirely (reference
    // :33-35): with no threshold the capped serve passes 7 rows/query
    val unfiltered = rows("none", None)
    assert(unfiltered.size == 4 * 7)
    assert(none.size < unfiltered.size, "threshold never filtered")
    // the n_neighbours clamp is REAL above the exact-contract 10: a
    // 50-neighbour request serves more than 10 per query (bounded only
    // by the probed-cells candidate pool, like the reference index —
    // the regression was a silent truncation at 10)
    val wide = SimilarityPack
      .composedServe(spark, sfTiny, ids, prm("none", None, nn = "50"))
      .groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(wide.nonEmpty && wide.values.forall(_ > 10),
      s"wide request still truncated at 10: $wide")
    assert(wide.values.forall(_ <= 50))
  }

  test("a BulkParams-parsed request drives an arbitrary bulk top-K") {
    // the reference's recording_ids param shape: `mbid`, `mbid:offset`,
    // duplicates dropped order-preserving (core.py:253-254)
    val want = Seq(17L, 42L, 255L, 311L)
    val param = s"${mbidOf(17)};${mbidOf(42)}:1;${mbidOf(255)};" +
      s"${mbidOf(17)};${mbidOf(311)}:0"
    val items = BulkParams.parse(param) match {
      case BulkParams.Parsed(it) => it
      case BulkParams.Invalid(r) => fail(s"parse failed: $r")
    }
    // deployments resolve mbids through their recording dimension; the
    // lookup is a broadcast join, never a collect
    val dim = (0L until 500L).map(i => (mbidOf(i), i)).toDF("mbid", "vec_id")
    val req = items.map(_.mbid).toDF("mbid")
      .join(broadcast(dim), Seq("mbid"))
      .select("vec_id")
    val out = SimilarityPack.topkFor(spark, sfTiny, req)
    assert(out.select("query_id").distinct().as[Long].collect().toSet ==
      want.toSet)
    // full contract per query: 10 neighbours, ranks 1..10
    val perQuery = out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .collect()
    assert(perQuery.forall(r => r.getLong(1) == 10 &&
      r.getLong(2) == 1 && r.getLong(3) == 10))
    // and a query id never appears among its own neighbours
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
  }
}
