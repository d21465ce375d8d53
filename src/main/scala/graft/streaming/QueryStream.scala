package graft.streaming

import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.SimilarityPack
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming k-NN serving — the reference's similarity API surface
  * (webserver/views/api/v1/similarity.py:84-103: per-request neighbour
  * lookups against the prebuilt Annoy index) re-expressed as a stream of
  * query vectors served from the persisted IVF index artifact.
  *
  * Shape: the STREAM side is only the arriving queries; the corpus, its
  * cell assignments and the trained centroids are static artifacts
  * ([[graft.sim.IndexStore]]) loaded once and broadcast per batch — the
  * stream never scans or shuffles the corpus, so serving scales with
  * request rate alone, independent of corpus size.
  *
  * Each micro-batch is served through [[SimilarityPack.cellTopk]] — the
  * SAME code the batch `ann_kmeans_indexed` query runs, so stream/batch
  * parity holds by construction (pinned in StreamingSpec). `foreachBatch`
  * rather than a streaming aggregation because per-query ranking is a
  * window over the candidate set: not expressible as an incremental
  * streaming agg, and it must not be one — ranking state is bounded by
  * the micro-batch, never carried across batches. Queries in different
  * micro-batches are independent lookups, so any batch split yields the
  * same union of results.
  */
object QueryStream {

  /** Serve one micro-batch of query vectors (vec_id, embedding float[])
    * with top-k neighbours from the persisted trained-IVF index of the
    * corpus at `dir`: assign each query to its nearest trained centroid
    * (K-row broadcast), then exact-cosine-rank only that cell's members.
    * Output: (query_id, cell, rank, neighbor_id) — the batch serving
    * contract. */
  def serveBatch(s: SparkSession, dir: String, batch: DataFrame,
      k: Int): DataFrame = {
    val p = SimilarityPack.ensureKmeansIndex(s, dir)
    val cents = s.read.parquet(s"$p/centroids")
    val assign = s.read.parquet(s"$p/assignments")
    val corpus = assign.join(
      Tables.embeddings(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v")),
      Seq("vec_id"))
    val q = SimilarityPack.assignCells(
      batch.select(col("vec_id"), asDouble(col("embedding")).as("v")),
      cents)
    SimilarityPack.cellTopk(corpus, k, _ => q)
  }

  /** Serve one micro-batch from the PRODUCTION-tuned IVF artifact
    * (multi-probe: each query scores the saved centroids and exact-ranks
    * its nprobe best cells' saved members). Unlike [[serveBatch]]'s
    * single-cell kmeans path, this is the serving shape of the headline
    * `ann_tuned_indexed` index — and it never touches the corpus: both
    * artifact members are read as-is, so cost scales with request rate
    * and cell size, not corpus size. Output: (query_id, rank,
    * neighbor_id), the bulk-lookup contract. */
  def serveTunedBatch(s: SparkSession, dir: String,
      batch: DataFrame): DataFrame =
    SimilarityPack.tunedServeVectors(s, dir, batch)

  /** Serve one micro-batch of request ids from the persisted IVF-PQ
    * index — [[serveTunedBatch]] at the compressed-candidate memory
    * point (16-byte codes scanned through the per-query ADC lookup
    * table, exact re-rank of the shortlist only). The third member of
    * the serving family on streams: single-cell kmeans
    * ([[serveBatch]]), multi-probe tuned IVF ([[serveTunedBatch]]),
    * and IVF-PQ — all through the SAME `*TopkFor` cores their batch
    * oracle rows pin, so stream/batch parity is by construction. */
  def servePqBatch(s: SparkSession, dir: String,
      batch: DataFrame): DataFrame =
    SimilarityPack.ivfPqTopkFor(s, dir, batch.select(col("vec_id")))

  /** The FULL request pipeline on a stream of parsed requests — the
    * deployment form of `n4_serve_composed`: each micro-batch of
    * (vec_id) request rows runs artifact-served top-K → n_neighbours
    * clamp → threshold → submission-dedup through the SAME
    * [[SimilarityPack.composedServeAt]] core the oracle row pins, with
    * the artifact resolved ONCE at gate construction (the resolve-once
    * contract every ingest gate honors). Requests in different
    * micro-batches are independent lookups, so any batch split yields
    * the same union of results (pinned in StreamingSpec). */
  def composedGate(s: SparkSession, dir: String,
      prm: graft.api.IndexParams.Params = SimilarityPack.ComposedDefaultParams)
      : DataFrame => DataFrame = {
    val p = SimilarityPack.ensureTunedIndex(s, dir)
    batch => SimilarityPack.composedServeAt(s, p,
      batch.select(col("vec_id")), prm)
  }
}
