package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hashing / sketching column functions for near-duplicate detection:
  * word shingles, MinHash signatures, LSH band keys, SimHash.
  *
  * All deterministic (MD5-keyed, no RNG) so results are reproducible across
  * runs, engines and cluster sizes — the property the reference relies on for
  * its sha256-based exact dedup (reference: db/data.py:250-257) carried over
  * to approximate dedup. Pure Catalyst higher-order expressions: signatures
  * are computed per-row with no shuffle; only the candidate-pair join is wide.
  */
object HashFunctions {

  /** Distinct word n-gram shingles of a document (fallback: whole text when
    * shorter than n tokens). */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(text, "\\s+")
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array(text)))
  }

  /** 96 hex chars of deterministic hash material per shingle: three md5s of
    * domain-separated copies of the shingle. Sliced into 16 six-hex-char
    * (24-bit) values, this yields 16 independent hash functions from only
    * 3 md5 evaluations — the md5 is the hot operation in minhash signature
    * computation, so this is a 5× cut versus one md5 per hash function.
    * Lexicographic min over fixed-width lowercase-hex slices equals numeric
    * min, so `min(substring(...))` is a valid minhash aggregate. */
  def hashMaterial(shingle: Column): Column =
    concat(md5(shingle),
      md5(concat(lit("a"), shingle)),
      md5(concat(lit("b"), shingle)))

  /** The `numHashes` minhash aggregate expressions over a `hashMaterial`
    * column: element j is `min(substring(h, j*6+1, 6))`. Used as codegen'd
    * hash-aggregate functions (groupBy(doc).agg(...)), which evaluates the
    * hash material exactly once per shingle — nesting the same computation
    * inside `transform` lambdas instead re-evaluates the md5 tree once per
    * lambda invocation after projection collapse. */
  def minhashAggs(h: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(j => min(substring(h, j * 6 + 1, 6)).as(s"m$j"))

  /** LSH band keys from the 16 signature columns `m0..m15`: md5 of each
    * `rows`-wide group joined with '|'. Two documents are candidates iff
    * they share any band key. */
  def bandKeyCols(bands: Int, rows: Int): Seq[Column] =
    (0 until bands).map(b =>
      md5(concat_ws("|", (0 until rows).map(r => col(s"m${b * rows + r}")): _*)))

  /** All ordered pairs (a < b) from a sorted array — local candidate-pair
    * generation inside an LSH bucket / inverted-index posting list. Keeping
    * pair expansion bucket-local (after a groupBy) instead of a self-join
    * means the signature subtree is computed once, not once per join side. */
  def pairCombos(sortedIds: Column): Column =
    flatten(transform(sortedIds, (x, i) =>
      transform(slice(sortedIds, i + 2, size(sortedIds)),
        y => struct(x.as("doc_a"), y.as("doc_b")))))

  /** 64-bit SimHash of the document's tokens as a '0'/'1' bit string
    * (MSB-first per MD5 hex digit). Bit i is set when the sum over tokens of
    * (bit_i(md5(token)) * 2 - 1) is positive. */
  def simhashBits(text: Column): Column = {
    val hashes = transform(split(text, "\\s+"), t => md5(t))
    val bits = transform(sequence(lit(0), lit(63)), i => {
      val digitPos = (floor(i / 4) + 1).cast(IntegerType)
      val contrib = (h: Column) => {
        val digit = conv(h.substr(digitPos, lit(1)), 16, 10).cast(LongType)
        val bit = floor(digit / pow(lit(2), lit(3) - pmod(i, lit(4))))
          .cast(LongType) % 2
        bit * 2 - 1
      }
      when(aggregate(hashes, lit(0L), (acc, h) => acc + contrib(h)) > 0,
        lit("1")).otherwise(lit("0"))
    })
    array_join(bits, "")
  }
}
