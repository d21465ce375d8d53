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

  /** MinHash signature: element j is min over shingles of md5(j || ':' || s).
    * A fixed family of `numHashes` deterministic hash functions. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(shingles,
        s => md5(concat(j.cast(StringType), lit(":"), s)))))

  /** LSH band keys: md5 of each `rows`-wide slice of the signature.
    * Two documents are candidates iff they share any band key. */
  def bandKeys(signature: Column, bands: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => md5(array_join(slice(signature, b * rows + 1, lit(rows)), "|")))

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
