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
  *
  * Performance note — let-binding via `transform(array(x), v => body)`:
  * Catalyst's CollapseProject inlines a projected expression into every
  * reference site, so an expression like `element_at(split(text), i)` used k
  * times re-runs the regex split k times per row (measured 20× slowdown on
  * the shingle pipeline). Wrapping the shared subexpression in a 1-element
  * array and referencing it as a lambda variable forces single evaluation —
  * the higher-order-function equivalent of a `let`.
  */
object HashFunctions {

  /** Number of md5 evaluations per shingle backing the minhash family. */
  val MinhashMd5s = 4

  /** Evaluate `body(x)` with `x` bound once — see class doc. */
  def bindArray(x: Column, body: Column => Column): Column =
    element_at(transform(array(x), body), 1)

  /** Distinct word n-gram shingles of a document (fallback: whole text when
    * shorter than n tokens). The token array is let-bound so the regex split
    * runs once per document, not once per element_at. */
  def wordShingles(text: Column, n: Int): Column =
    bindArray(split(text, TextFunctions.WsRe), t =>
      array_distinct(
        when(size(t) >= n,
          transform(sequence(lit(1), size(t) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(k => element_at(t, i + k)): _*)))
          .otherwise(array(text))))

  /** 128 hex chars of deterministic hash material per shingle: four md5s of
    * domain-separated copies of the shingle. Sliced into 16 eight-hex-char
    * (32-bit) values, this yields 16 independent hash functions from only
    * 4 md5 evaluations — the md5 is the hot operation in minhash signature
    * computation. Domain separators are `"<j>:"` (digit + colon), which no
    * separator is a prefix of another's material since the colon never
    * appears in another prefix position — unlike bare `'a'`/`'b'` prefixes,
    * `"1:" + g` can never equal `"0:" + g2` for shingles g, g2.
    * Lexicographic min over fixed-width lowercase-hex slices equals numeric
    * min, so `min(substring(...))` is a valid minhash aggregate; 32-bit
    * slices keep the per-hash collision odds ~n/2^32 — negligible even for
    * documents with millions of distinct shingles.
    *
    * Computed by the native `md5x4` expression (graft.plans.Md5x4):
    * byte-identical to `concat(md5('0:'||s), …, md5('3:'||s))` but with one
    * reused digest and no intermediate allocations — the shingle stream is
    * the widest point of the pipeline. */
  def hashMaterial(shingle: Column): Column = call_function("md5x4", shingle)

  /** The `numHashes` minhash aggregate expressions over a `hashMaterial`
    * column: element j is `min(hex32(h, j*8))` — each 8-hex slice parsed to
    * a long by the native hex32 expression so the 16 mins run as one
    * codegen'd fixed-width HashAggregate. (min(string) fell back to an
    * interpreted SortAggregate; the built-in `conv` parse was ~20% slower
    * than the sort — the native byte-loop parse beats both.) Numeric min
    * over the parsed value equals lexicographic min over the fixed-width
    * hex slice, so signature semantics are unchanged; the DuckDB oracle
    * mirrors with min(CAST('0x' || substring(...) AS BIGINT)). */
  def minhashAggs(h: Column, numHashes: Int): Seq[Column] = {
    require(numHashes * 8 <= MinhashMd5s * 32, s"$numHashes hashes need more md5 material")
    (0 until numHashes).map(j =>
      min(call_function("hex32", h, lit(j * 8))).as(s"m$j"))
  }

  /** LSH band keys from the signature columns `m0..`: md5 of each
    * `rows`-wide group joined with '|'. Uses NULL-propagating `concat` (not
    * `concat_ws`, which silently skips NULLs): a document with a NULL
    * signature gets NULL band keys — same as the SQL `||` operator — instead
    * of silently colliding with every other NULL-signature document. Two
    * documents are candidates iff they share a non-NULL band key. */
  def bandKeyCols(bands: Int, rows: Int): Seq[Column] =
    (0 until bands).map { b =>
      val parts = (0 until rows).flatMap { r =>
        // explicit string cast: signature slices are longs (hex32) and
        // concat needs homogeneous string args; matches DuckDB's implicit
        // BIGINT || VARCHAR cast in the oracle
        val c = col(s"m${b * rows + r}").cast(StringType)
        if (r == 0) Seq(c) else Seq(lit("|"), c)
      }
      md5(concat(parts: _*))
    }

  /** All ordered pairs (a < b) from a sorted array — local candidate-pair
    * generation inside an LSH bucket / inverted-index posting list. Keeping
    * pair expansion bucket-local (after a groupBy) instead of a self-join
    * means the signature subtree is computed once, not once per join side.
    * Callers must cap the list size (bucket/document-frequency cap) — an
    * uncapped hot bucket materializes O(k²) structs in one row. */
  def pairCombos(sortedIds: Column): Column =
    flatten(transform(sortedIds, (x, i) =>
      transform(slice(sortedIds, i + 2, size(sortedIds)),
        y => struct(x.as("doc_a"), y.as("doc_b")))))

  /** 64-bit SimHash of the document's tokens as a '0'/'1' bit string
    * (MSB-first per MD5 hex digit). Bit i is set when the sum over tokens of
    * (bit_i(md5(token)) * 2 - 1) is positive.
    *
    * The per-token md5 stays a built-in expression; the 64-bit majority
    * vote is the engine's native `simhash64` expression
    * (graft.plans.SimHash64, registered via SparkSessionExtensions) — a
    * codegen'd byte loop. The pure-built-in formulation (a 64-step
    * higher-order aggregate) evaluated interpreted at ~0.8 ms/document,
    * which made signature computation the dedup pipeline's hot spot. */
  def simhashBits(text: Column): Column =
    call_function("simhash64", transform(split(text, TextFunctions.WsRe), t => md5(t)))
}
