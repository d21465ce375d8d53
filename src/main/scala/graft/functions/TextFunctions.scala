package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, fingerprinting.
  *
  * All of these are pure Catalyst expressions (higher-order array functions,
  * no UDFs) so they stay inside whole-stage codegen and scale linearly with
  * executors — per-row work, no shuffle.
  */
object TextFunctions {

  /** Whitespace tokenization. Empty tokens are dropped: a regex split
    * keeps a leading empty string for text with leading whitespace and
    * yields [""] for empty text, which would inflate token counts and
    * deflate every ratio built on them. Mirrored in the DuckDB oracles via
    * list_filter(..., x -> x <> ''). */
  /** The tokenizer whitespace class, EXPLICIT on both engines: Java
    * regex `\\s` includes U+000B (vertical tab) but RE2's `\\s` does
    * not, so a bare `\\s+` silently tokenizes differently in Spark and
    * DuckDB on any document containing a vertical tab — invisible at
    * gate scale (the fixtures carry none), certain in scraped corpora.
    * This class IS Java's `\\s` set, spelled out; [[WsReSql]] is the
    * RE2 spelling every oracle uses. */
  val WsRe = "[ \\t\\n\\u000B\\f\\r]+"

  /** RE2 spelling of [[WsRe]] for the DuckDB oracles. */
  val WsReSql = "[ \\t\\n\\x0b\\f\\r]+"

  def tokens(text: Column): Column =
    filter(split(text, WsRe), t => t =!= "")

  /** Token count (whitespace). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** Distinct-token count. */
  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast(LongType)

  /** BPE-ish token estimate: ~4 chars per subword token, the common
    * rule-of-thumb used when a real tokenizer is too expensive in-flight. */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text) / 4.0).cast(LongType)

  /** Number of tokens found in `words` (exact token match). */
  def wordSetCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(typedLit(words), t)))
      .cast(LongType)

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Stopword ratio — a standard document-quality signal. The token array
    * is let-bound (HashFunctions.bindArray) so the regex split runs once
    * per row, not once for the numerator and again for the denominator
    * (the CollapseProject re-evaluation documented on HashFunctions). */
  def stopwordRatio(text: Column): Column =
    HashFunctions.bindArray(tokens(text), toks =>
      size(filter(toks, t => array_contains(typedLit(EnglishStopwords), t)))
        .cast(LongType) / size(toks).cast(LongType))

  /** Mean token length in characters. */
  def meanTokenLength(text: Column): Column =
    length(regexp_replace(text, WsRe, "")) / tokenCount(text).cast(DoubleType)

  /** Deterministic MD5 fingerprint: the minimum MD5 over all `k`-char
    * shingles of the document (a 1-permutation MinHash — order-invariant,
    * robust to small edits at the ends). Computed per-row with no explode. */
  def shingleFingerprint(text: Column, k: Int): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => md5(text.substr(i, lit(k)))))

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Deterministic priority order breaks ties. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "is", "and", "of"),
    "de" -> Seq("der", "und", "ist", "das"),
    "es" -> Seq("el", "la", "es", "de"),
    "fr" -> Seq("le", "la", "est", "et"),
    "zh" -> Seq("de", "shi", "le", "he"))

  /** Language-ID heuristic: argmax of marker-word counts with fixed
    * priority tie-break (first language in `LangMarkers` wins ties).
    *
    * Both the token array and the per-language count array are let-bound
    * (HashFunctions.bindArray): the CASE chain references each count up to
    * |languages| times, and without binding Catalyst would re-run the
    * regex split + filter at every reference site — ~14 splits per row. */
  def langGuess(text: Column): Column =
    HashFunctions.bindArray(tokens(text), toks => {
      val countArr = array(LangMarkers.map { case (_, words) =>
        size(filter(toks, t => array_contains(typedLit(words), t)))
          .cast(LongType)
      }: _*)
      HashFunctions.bindArray(countArr, cs => {
        val counts = LangMarkers.zipWithIndex.map { case ((lang, _), i) =>
          lang -> element_at(cs, i + 1)
        }
        // CASE WHEN c_en >= all others THEN 'en' WHEN c_de >= rest ...:
        // if a language's count is >= every later language's count it is
        // the argmax among the remaining candidates (earlier = higher tie
        // priority).
        val exprs = counts.zipWithIndex.map { case ((lang, c), i) =>
          val laterCounts = counts.drop(i + 1).map(_._2)
          val cond = laterCounts.foldLeft(lit(true))((acc, o) => acc && c >= o)
          (cond, lang)
        }
        exprs.dropRight(1).foldRight(lit(exprs.last._2): Column) {
          case ((cond, lang), acc) => when(cond, lit(lang)).otherwise(acc)
        }
      })
    })
}
