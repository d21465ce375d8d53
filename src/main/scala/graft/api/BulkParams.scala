package graft.api

/** Request-side parsing of the bulk lookup grammar (reference §3.1 step 2:
  * `webserver/views/api/v1/core.py:184-254`): `recording_ids` is a
  * `;`-separated list of `<mbid>[:<offset>]` items. Parsing is driver-side
  * (a request param, not data), but the semantics mirror
  * `_parse_bulk_params` / `_validate_arguments` exactly:
  *
  *  - an EMPTY mbid is silently skipped, even with an offset (`';;'` or
  *    `':5'` contribute nothing — core.py:240-241);
  *  - more than one `:` in an item is a hard reject (core.py:247);
  *  - the mbid accepts every form Python's `uuid.UUID` does — uppercase,
  *    braces, `urn:uuid:` prefix, missing/odd hyphen placement — and is
  *    normalised to canonical lower-case hyphenated form (core.py:197-200);
  *    an unparseable mbid is a hard reject;
  *  - a missing, empty, or non-numeric offset becomes 0; negative offsets
  *    clamp to 0 (core.py:202-211 — `int('')` never happens because empty
  *    strings are falsy);
  *  - order-preserving dedup over the full (original, normalised, offset)
  *    tuple (core.py:253-254), then the fan-in cap of
  *    [[MaxItemsPerBulkRequest]].
  *
  * The parsed pairs become the broadcast key set of a semi join
  * (`p2_keyset_lookup`) — the API layer never loops per key.
  */
object BulkParams {

  /** Reference MAX_ITEMS_PER_BULK_REQUEST (core.py:24). */
  val MaxItemsPerBulkRequest = 25

  /** One parsed request item: the mbid exactly as the client sent it, its
    * normalised form, and the resolved offset (reference
    * `_validate_arguments` returns the same triple). */
  final case class Item(original: String, mbid: String, offset: Int)

  sealed trait Result
  final case class Parsed(items: Seq[Item]) extends Result
  final case class Invalid(reason: String) extends Result

  /** Parse and validate; mirrors `_parse_bulk_params`. */
  def parse(param: String): Result = {
    val parsed = param.split(";", -1).toSeq.flatMap { recording =>
      recording.split(":", -1).toSeq match {
        case Seq(mbid) if mbid.isEmpty => None // silently skipped
        case Seq(mbid) => Some(validateArguments(mbid, None))
        case Seq(mbid, _) if mbid.isEmpty => None // skipped even with offset
        case Seq(mbid, off) => Some(validateArguments(mbid, Some(off)))
        case _ => Some(Left(s"More than 1 colon (:) in '$recording'"))
      }
    }
    parsed.collectFirst { case Left(err) => Invalid(err) }.getOrElse {
      // order-preserving dedup over the full triple (core.py:253-254)
      val items = parsed.collect { case Right(p) => p }.distinct
      if (items.size > MaxItemsPerBulkRequest)
        Invalid(s"too many items: ${items.size} > $MaxItemsPerBulkRequest")
      else Parsed(items)
    }
  }

  /** `{original: normalised}` for every item the client did not send in
    * canonical form — the response's `mbid_mapping` (core.py:172-181). */
  def mbidMapping(items: Seq[Item]): Map[String, String] =
    items.collect { case Item(o, m, _) if o != m => o -> m }.toMap

  /** Mirrors `_validate_arguments` (core.py:184-211). */
  private def validateArguments(
      mbid: String, offset: Option[String]): Either[String, Item] =
    normalizeUuid(mbid) match {
      case None => Left(s"'$mbid' is not a valid UUID")
      case Some(norm) =>
        // `if offset:` — None and '' both fall through to 0; a non-numeric
        // offset becomes 0; negatives clamp to 0. Python's int() is
        // unbounded and allows digit-group underscores, so parse as BigInt
        // (an offset above Int.MaxValue must stay huge — it matches no
        // stored document — not wrap to 0 and serve the offset-0 doc);
        // anything beyond Int range clamps to Int.MaxValue, which is
        // equally unmatchable.
        val off = offset.filter(_.nonEmpty)
          .flatMap(parsePythonInt)
          .map(n => n.max(BigInt(0)).min(BigInt(Int.MaxValue)).toInt)
          .getOrElse(0)
        Right(Item(mbid, norm, off))
    }

  private val PyIntRe = "^[+-]?[0-9](?:_?[0-9])*$".r

  /** Python `int(str)`: surrounding whitespace tolerated, optional sign,
    * single underscores allowed between digits, unbounded magnitude. */
  private def parsePythonInt(s: String): Option[BigInt] = {
    val t = s.trim
    if (PyIntRe.findFirstIn(t).isEmpty) None
    else Some(BigInt(t.replace("_", "")))
  }

  private val AsciiHex = "0123456789abcdefABCDEF".toSet

  /** Python `str(uuid.UUID(x))`: strip `urn:`/`uuid:` prefixes and
    * surrounding braces, drop hyphens wherever they were, require exactly
    * 32 hex digits, re-emit canonical lower-case hyphenated form. ASCII
    * hex only: `Character.digit` would also accept Unicode digits (e.g.
    * fullwidth ０) and emit them verbatim into the "canonical" form,
    * whereas Python re-encodes through the integer back to ASCII. */
  private def normalizeUuid(s: String): Option[String] = {
    val hex = s.replace("urn:", "").replace("uuid:", "")
      .dropWhile(c => c == '{' || c == '}')
      .reverse.dropWhile(c => c == '{' || c == '}').reverse
      .replace("-", "")
    if (hex.length == 32 && hex.forall(AsciiHex.contains)) {
      val h = hex.toLowerCase
      Some(s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
        s"${h.substring(16, 20)}-${h.substring(20)}")
    } else None
  }
}
