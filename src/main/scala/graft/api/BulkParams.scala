package graft.api

/** Request-side parsing of the bulk lookup grammar (reference §3.1 step 2:
  * `webserver/views/api/v1/core.py:184-281`): `recording_ids` is a
  * `;`-separated list of `<uuid>[:<offset>]` items. Parsing is driver-side
  * (a request param, not data), but the semantics mirror the reference
  * exactly: UUIDs lower-cased and format-checked, offsets coerced to
  * non-negative ints (invalid → reject), order-preserving dedup, and a
  * fan-in cap of [[MaxItemsPerBulkRequest]] items.
  *
  * The parsed pairs become the broadcast key set of a semi join
  * (`p2_keyset_lookup`) — the API layer never loops per key.
  */
object BulkParams {

  /** Reference MAX_ITEMS_PER_BULK_REQUEST (core.py:24). */
  val MaxItemsPerBulkRequest = 25

  private val UuidRe =
    "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r

  sealed trait Result
  final case class Parsed(items: Seq[(String, Int)]) extends Result
  final case class Invalid(reason: String) extends Result

  /** Parse and validate; mirrors `_parse_bulk_params`. */
  def parse(param: String): Result = {
    val raw = param.split(";").map(_.trim).filter(_.nonEmpty)
    val parsed = raw.map { item =>
      item.split(":", -1).toSeq match {
        case Seq(id) => parseOne(id, "0")
        case Seq(id, off) => parseOne(id, off)
        case _ => Left(s"invalid item: $item")
      }
    }
    parsed.collectFirst { case Left(err) => Invalid(err) }.getOrElse {
      // order-preserving dedup (reference core.py:253-254)
      val items = parsed.collect { case Right(p) => p }.distinct
      if (items.size > MaxItemsPerBulkRequest)
        Invalid(s"too many items: ${items.size} > $MaxItemsPerBulkRequest")
      else Parsed(items)
    }
  }

  private def parseOne(id: String, off: String): Either[String, (String, Int)] = {
    val norm = id.toLowerCase
    if (UuidRe.findFirstIn(norm).isEmpty) Left(s"invalid uuid: $id")
    else off.toIntOption match {
      case Some(n) => Right((norm, math.max(0, n))) // clamp like core.py:207
      case None => Left(s"invalid offset: $off")
    }
  }
}
