package graft

import graft.api.BulkParams
import graft.api.BulkParams.{Invalid, Item, Parsed}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The bulk-request grammar (reference core.py:184-254), including the
  * ScalaCheck grammar round-trip planned in SURVEY §5. */
class BulkParamsSpec extends AnyFunSuite {

  private val U1 = "0dad432b-16cc-4bf0-8961-fd31d124b01b"
  private val U2 = "e8afe383-1478-497e-90b1-7885c7f37f6e"

  test("parses items, normalizes case, defaults and clamps offsets") {
    val r = BulkParams.parse(s"${U1.toUpperCase};$U2:3;$U2:-7")
    assert(r == Parsed(Seq(
      Item(U1.toUpperCase, U1, 0), Item(U2, U2, 3), Item(U2, U2, 0))))
  }

  test("order-preserving dedup keeps first occurrence") {
    val r = BulkParams.parse(s"$U2:1;$U1;$U2:1;$U1:0")
    assert(r == Parsed(Seq(Item(U2, U2, 1), Item(U1, U1, 0))))
  }

  test("accepts every uuid.UUID-parseable form, normalised (core.py:197-200)") {
    val forms = Seq(
      U1.toUpperCase,
      U1.replace("-", ""),                   // no hyphens
      s"{$U1}")                              // braces
    for (f <- forms)
      assert(BulkParams.parse(f) == Parsed(Seq(Item(f, U1, 0))), f)
    // the urn:uuid: form is uuid.UUID-parseable but NOT reachable through
    // the bulk grammar — its two colons trip the >1-colon reject first,
    // exactly as in the reference (core.py:247)
    assert(BulkParams.parse(s"urn:uuid:$U1").isInstanceOf[BulkParams.Invalid])
    // non-canonical originals surface in mbid_mapping; canonical ones don't
    val Parsed(items) = BulkParams.parse(s"${U1.toUpperCase};$U2")
    assert(BulkParams.mbidMapping(items) == Map(U1.toUpperCase -> U1))
  }

  test("invalid/empty offsets coerce to 0; empty mbids are skipped") {
    // `if offset:` — '' is falsy, so 'uuid:' (trailing colon) is offset 0,
    // and a non-numeric offset is 0, NOT a reject (core.py:202-211)
    assert(BulkParams.parse(s"$U1:") == Parsed(Seq(Item(U1, U1, 0))))
    assert(BulkParams.parse(s"$U1:xyz") == Parsed(Seq(Item(U1, U1, 0))))
    // empty mbid is silently skipped even with an offset (core.py:240-241)
    assert(BulkParams.parse(s";;:5;$U1:2") == Parsed(Seq(Item(U1, U1, 2))))
    assert(BulkParams.parse("") == Parsed(Seq()))
  }

  test("offset parsing follows Python int(): unbounded, underscores, no unicode") {
    // beyond Int range stays huge-and-unmatchable (clamped to Int.MaxValue),
    // NOT wrapped to 0 — wrapping would serve the offset-0 document
    assert(BulkParams.parse(s"$U1:2147483648") ==
      Parsed(Seq(Item(U1, U1, Int.MaxValue))))
    // Python int() accepts single underscores between digits
    assert(BulkParams.parse(s"$U1:1_0") == Parsed(Seq(Item(U1, U1, 10))))
    // a fullwidth Unicode digit is not ASCII hex → mbid reject (stricter
    // than Python, which re-encodes through the integer; documented)
    assert(BulkParams.parse("０" + U1.substring(1))
      .isInstanceOf[Invalid])
  }

  test("rejects malformed uuids, double colons, and oversized requests") {
    assert(BulkParams.parse("not-a-uuid").isInstanceOf[Invalid])
    assert(BulkParams.parse(s" $U1").isInstanceOf[Invalid]) // space ≠ uuid
    assert(BulkParams.parse(s"$U1::").isInstanceOf[Invalid]) // >1 colon
    val many = (0 until 26).map(i => f"$U1%.24s${i}%012d").mkString(";")
    assert(BulkParams.parse(many).isInstanceOf[Invalid])
  }

  test("grammar round-trip: any generated request parses back to its items") {
    val hex = Gen.listOfN(12, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
    val uuid = hex.map(h => s"${h.take(8)}-${h.take(4)}-${h.take(4)}-${h.take(4)}-$h")
    val item = for {
      u <- uuid
      off <- Gen.chooseNum(0, 99)
      withOff <- Gen.oneOf(true, false)
    } yield (u, if (withOff) off else 0, withOff)
    val requests = Gen.listOfN(8, item)
    for (items <- (1 to 50).flatMap(_ => requests.sample)) {
      val param = items.map { case (u, o, w) => if (w) s"$u:$o" else u }
        .mkString(";")
      val want = {
        val seen = scala.collection.mutable.LinkedHashSet[Item]()
        items.foreach { case (u, o, _) => seen += Item(u, u, o) }
        seen.toSeq
      }
      assert(BulkParams.parse(param) == Parsed(want), param)
    }
  }
}
