package graft

import graft.api.BulkParams
import graft.api.BulkParams.{Invalid, Parsed}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The bulk-request grammar (reference core.py:184-281), including the
  * ScalaCheck grammar round-trip planned in SURVEY §5. */
class BulkParamsSpec extends AnyFunSuite {

  private val U1 = "0dad432b-16cc-4bf0-8961-fd31d124b01b"
  private val U2 = "e8afe383-1478-497e-90b1-7885c7f37f6e"

  test("parses items, normalizes case, defaults and clamps offsets") {
    val r = BulkParams.parse(s"${U1.toUpperCase}; $U2:3 ;$U2:-7")
    assert(r == Parsed(Seq((U1, 0), (U2, 3), (U2, 0))))
  }

  test("order-preserving dedup keeps first occurrence") {
    val r = BulkParams.parse(s"$U2:1;$U1;$U2:1;$U1:0")
    assert(r == Parsed(Seq((U2, 1), (U1, 0))))
  }

  test("rejects malformed uuids, offsets, and oversized requests") {
    assert(BulkParams.parse("not-a-uuid").isInstanceOf[Invalid])
    assert(BulkParams.parse(s"$U1:xyz").isInstanceOf[Invalid])
    // trailing colon = empty offset = invalid (reference int('') raises)
    assert(BulkParams.parse(s"$U1:").isInstanceOf[Invalid])
    assert(BulkParams.parse(s"$U1::").isInstanceOf[Invalid])
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
        val seen = scala.collection.mutable.LinkedHashSet[(String, Int)]()
        items.foreach { case (u, o, _) => seen += ((u, o)) }
        seen.toSeq
      }
      assert(BulkParams.parse(param) == Parsed(want), param)
    }
  }
}
