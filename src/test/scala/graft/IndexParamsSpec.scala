package graft

import graft.api.IndexParams
import org.scalatest.funsuite.AnyFunSuite

/** Similarity-query parameter validation (reference `_check_index_params`,
  * similarity.py:70-111): defaults, clamps, and the single hard reject. */
class IndexParamsSpec extends AnyFunSuite {

  test("unknown metric is the only hard reject") {
    assert(IndexParams.check("nope").isLeft)
    assert(IndexParams.check("mfccs").isRight)
  }

  test("everything else defaults: angular, 10 trees, 200 neighbours, none") {
    val Right(p) = IndexParams.check("bpm",
      distanceType = Some("euclidean"), nTrees = Some("50"),
      nNeighbours = Some("abc"), threshold = Some(""),
      removeDups = Some("bogus"))
    assert(p == IndexParams.Params("bpm", "angular", 10, 200, None, "none"))
  }

  test("neighbour count clamps to [1, 1000], huge values included") {
    def nn(s: String) =
      IndexParams.check("key", nNeighbours = Some(s)).toOption.get.nNeighbours
    assert(nn("0") == 1 && nn("-5") == 1 && nn("17") == 17)
    assert(nn("5000") == 1000)
    assert(nn("99999999999999999999") == 1000) // Python int is unbounded
  }

  test("threshold clamps to [0,1] — the API range, not angular's [0,2]") {
    def th(s: String) =
      IndexParams.check("key", threshold = Some(s)).toOption.get.threshold
    assert(th("0.5").contains(0.5))
    assert(th("1.38").contains(1.0)) // similarity.py:97-98
    assert(th("-0.2").contains(0.0))
    assert(th("junk").isEmpty) // unparseable → None → no filtering
  }

  test("remove_dups: case-insensitive membership, default none") {
    def rd(s: String) =
      IndexParams.check("key", removeDups = Some(s)).toOption.get.removeDups
    assert(rd("SameScore") == "samescore" && rd("ALL") == "all")
    assert(rd("everything") == "none")
  }
}
