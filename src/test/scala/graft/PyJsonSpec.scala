package graft

import graft.plans.PyJson

/** CPython `repr(float)` parity of the native canonical-JSON formatter
  * (graft.plans.PyJson) — the byte-level contract behind the reference's
  * sha256 dedup keys (db/data.py:250-257). Cases are (IEEE-754 bit
  * pattern, CPython 3 repr) pairs, generated from CPython itself; the last
  * four are values where Java's half-UP `%.Ne` formatting diverges from
  * C's half-even correctly-rounded conversion (caught by a 200k-case
  * cross-check against CPython during development — kept here so a future
  * "simplification" back to String.format cannot pass). */
class PyJsonSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val cases = Seq(
    ("0000000000000000", "0.0"),
    ("8000000000000000", "-0.0"),
    ("3ff0000000000000", "1.0"),
    ("bff0000000000000", "-1.0"),
    ("3fe0000000000000", "0.5"),
    ("3fb999999999999a", "0.1"),
    ("4005666666666666", "2.675"),
    ("3f1a36e2eb1c432d", "0.0001"),
    ("3ee4f8b588e368f1", "1e-05"),
    ("416312d000000000", "10000000.0"),
    ("41678c29c0000000", "12345678.0"),
    ("430c6bf526340000", "1000000000000000.0"),
    ("4341c37937e08000", "1e+16"),
    ("c341c37937e08000", "-1e+16"),
    ("0000000000000001", "5e-324"),
    ("8000000000000001", "-5e-324"),
    ("7fefffffffffffff", "1.7976931348623157e+308"),
    ("0010000000000000", "2.2250738585072014e-308"),
    ("4340000000000000", "9007199254740992.0"),
    ("3fd5555555555555", "0.3333333333333333"),
    ("40e5888000000000", "44100.0"),
    ("406af66666666666", "215.7"),
    ("c3ab8dee798ecbae", "-9.927526082972116e+17"),
    ("c3d4eb39aea34b8d", "-6.029447690049172e+18"),
    ("4533baacb18f2c5e", "2.3851136372966235e+25"),
    ("43de55ee9c5c7e55", "8.743662197969343e+18"))

  test("PyJson.repr matches CPython repr on boundary and tie cases") {
    for ((hex, want) <- cases) {
      val d = java.lang.Double.longBitsToDouble(
        java.lang.Long.parseUnsignedLong(hex, 16))
      assert(PyJson.repr(d) == want, s"bits $hex")
    }
    assert(PyJson.repr(Double.NaN) == "NaN")
    assert(PyJson.repr(Double.PositiveInfinity) == "Infinity")
    assert(PyJson.repr(Double.NegativeInfinity) == "-Infinity")
  }

  test("repr round-trips: parseDouble(repr(d)) == d for random bit patterns") {
    val rnd = new scala.util.Random(12021)
    var i = 0
    while (i < 20000) {
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (!d.isNaN && !d.isInfinite) {
        val s = PyJson.repr(d)
        assert(java.lang.Double.parseDouble(s) == d, s"$d -> $s")
        // 17 SIGNIFICANT digits always suffice for a double — exponent
        // digits and leading zeros don't count
        val digits = s.takeWhile(_ != 'e').filter(_.isDigit)
          .dropWhile(_ == '0')
        assert(digits.length <= 17, s"$s is longer than any double needs")
      }
      i += 1
    }
  }

  test("json string escaping matches ensure_ascii") {
    val sb = new java.lang.StringBuilder
    PyJson.writeEscaped(sb, "a\"b\\c\n\t" + 1.toChar + "é😀")
    assert(sb.toString == "\"a\\\"b\\\\c\\n\\t\\u0001\\u00e9\\ud83d\\ude00\"")
  }
}
