package graft.plans

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-exact Python `json.dumps(..., sort_keys=True, separators=(',',':'))`
  * serialization — the reference's canonical document form, whose sha256 is
  * the submission dedup key (reference F1/D1: db/data.py:250-257).
  *
  * Three Python behaviors the JVM's stock JSON writers get wrong, all
  * reproduced here:
  *
  *  - '''float repr''': Python prints the SHORTEST decimal string that
  *    round-trips to the same double (David Gay / Ryū semantics), with
  *    fixed notation on `[1e-4, 1e16)` and `e±dd` outside — Java's
  *    `Double.toString` (pre-JDK-19) is neither shortest in all cases nor
  *    Python-shaped (it switches to `E` notation at 1e7). [[PyJson.repr]]
  *    finds the shortest round-tripping precision by trial (1..17 digits)
  *    and applies CPython's `format_float_short` layout rules; pinned
  *    against CPython byte-for-byte on ~400k random bit patterns.
  *  - '''ensure_ascii''': `json.dumps` escapes every non-ASCII character as
  *    `\uXXXX` (surrogate pairs as two escapes) and control characters as
  *    `\n`-style shorthands or `\u00XX`.
  *  - '''sort_keys''': object keys sort by Unicode CODE POINT, which is not
  *    `java.lang.String.compareTo` (UTF-16 order) once supplementary
  *    characters appear.
  */
object PyJson {

  /** CPython `repr(float)`, byte-exact (`float_repr_style='short'`).
    * In JSON context the non-finite spellings are json.dumps' `NaN` /
    * `Infinity` / `-Infinity` (allow_nan=True default), not repr's. */
  def repr(d: Double): String = {
    if (java.lang.Double.isNaN(d)) return "NaN"
    if (d == Double.PositiveInfinity) return "Infinity"
    if (d == Double.NegativeInfinity) return "-Infinity"
    val neg = java.lang.Double.doubleToRawLongBits(d) < 0
    val a = math.abs(d)
    // Shortest round-tripping digit string: the first precision p whose
    // correctly-rounded p-digit form parses back to exactly `a` (the same
    // search CPython used pre-Gay; 17 significant digits always round-trip,
    // so the loop is total). Rounding runs on `new BigDecimal(a)` — the
    // EXACT decimal expansion of the double — under HALF_EVEN, matching C's
    // (and hence CPython's) correctly-rounded conversion; Java's
    // `String.format("%.Ne")` rounds half-UP and diverges from repr on
    // ~1-in-20k values (measured), which is why it is not used here.
    var digits: String = null
    var decpt = 0
    var p = 1
    val exact = new java.math.BigDecimal(a)
    while (digits == null) {
      val r = exact.round(
        new java.math.MathContext(p, java.math.RoundingMode.HALF_EVEN))
      val unscaled = r.unscaledValue.toString
      val dec = unscaled.length - r.scale
      if (p == 17 || java.lang.Double.parseDouble(
          unscaled + "e" + (dec - unscaled.length)) == a) {
        var len = unscaled.length
        while (len > 1 && unscaled.charAt(len - 1) == '0') len -= 1
        digits = unscaled.substring(0, len)
        decpt = dec
      }
      p += 1
    }
    // CPython format_float_short, type 'r': exponential iff the decimal
    // point falls outside (-4, 16]; value = 0.<digits> * 10^decpt.
    val sb = new java.lang.StringBuilder(24)
    if (neg) sb.append('-')
    if (decpt <= -4 || decpt > 16) {
      sb.append(digits.charAt(0))
      if (digits.length > 1)
        sb.append('.').append(digits, 1, digits.length)
      val ex = decpt - 1
      sb.append('e').append(if (ex < 0) '-' else '+')
      val ae = math.abs(ex)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    } else if (decpt <= 0) {
      sb.append("0.")
      var i = decpt
      while (i < 0) { sb.append('0'); i += 1 }
      sb.append(digits)
    } else if (decpt >= digits.length) {
      sb.append(digits)
      var i = digits.length
      while (i < decpt) { sb.append('0'); i += 1 }
      sb.append(".0")
    } else {
      sb.append(digits, 0, decpt).append('.')
        .append(digits, decpt, digits.length)
    }
    sb.toString
  }

  /** `json.dumps` string escaping with the default `ensure_ascii=True`. */
  def writeEscaped(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c >= 0x20 && c <= 0x7e => sb.append(c)
        case c => // covers controls, non-ASCII, and each surrogate half
          sb.append(String.format("\\u%04x", Integer.valueOf(c.toInt)))
      }
      i += 1
    }
    sb.append('"')
  }

  /** Python `str` ordering = Unicode code points (NOT UTF-16 unit order). */
  val codePointOrdering: Ordering[String] = (a: String, b: String) => {
    var i = 0
    var j = 0
    var r = 0
    while (r == 0 && i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      r = Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    if (r != 0) r else Integer.compare(a.length - i, b.length - j)
  }

  /** Serialize a typed Catalyst value. Struct fields and map entries sort
    * by key code points; doubles print as Python repr; null fields emit
    * `"field":null` (dropping them would hash-collide `{"a":1,"b":null}`
    * with `{"a":1}`). */
  def writeValue(sb: java.lang.StringBuilder, v: Any, dt: DataType): Unit = {
    if (v == null) { sb.append("null"); return }
    dt match {
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        val order = st.fields.indices
          .sortBy(st.fields(_).name)(codePointOrdering)
        sb.append('{')
        var first = true
        for (i <- order) {
          if (!first) sb.append(',')
          first = false
          writeEscaped(sb, st.fields(i).name)
          sb.append(':')
          val f = st.fields(i)
          val fv = if (row.isNullAt(i)) null else row.get(i, f.dataType)
          writeValue(sb, fv, f.dataType)
        }
        sb.append('}')
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[ArrayData]
        sb.append('[')
        var i = 0
        while (i < arr.numElements()) {
          if (i > 0) sb.append(',')
          val ev = if (arr.isNullAt(i)) null else arr.get(i, et)
          writeValue(sb, ev, et)
          i += 1
        }
        sb.append(']')
      case MapType(StringType, vt, _) =>
        val m = v.asInstanceOf[MapData]
        val keys = m.keyArray()
        val vals = m.valueArray()
        // UTF8String binary order IS code-point order (UTF-8 property)
        val order = (0 until m.numElements()).sortWith((i, j) =>
          keys.getUTF8String(i).compareTo(keys.getUTF8String(j)) < 0)
        sb.append('{')
        var first = true
        for (i <- order) {
          if (!first) sb.append(',')
          first = false
          writeEscaped(sb, keys.getUTF8String(i).toString)
          sb.append(':')
          val ev = if (vals.isNullAt(i)) null else vals.get(i, vt)
          writeValue(sb, ev, vt)
        }
        sb.append('}')
      case DoubleType  => sb.append(repr(v.asInstanceOf[Double]))
      case FloatType   => sb.append(repr(v.asInstanceOf[Float].toDouble))
      case LongType    => sb.append(v.asInstanceOf[Long])
      case IntegerType => sb.append(v.asInstanceOf[Int])
      case ShortType   => sb.append(v.asInstanceOf[Short].toInt)
      case ByteType    => sb.append(v.asInstanceOf[Byte].toInt)
      case BooleanType => sb.append(if (v.asInstanceOf[Boolean]) "true" else "false")
      case StringType  => writeEscaped(sb, v.asInstanceOf[UTF8String].toString)
      case _: DecimalType =>
        sb.append(v.asInstanceOf[Decimal].toJavaBigDecimal.toPlainString)
      case other =>
        throw new IllegalArgumentException(
          s"canonical_json: unsupported leaf type ${other.sql}")
    }
  }

  /** Serialize a Jackson tree — the `json.load`-equivalent typed view of a
    * RAW document, where each number keeps its literal's int-vs-float
    * identity (Jackson readTree: integral literals → Int/Long/BigInteger
    * nodes, fractional/exponent literals → double — exactly Python's
    * `json.load`). This is what makes RAW-document hashing byte-exact:
    * `[0, 0.53]` must print `0` and `0.53`, which no single Spark array
    * element type can represent. */
  def writeNode(sb: java.lang.StringBuilder, n: JsonNode): Unit = {
    if (n.isObject) {
      val names = new scala.collection.mutable.ArrayBuffer[String]
      val it = n.fieldNames()
      while (it.hasNext) names += it.next()
      sb.append('{')
      var first = true
      for (k <- names.sorted(codePointOrdering)) {
        if (!first) sb.append(',')
        first = false
        writeEscaped(sb, k)
        sb.append(':')
        writeNode(sb, n.get(k))
      }
      sb.append('}')
    } else if (n.isArray) {
      sb.append('[')
      var i = 0
      while (i < n.size()) {
        if (i > 0) sb.append(',')
        writeNode(sb, n.get(i))
        i += 1
      }
      sb.append(']')
    } else if (n.isIntegralNumber) sb.append(n.bigIntegerValue().toString)
    else if (n.isNumber) sb.append(repr(n.doubleValue()))
    else if (n.isTextual) writeEscaped(sb, n.textValue())
    else if (n.isBoolean) sb.append(if (n.booleanValue()) "true" else "false")
    else sb.append("null")
  }

  /** Jackson is Spark's own bundled JSON stack; ObjectMapper defaults are
    * Python-compatible (last duplicate key wins, like dict) EXCEPT that
    * Jackson rejects the NaN/Infinity/-Infinity literals CPython's
    * json.load accepts by default — a submission the reference parses and
    * dedup-hashes (json.dumps re-emits them under allow_nan=True, which
    * [[repr]] mirrors) must round-trip here too, hence the read feature. */
  lazy val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder()
    .enable(com.fasterxml.jackson.core.json.JsonReadFeature
      .ALLOW_NON_NUMERIC_NUMBERS)
    .build()
}

/** `canonical_json(structOrArrayOrMap)`: Python-canonical serialization of
  * a TYPED payload — the writer used when the engine constructs documents
  * itself (high-level reassembly, snapshots). See [[PyJson]]. */
case class CanonicalJson(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType | _: ArrayType | _: MapType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a struct/array/map, got ${other.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_json"

  override def nullSafeEval(input: Any): Any = {
    val sb = new java.lang.StringBuilder(256)
    PyJson.writeValue(sb, input, child.dataType)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(
      newChild: Expression): CanonicalJson = copy(child = newChild)
}

/** `canonical_json_str(rawJson)`: Python-canonical re-serialization of a
  * RAW JSON document — byte-identical to the reference's
  * `json.dumps(json.load(doc), sort_keys=True, separators=(',',':'))`
  * (db/data.py:250-257) including per-literal int-vs-float identity, so
  * sha256 over it reproduces the reference's submission dedup keys exactly
  * (golden-tested against the REAL reference fixtures). Malformed JSON
  * raises, mirroring the reference's 400 on unparseable submissions. */
case class CanonicalJsonString(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_json_str"

  override def nullSafeEval(input: Any): Any = {
    val node = PyJson.mapper.readTree(input.asInstanceOf[UTF8String].toString)
    val sb = new java.lang.StringBuilder(256)
    PyJson.writeNode(sb, node)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(
      newChild: Expression): CanonicalJsonString = copy(child = newChild)
}
