package graft.attr

import scala.collection.mutable.ArrayBuffer

/** Minimal JSON AST with JS-like object-key ordering semantics.
  *
  * Why hand-rolled: the engine's diff operator (see
  * `/root/reference/lib/lambda/dynamo-stream-handler.ts:71-76`) defines array
  * equality via `JSON.stringify`, and emitted `before`/`after` payloads are
  * JSON-serialized (`dynamo-stream-handler.ts:148,173`). Controlling parsing
  * AND printing in one zero-dependency module lets golden tests pin an exact
  * canonical form (the reference ships no tests — its semantics are pinned by
  * SURVEY.md Appendix A).
  *
  * JS fidelity notes:
  *  - Object fields preserve insertion order, but `Object.keys` in JS returns
  *    canonical array-index-like keys first in ascending numeric order; [[JObj.keys]]
  *    replicates that (relevant for Uint8Array-style index maps, SURVEY Q4).
  *  - Numbers are exact [[BigDecimal]]s (DynamoDB `N` is decimal-exact to 38
  *    digits); this is a documented improvement over the reference, whose JS
  *    `unmarshall` narrows to IEEE double (SURVEY.md §1.2).
  */
sealed trait Json {
  def print: String = JsonPrinter.print(this)
}

object Json {
  case object JNull extends Json
  final case class JBool(b: Boolean) extends Json
  final case class JNum(v: BigDecimal) extends Json
  final case class JStr(s: String) extends Json
  final case class JArr(items: Vector[Json]) extends Json
  final case class JObj(fields: Vector[(String, Json)]) extends Json {
    lazy val asMap: Map[String, Json] = fields.toMap

    /** JS `Object.keys` ordering: canonical integer-like keys ascending, then
      * the rest in insertion order.
      */
    def keys: Vector[String] = JsKeys.order(fields.map(_._1))
  }

  object JNum {
    def of(l: Long): JNum = JNum(BigDecimal(l))
    def of(s: String): JNum = JNum(BigDecimal(s))
  }
  def obj(fields: (String, Json)*): JObj = JObj(fields.toVector)
  def arr(items: Json*): JArr = JArr(items.toVector)
  def str(s: String): JStr = JStr(s)

  /** Structural equality with numeric compareTo (so 1.0 == 1, matching the
    * reference where both parse to the same JS number).
    */
  def eq(a: Json, b: Json): Boolean = (a, b) match {
    case (JNull, JNull)         => true
    case (JBool(x), JBool(y))   => x == y
    case (JNum(x), JNum(y))     => x.compare(y) == 0
    case (JStr(x), JStr(y))     => x == y
    case (JArr(x), JArr(y))     => x.length == y.length && x.lazyZip(y).forall(eq)
    case (x: JObj, y: JObj)     =>
      x.fields.length == y.fields.length && {
        val xk = x.keys; val yk = y.keys
        xk == yk && xk.forall(k => eq(x.asMap(k), y.asMap(k)))
      }
    case _ => false
  }
}

/** JS property-ordering helper: array-index-like keys first (ascending). */
object JsKeys {
  private val IndexRe = "^(0|[1-9][0-9]*)$".r
  def isIndexKey(k: String): Boolean =
    IndexRe.matches(k) && k.length <= 10 && k.toLong < 4294967295L
  def order(ks: Vector[String]): Vector[String] = {
    val (idx, rest) = ks.partition(isIndexKey)
    idx.sortBy(_.toLong) ++ rest
  }
}

object JsonPrinter {
  /** Compact canonical print. Strings escaped as `JSON.stringify` does;
    * numbers printed as normalized decimals (plain notation for exponents in
    * [-20, 20], scientific otherwise).
    */
  def print(j: Json): String = {
    val sb = new StringBuilder
    write(j, sb)
    sb.toString
  }

  def num(v: BigDecimal): String = {
    val bd: BigDecimal =
      if (v.signum == 0) BigDecimal(0) else BigDecimal(v.underlying.stripTrailingZeros)
    val adjusted = bd.precision - bd.scale // number of integer digits
    if (bd.scale <= 0 && adjusted <= 21) bd.underlying.toPlainString
    else if (bd.scale > 0 && bd.scale <= 20 && adjusted > -6) bd.underlying.toPlainString
    else {
      // JS-like scientific: d.ddde±x
      val s = bd.underlying.toString // BigDecimal scientific when needed
      s.replace("E", "e").replace("e+", "e+").replace("e", "e") match {
        case t if t.contains("e") && !t.contains("e-") && !t.contains("e+") =>
          t.replace("e", "e+")
        case t => t
      }
    }
  }

  def escape(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  private def write(j: Json, sb: StringBuilder): Unit = j match {
    case Json.JNull    => sb.append("null")
    case Json.JBool(b) => sb.append(if (b) "true" else "false")
    case Json.JNum(v)  => sb.append(num(v))
    case Json.JStr(s)  => escape(s, sb)
    case Json.JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(','); first = false
        write(it, sb)
      }
      sb.append(']')
    case o: Json.JObj =>
      sb.append('{')
      var first = true
      o.keys.foreach { k =>
        if (!first) sb.append(','); first = false
        escape(k, sb)
        sb.append(':')
        write(o.asMap(k), sb)
      }
      sb.append('}')
  }
}

/** Recursive-descent JSON parser. Throws [[JsonParseException]] on malformed
  * input; the CDC pipeline wraps calls in `Try` for per-record error isolation
  * (reference behavior: `dynamo-stream-handler.ts:20-25`).
  */
object JsonParser {
  final class JsonParseException(msg: String, val pos: Int)
      extends RuntimeException(s"$msg at pos $pos")

  def parse(s: String): Json = {
    val p = new P(s)
    p.skipWs()
    val v = p.value()
    p.skipWs()
    if (p.i < s.length) throw new JsonParseException("trailing data", p.i)
    v
  }

  def parseOpt(s: String): Option[Json] =
    try Some(parse(s))
    catch { case _: JsonParseException => None }

  /** Nesting bound: prevents adversarial deep input from turning the
    * recursive descent into a StackOverflowError (fatal — it would escape
    * the per-record Try isolation and kill the task).
    */
  private val MaxDepth = 512

  private final class P(s: String) {
    var i = 0
    var depth = 0
    def err(msg: String) = throw new JsonParseException(msg, i)
    def skipWs(): Unit = {
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    }
    def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) err(s"expected '$c'")
      i += 1
    }
    def value(): Json = {
      if (i >= s.length) err("unexpected end")
      depth += 1
      if (depth > MaxDepth) err("nesting too deep")
      val v = valueInner()
      depth -= 1
      v
    }
    private def valueInner(): Json = {
      s.charAt(i) match {
        case '{' => jsObject()
        case '[' => array()
        case '"' => Json.JStr(string())
        case 't' => lit("true", Json.JBool(true))
        case 'f' => lit("false", Json.JBool(false))
        case 'n' => lit("null", Json.JNull)
        case c if c == '-' || (c >= '0' && c <= '9') => number()
        case c => err(s"unexpected char '$c'")
      }
    }
    def lit(word: String, v: Json): Json = {
      if (!s.startsWith(word, i)) err(s"expected $word")
      i += word.length; v
    }
    def jsObject(): Json = {
      expect('{'); skipWs()
      val fields = new ArrayBuffer[(String, Json)]
      // O(1) duplicate detection: this parser feeds untrusted per-record
      // stream lines, and a linear indexWhere per field would make one
      // adversarial line with ~1e5 keys in a single object O(n²) — a stalled
      // task, not just a slow row
      val seen = new scala.collection.mutable.HashMap[String, Int]
      if (i < s.length && s.charAt(i) == '}') { i += 1; return Json.JObj(fields.toVector) }
      while (true) {
        skipWs()
        val k = string()
        skipWs(); expect(':'); skipWs()
        val v = value()
        // duplicate keys: JS JSON.parse keeps the FIRST occurrence's position
        // with the LAST occurrence's value — replace in place, don't append
        seen.get(k) match {
          case Some(idx) => fields(idx) = ((k, v))
          case None => seen.put(k, fields.length); fields += ((k, v))
        }
        skipWs()
        if (i >= s.length) err("unterminated object")
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; return Json.JObj(fields.toVector)
          case _   => err("expected ',' or '}'")
        }
      }
      Json.JObj(fields.toVector)
    }
    def array(): Json = {
      expect('['); skipWs()
      val items = new ArrayBuffer[Json]
      if (i < s.length && s.charAt(i) == ']') { i += 1; return Json.JArr(items.toVector) }
      while (true) {
        skipWs()
        items += value()
        skipWs()
        if (i >= s.length) err("unterminated array")
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; return Json.JArr(items.toVector)
          case _   => err("expected ',' or ']'")
        }
      }
      Json.JArr(items.toVector)
    }
    def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        if (i >= s.length) err("unterminated string")
        val c = s.charAt(i)
        c match {
          case '"' => i += 1; return sb.toString
          case '\\' =>
            i += 1
            if (i >= s.length) err("bad escape")
            s.charAt(i) match {
              case '"'  => sb.append('"'); i += 1
              case '\\' => sb.append('\\'); i += 1
              case '/'  => sb.append('/'); i += 1
              case 'b'  => sb.append('\b'); i += 1
              case 'f'  => sb.append('\f'); i += 1
              case 'n'  => sb.append('\n'); i += 1
              case 'r'  => sb.append('\r'); i += 1
              case 't'  => sb.append('\t'); i += 1
              case 'u'  =>
                i += 1
                if (i + 4 > s.length) err("bad unicode escape")
                val hex = s.substring(i, i + 4)
                if (!hex.forall(c => (c >= '0' && c <= '9') ||
                    (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))
                  err("bad unicode escape")
                sb.append(Integer.parseInt(hex, 16).toChar)
                i += 4
              case _ => err("bad escape")
            }
          case c => sb.append(c); i += 1
        }
      }
      sb.toString
    }
    def number(): Json = {
      val start = i
      if (i < s.length && s.charAt(i) == '-') i += 1
      while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      if (i < s.length && s.charAt(i) == '.') {
        i += 1
        while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      }
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      }
      if (i == start) err("bad number")
      try Json.JNum(BigDecimal(s.substring(start, i)))
      catch { case _: NumberFormatException => err("bad number") }
    }
  }
}
