package graft.attr

import java.util.Base64

/** The post-unmarshall value universe of a DynamoDB item — the working
  * representation every record-level operator (diff, envelope, claim-check
  * serialization) runs over.
  *
  * Mirrors what `unmarshall` from `@aws-sdk/util-dynamodb` produces in the
  * reference (`/root/reference/lib/lambda/dynamo-stream-handler.ts:3,101-110`),
  * including the JS quirks the diff depends on (SURVEY.md Appendix A):
  *  - sets (`SS`/`NS`/`BS`) become JS `Set` objects whose `Object.keys` is
  *    empty → [[SSVal]]/[[NSVal]]/[[BSVal]] report no keys in strict mode;
  *  - binary becomes `Uint8Array`, an object keyed by byte index → [[BVal]]
  *    exposes index keys so the diff emits byte-index paths (quirk Q4);
  *  - `null` is object-typed in JS (`typeof null === "object"`) and enters
  *    the diff's recursion branch with an empty key set (quirks Q1/Q2).
  */
sealed trait AttrVal

object AttrVal {
  final case class SVal(s: String) extends AttrVal
  final case class NVal(n: BigDecimal) extends AttrVal
  final case class BVal(bytes: Vector[Byte]) extends AttrVal
  final case class BoolVal(b: Boolean) extends AttrVal
  case object NullVal extends AttrVal
  final case class MVal(fields: Vector[(String, AttrVal)]) extends AttrVal {
    lazy val asMap: Map[String, AttrVal] = fields.toMap
    def keys: Vector[String] = JsKeys.order(fields.map(_._1))
    def get(k: String): Option[AttrVal] = asMap.get(k)
  }
  final case class LVal(items: Vector[AttrVal]) extends AttrVal
  final case class SSVal(items: Vector[String]) extends AttrVal
  final case class NSVal(items: Vector[BigDecimal]) extends AttrVal
  final case class BSVal(items: Vector[Vector[Byte]]) extends AttrVal

  val emptyM: MVal = MVal(Vector.empty)

  /** Engine-mode normalization (SURVEY.md §7.4 decision): sets → sorted
    * arrays so membership changes are visible to the diff; strict-compat mode
    * keeps set values opaque like the reference.
    */
  def normalizeSets(v: AttrVal): AttrVal = v match {
    case SSVal(xs)      => LVal(xs.sorted.map(SVal))
    case NSVal(xs)      => LVal(xs.sorted.map(NVal))
    case BSVal(xs)      =>
      LVal(xs.sortBy(b => Base64.getEncoder.encodeToString(b.toArray)).map(BVal))
    case MVal(fs)       => MVal(fs.map { case (k, x) => (k, normalizeSets(x)) })
    case LVal(xs)       => LVal(xs.map(normalizeSets))
    case other          => other
  }

  /** `JSON.stringify` view of an unmarshalled value
    * (`dynamo-stream-handler.ts:148,173`): sets serialize as `{}`,
    * `Uint8Array` as an index→byte object, numbers as JS numbers.
    */
  def toJson(v: AttrVal): Json = v match {
    case SVal(s)    => Json.JStr(s)
    case NVal(n)    => Json.JNum(n)
    case BoolVal(b) => Json.JBool(b)
    case NullVal    => Json.JNull
    case BVal(bs)   =>
      Json.JObj(bs.zipWithIndex.map { case (b, i) =>
        (i.toString, Json.JNum(BigDecimal(b & 0xff)))
      })
    case MVal(fs)   => Json.JObj(fs.map { case (k, x) => (k, toJson(x)) })
    case LVal(xs)   => Json.JArr(xs.map(toJson))
    case _: SSVal | _: NSVal | _: BSVal => Json.JObj(Vector.empty) // JS Set → {}
  }

  def printJson(v: AttrVal): String = toJson(v).print
}

/** Marshall/unmarshall between the DynamoDB wire form (`{"S": ...}`,
  * `{"N": "123"}`, ... — the `AttributeValue` tag universe of SURVEY.md §1.2)
  * and [[AttrVal]]. Pure and total over well-formed input; malformed tags
  * raise [[AttrCodec.CodecException]] for `Try`-based per-record isolation.
  */
object AttrCodec {
  import AttrVal._
  import Json._

  final class CodecException(msg: String) extends RuntimeException(msg)
  private def fail(msg: String) = throw new CodecException(msg)

  /** One marshalled AttributeValue (a single-tag object) → value. */
  def unmarshallValue(j: Json): AttrVal = j match {
    case o: JObj if o.fields.length == 1 =>
      val (tag, v) = o.fields.head
      (tag, v) match {
        case ("S", JStr(s))     => SVal(s)
        case ("N", JStr(n))     =>
          try NVal(BigDecimal(n)) catch { case _: NumberFormatException => fail(s"bad N: $n") }
        case ("B", JStr(b64))   =>
          try BVal(Base64.getDecoder.decode(b64).toVector)
          catch { case _: IllegalArgumentException => fail(s"bad B base64") }
        case ("BOOL", JBool(b)) => BoolVal(b)
        case ("NULL", _)        => NullVal
        case ("M", m: JObj)     => MVal(m.fields.map { case (k, x) => (k, unmarshallValue(x)) })
        case ("L", JArr(xs))    => LVal(xs.map(unmarshallValue))
        case ("SS", JArr(xs))   => SSVal(xs.map { case JStr(s) => s; case x => fail(s"bad SS elem: $x") })
        case ("NS", JArr(xs))   => NSVal(xs.map {
          case JStr(n) => try BigDecimal(n) catch { case _: NumberFormatException => fail(s"bad NS: $n") }
          case x       => fail(s"bad NS elem: $x")
        })
        case ("BS", JArr(xs))   => BSVal(xs.map {
          case JStr(b) => Base64.getDecoder.decode(b).toVector
          case x       => fail(s"bad BS elem: $x")
        })
        case (t, _) => fail(s"unknown AttributeValue tag: $t")
      }
    case other => fail(s"not an AttributeValue: ${other.print.take(80)}")
  }

  /** A marshalled item (`{attr: {tag: ...}, ...}`) → item map, like
    * `unmarshall(image)` at `dynamo-stream-handler.ts:101-110`.
    */
  def unmarshallItem(j: Json): MVal = j match {
    case o: JObj => MVal(o.fields.map { case (k, v) => (k, unmarshallValue(v)) })
    case other   => fail(s"not a marshalled item: ${other.print.take(80)}")
  }

  def unmarshallItem(raw: String): MVal = unmarshallItem(JsonParser.parse(raw))

  /** Inverse: value → tagged wire form (used by the CDC synthesizer and
    * round-trip property tests).
    */
  def marshallValue(v: AttrVal): Json = v match {
    case SVal(s)    => obj("S" -> JStr(s))
    case NVal(n)    => obj("N" -> JStr(JsonPrinter.num(n)))
    case BVal(bs)   => obj("B" -> JStr(Base64.getEncoder.encodeToString(bs.toArray)))
    case BoolVal(b) => obj("BOOL" -> JBool(b))
    case NullVal    => obj("NULL" -> JBool(true))
    case MVal(fs)   => obj("M" -> JObj(fs.map { case (k, x) => (k, marshallValue(x)) }))
    case LVal(xs)   => obj("L" -> JArr(xs.map(marshallValue)))
    case SSVal(xs)  => obj("SS" -> JArr(xs.map(JStr)))
    case NSVal(xs)  => obj("NS" -> JArr(xs.map(n => JStr(JsonPrinter.num(n)))))
    case BSVal(xs)  => obj("BS" -> JArr(xs.map(b => JStr(Base64.getEncoder.encodeToString(b.toArray)))))
  }

  def marshallItem(m: MVal): Json =
    Json.JObj(m.fields.map { case (k, v) => (k, marshallValue(v)) })

  /** Plain (already-unmarshalled) JSON → value tree, mapping JSON types onto
    * the DynamoDB universe (object→M, array→L, string→S, number→N, bool→BOOL,
    * null→NULL). Used when the CDC source carries plain-JSON images (e.g. the
    * `events.props` synthesis bridge, FIXTURES.md §B).
    */
  def fromPlainJson(j: Json): AttrVal = j match {
    case JStr(s)  => SVal(s)
    case JNum(n)  => NVal(n)
    case JBool(b) => BoolVal(b)
    case JNull    => NullVal
    case JArr(xs) => LVal(xs.map(fromPlainJson))
    case o: JObj  => MVal(o.fields.map { case (k, v) => (k, fromPlainJson(v)) })
  }

  def itemFromPlainJson(raw: String): MVal = fromPlainJson(JsonParser.parse(raw)) match {
    case m: MVal => m
    case other   => fail(s"item must be a JSON object, got: ${AttrVal.printJson(other).take(80)}")
  }
}
