package graft.attr

import org.scalatest.funsuite.AnyFunSuite
import graft.attr.AttrVal._

class JsonSpec extends AnyFunSuite {
  test("parse/print roundtrip canonical") {
    val s = """{"a":1,"b":[1,2,{"c":"x"}],"d":null,"e":true,"f":-1.5}"""
    assert(JsonParser.parse(s).print == s)
  }
  test("number normalization: 1.0 prints as 1, equality across scales") {
    assert(JsonParser.parse("[1.0,2.50,0.0]").print == "[1,2.5,0]")
    assert(Json.eq(JsonParser.parse("1.0"), JsonParser.parse("1")))
  }
  test("string escapes") {
    assert(Json.JStr("a\"b\\c\n\t").print == "\"a\\\"b\\\\c\\n\\t\\u0001\"")
    assert(JsonParser.parse("\"\\u0041\\n\"") == Json.JStr("A\n"))
  }
  test("duplicate object keys: first position, last value (JS JSON.parse)") {
    assert(JsonParser.parse("""{"a":1,"b":2,"a":3}""").print == """{"a":3,"b":2}""")
    assert(JsonParser.parse("""{"a":{"x":1},"a":[2]}""").print == """{"a":[2]}""")
  }
  test("JS object key order: integer-like keys first, ascending") {
    val o = JsonParser.parse("""{"b":1,"2":2,"a":3,"0":4}""").asInstanceOf[Json.JObj]
    assert(o.keys == Vector("0", "2", "b", "a"))
    assert(o.print == """{"0":4,"2":2,"b":1,"a":3}""")
  }
  test("malformed input raises") {
    assert(JsonParser.parseOpt("{").isEmpty)
    assert(JsonParser.parseOpt("\"\\uQQQQ\"").isEmpty) // bad hex must not escape parseOpt
    assert(JsonParser.parseOpt("[" * 100000).isEmpty) // depth bound, no StackOverflowError
    assert(JsonParser.parseOpt("""{"a":}""").isEmpty)
    assert(JsonParser.parseOpt("[1,]").isEmpty)
    assert(JsonParser.parseOpt("1 2").isEmpty)
  }
}

class AttrCodecSpec extends AnyFunSuite {
  test("unmarshall every AttributeValue tag (SURVEY §1.2 universe)") {
    val raw =
      """{"s":{"S":"x"},"n":{"N":"1.5"},"b":{"B":"AQI="},"t":{"BOOL":true},
         |"nul":{"NULL":true},"m":{"M":{"inner":{"N":"2"}}},
         |"l":{"L":[{"S":"a"},{"N":"3"}]},
         |"ss":{"SS":["b","a"]},"ns":{"NS":["2","10"]},"bs":{"BS":["AQ=="]}}""".stripMargin.replace("\n", "")
    val m = AttrCodec.unmarshallItem(raw)
    assert(m.get("s").contains(SVal("x")))
    assert(m.get("n").contains(NVal(BigDecimal("1.5"))))
    assert(m.get("b").contains(BVal(Vector(1.toByte, 2.toByte))))
    assert(m.get("t").contains(BoolVal(true)))
    assert(m.get("nul").contains(NullVal))
    assert(m.get("m").contains(MVal(Vector("inner" -> NVal(BigDecimal(2))))))
    assert(m.get("l").contains(LVal(Vector(SVal("a"), NVal(BigDecimal(3))))))
    assert(m.get("ss").contains(SSVal(Vector("b", "a"))))
    assert(m.get("ns").contains(NSVal(Vector(BigDecimal(2), BigDecimal(10)))))
    assert(m.get("bs").contains(BSVal(Vector(Vector(1.toByte)))))
  }
  test("marshall/unmarshall roundtrip") {
    val item = MVal(Vector(
      "pk" -> SVal("USER#1"), "n" -> NVal(BigDecimal("-2.5")),
      "m" -> MVal(Vector("x" -> NullVal, "l" -> LVal(Vector(BoolVal(false))))),
      "ss" -> SSVal(Vector("q"))))
    assert(AttrCodec.unmarshallItem(AttrCodec.marshallItem(item).print) == item)
  }
  test("JSON.stringify view: sets -> {}, binary -> index map (Q3/Q4)") {
    assert(AttrVal.printJson(SSVal(Vector("a", "b"))) == "{}")
    assert(AttrVal.printJson(BVal(Vector(5.toByte, 255.toByte))) == """{"0":5,"1":255}""")
  }
  test("normalizeSets: sorted arrays in engine mode") {
    assert(AttrVal.normalizeSets(SSVal(Vector("b", "a"))) == LVal(Vector(SVal("a"), SVal("b"))))
    assert(AttrVal.normalizeSets(NSVal(Vector(BigDecimal(10), BigDecimal(2)))) ==
      LVal(Vector(NVal(BigDecimal(2)), NVal(BigDecimal(10)))))
  }
  test("unknown tag / malformed raise CodecException") {
    intercept[AttrCodec.CodecException](AttrCodec.unmarshallItem("""{"a":{"X":"1"}}"""))
    intercept[AttrCodec.CodecException](AttrCodec.unmarshallItem("""{"a":{"N":"abc"}}"""))
  }
  test("plain JSON bridge maps JSON types onto the DynamoDB universe") {
    val m = AttrCodec.itemFromPlainJson("""{"k":87,"s":"x","l":[1],"o":{"i":null},"b":true}""")
    assert(m.get("k").contains(NVal(BigDecimal(87))))
    assert(m.get("o").contains(MVal(Vector("i" -> NullVal))))
  }
}
