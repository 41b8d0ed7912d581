package graft.diff

import org.scalatest.funsuite.AnyFunSuite
import graft.attr.{AttrCodec, AttrVal}
import graft.attr.AttrVal._

/** Golden tests for the diff operator — these pin the reference semantics
  * (SURVEY.md Appendix A; the reference ships no tests of its own).
  */
class DiffSpec extends AnyFunSuite {
  private def item(json: String): MVal = AttrCodec.itemFromPlainJson(json)
  private def d(newJ: String, oldJ: String) =
    Diff.diffImages(Some(item(newJ)), Some(item(oldJ)))

  test("identity => empty diff") {
    val r = d("""{"a":1,"b":{"c":[1,2]},"n":null}""", """{"a":1,"b":{"c":[1,2]},"n":null}""")
    assert(r.isEmpty && r.before == AttrVal.emptyM && r.after == AttrVal.emptyM)
  }

  test("scalar change") {
    val r = d("""{"a":2}""", """{"a":1}""")
    assert(r.attributesChanged == Vector("a"))
    assert(AttrVal.printJson(r.before) == """{"a":1}""")
    assert(AttrVal.printJson(r.after) == """{"a":2}""")
  }

  test("nested change emits parent path then child paths (FIXTURES A2 example)") {
    val r = d(
      """{"name":"Ada L.","meta":{"visits":4,"tags":["a","b"]}}""",
      """{"name":"Ada","meta":{"visits":3,"tags":["a","b"]}}""")
    assert(r.attributesChanged == Vector("name", "meta", "meta.visits"))
    assert(AttrVal.printJson(r.before) == """{"name":"Ada","meta":{"visits":3}}""")
    assert(AttrVal.printJson(r.after) == """{"name":"Ada L.","meta":{"visits":4}}""")
  }

  test("added / removed keys; order added-then-removed-then-common (Q8)") {
    val r = d("""{"keep":0,"added":1,"mod":2}""", """{"keep":0,"removed":9,"mod":1}""")
    assert(r.attributesChanged == Vector("added", "removed", "mod"))
    assert(AttrVal.printJson(r.before) == """{"removed":9,"mod":1}""")
    assert(AttrVal.printJson(r.after) == """{"added":1,"mod":2}""")
  }

  test("INSERT: no old image, all top-level keys in after, no child paths") {
    val r = Diff.diffImages(Some(item("""{"pk":"P","deep":{"x":1}}""")), None)
    assert(r.attributesChanged == Vector("pk", "deep"))
    assert(AttrVal.printJson(r.after) == """{"pk":"P","deep":{"x":1}}""")
    assert(AttrVal.printJson(r.before) == "{}")
  }

  test("REMOVE: no new image, everything into before") {
    val r = Diff.diffImages(None, Some(item("""{"pk":"P","n":1}""")))
    assert(r.attributesChanged == Vector("pk", "n"))
    assert(AttrVal.printJson(r.before) == """{"pk":"P","n":1}""")
  }

  test("array change: whole-array granularity, order-sensitive (stringify)") {
    val r = d("""{"l":[2,1]}""", """{"l":[1,2]}""")
    assert(r.attributesChanged == Vector("l"))
    assert(AttrVal.printJson(r.before) == """{"l":[1,2]}""")
    assert(AttrVal.printJson(r.after) == """{"l":[2,1]}""")
    assert(d("""{"l":[1,2.0]}""", """{"l":[1.0,2]}""").isEmpty) // number normalization
  }

  test("cross-type change lands in scalar branch: changed") {
    assert(d("""{"x":"1"}""", """{"x":1}""").attributesChanged == Vector("x"))
    // object vs array: JS reference inequality => always changed
    assert(d("""{"x":{"a":1}}""", """{"x":[1]}""").attributesChanged == Vector("x"))
  }

  test("Q1: null <-> {} is invisible") {
    assert(d("""{"x":{}}""", """{"x":null}""").isEmpty)
    assert(d("""{"x":null}""", """{"x":{}}""").isEmpty)
  }

  test("Q2: null -> {a:1} reports [x, x.a] and fabricates {} for the null side") {
    val r = d("""{"x":{"a":1}}""", """{"x":null}""")
    assert(r.attributesChanged == Vector("x", "x.a"))
    assert(AttrVal.printJson(r.before) == """{"x":{}}""")
    assert(AttrVal.printJson(r.after) == """{"x":{"a":1}}""")
  }

  test("Q3 strict: set membership change is invisible") {
    val n = AttrCodec.unmarshallItem("""{"roles":{"SS":["admin"]}}""")
    val o = AttrCodec.unmarshallItem("""{"roles":{"SS":["admin","user"]}}""")
    assert(Diff.diffImages(Some(n), Some(o)).isEmpty)
  }

  test("Q3 engine mode: normalized sets diff as sorted arrays") {
    def norm(raw: String) = AttrVal.normalizeSets(AttrCodec.unmarshallItem(raw)) match {
      case m: MVal => m; case _ => fail()
    }
    val r = Diff.diffImages(
      Some(norm("""{"roles":{"SS":["user","admin"]}}""")),
      Some(norm("""{"roles":{"SS":["admin","zeta","user"]}}""")))
    assert(r.attributesChanged == Vector("roles"))
    assert(AttrVal.printJson(r.before) == """{"roles":["admin","user","zeta"]}""")
    assert(AttrVal.printJson(r.after) == """{"roles":["admin","user"]}""")
  }

  test("Q4: binary diffs at byte-index granularity") {
    val n = AttrCodec.unmarshallItem("""{"payload":{"B":"AQID"}}""") // [1,2,3]
    val o = AttrCodec.unmarshallItem("""{"payload":{"B":"AQX/"}}""") // [1,5,255]
    val r = Diff.diffImages(Some(n), Some(o))
    assert(r.attributesChanged == Vector("payload", "payload.1", "payload.2"))
    assert(AttrVal.printJson(r.before) == """{"payload":{"1":5,"2":255}}""")
    assert(AttrVal.printJson(r.after) == """{"payload":{"1":2,"2":3}}""")
  }

  test("binary length change also covers index add/remove") {
    val n = AttrCodec.unmarshallItem("""{"p":{"B":"AQI="}}""")   // [1,2]
    val o = AttrCodec.unmarshallItem("""{"p":{"B":"AQ=="}}""")   // [1]
    val r = Diff.diffImages(Some(n), Some(o))
    assert(r.attributesChanged == Vector("p", "p.1"))
    assert(AttrVal.printJson(r.after) == """{"p":{"1":2}}""")
  }

  test("duplicate parent paths when multiple grandchildren change") {
    val r = d("""{"a":{"b":{"c":2},"d":{"e":2}}}""", """{"a":{"b":{"c":1},"d":{"e":1}}}""")
    assert(r.attributesChanged == Vector("a", "a.b", "a.b.c", "a.d", "a.d.e"))
  }
}
