package graft.diff

import graft.attr.AttrVal
import graft.attr.AttrVal._

/** Recursive structural diff of two item images — the engine's core operator
  * (OP-7), a behavioral port of `compareJSON` at
  * `/root/reference/lib/lambda/dynamo-stream-handler.ts:29-87` with the exact
  * edge-case semantics cataloged in SURVEY.md Appendix A:
  *
  *  - key sets split into added / removed / common
  *    (`dynamo-stream-handler.ts:41-45`); added keys land in `after`, removed
  *    in `before`, paths are dot-joined `level + key`;
  *  - common keys where BOTH sides are object-typed and NEITHER is an array
  *    recurse; a non-empty child diff records minimal child objects and pushes
  *    the parent path followed by all child paths (`:54-70`);
  *  - common arrays compare by `JSON.stringify` equality, whole-array
  *    granularity (`:71-76`);
  *  - everything else compares with JS `!==` (`:77-83`) — cross-type pairs and
  *    object-vs-array pairs are always "changed" (reference inequality);
  *  - `null` is object-typed with an empty key set (quirks Q1/Q2: `null ↔ {}`
  *    is invisible; `null → {a:1}` fabricates `{}` on the null side);
  *  - sets have an empty key set (Q3: membership changes invisible in strict
  *    mode; [[graft.attr.AttrVal.normalizeSets]] is the engine-mode remedy);
  *  - binary is index-keyed (Q4: byte-index paths).
  *
  * Pure function, no Spark dependency — exposed to Spark via a typed map /
  * UDF in [[graft.cdc.CdcPipeline]].
  */
object Diff {

  final case class DiffResult(
      attributesChanged: Vector[String],
      before: MVal,
      after: MVal) {
    def isEmpty: Boolean = attributesChanged.isEmpty
  }

  /** `typeof v === "object"` in the post-unmarshall JS world. */
  private def isObjectType(v: AttrVal): Boolean = v match {
    case _: MVal | _: LVal | _: BVal | _: SSVal | _: NSVal | _: BSVal | NullVal => true
    case _ => false
  }

  private def isArray(v: AttrVal): Boolean = v.isInstanceOf[LVal]

  /** `Object.keys(v)` for object-typed values. */
  private def keysOf(v: AttrVal): Vector[String] = v match {
    case m: MVal  => m.keys
    case BVal(bs) => bs.indices.map(_.toString).toVector
    case _        => Vector.empty // null and Sets expose no enumerable keys
  }

  private def getKey(v: AttrVal, k: String): AttrVal = v match {
    case m: MVal  => m.asMap(k)
    case BVal(bs) => NVal(BigDecimal(bs(k.toInt) & 0xff))
    case _        => NullVal // unreachable: keysOf is empty for these
  }

  /** JS strict equality for the scalar fallthrough branch. Object-typed
    * values reaching this branch are distinct references in the reference
    * implementation, hence never equal.
    */
  private def jsStrictEq(a: AttrVal, b: AttrVal): Boolean = (a, b) match {
    case (SVal(x), SVal(y))       => x == y
    case (NVal(x), NVal(y))       => x.compare(y) == 0
    case (BoolVal(x), BoolVal(y)) => x == y
    case (NullVal, NullVal)       => true
    case _                        => false
  }

  /** Diff two object-typed nodes at path prefix `level`. */
  def compare(newV: AttrVal, oldV: AttrVal, level: String): DiffResult = {
    val newKeys = keysOf(newV)
    val oldKeys = keysOf(oldV)
    val oldSet = oldKeys.toSet
    val newSet = newKeys.toSet
    val inBoth = newKeys.filter(oldSet.contains)
    val inNewOnly = newKeys.filterNot(oldSet.contains)
    val inOldOnly = oldKeys.filterNot(newSet.contains)

    val paths = Vector.newBuilder[String]
    val before = Vector.newBuilder[(String, AttrVal)]
    val after = Vector.newBuilder[(String, AttrVal)]

    inNewOnly.foreach { k =>
      after += ((k, getKey(newV, k)))
      paths += s"$level$k"
    }
    inOldOnly.foreach { k =>
      before += ((k, getKey(oldV, k)))
      paths += s"$level$k"
    }
    inBoth.foreach { k =>
      val nv = getKey(newV, k)
      val ov = getKey(oldV, k)
      if (isObjectType(nv) && isObjectType(ov) && !isArray(nv) && !isArray(ov)) {
        val child = compare(nv, ov, s"$level$k.")
        if (child.attributesChanged.nonEmpty) {
          before += ((k, child.before))
          after += ((k, child.after))
          paths += s"$level$k"
          paths ++= child.attributesChanged
        }
      } else if (isArray(nv) && isArray(ov)) {
        if (AttrVal.printJson(nv) != AttrVal.printJson(ov)) {
          before += ((k, ov))
          after += ((k, nv))
          paths += s"$level$k"
        }
      } else {
        if (!jsStrictEq(nv, ov)) {
          before += ((k, ov))
          after += ((k, nv))
          paths += s"$level$k"
        }
      }
    }
    DiffResult(paths.result(), MVal(before.result()), MVal(after.result()))
  }

  /** Reconstruct the new image from the old image plus the minimal
    * `before`/`after` deltas — the consumer-side inverse of [[diffImages]]
    * (a bus subscriber holding prior state can apply events without
    * fetching full images).
    *
    * Exact for the scalar/number/string/bool/null/map/array universe.
    * NOT exact for set values (invisible to the diff, quirk Q3 — strict
    * mode) and binary (diffed at byte-index granularity, Q4): callers in
    * engine mode should normalize sets first ([[AttrVal.normalizeSets]]).
    * `null` and `{}` are mutually invisible (Q1), so reconstruction is
    * exact only up to that equivalence — see [[eqModNull]].
    */
  def applyPatch(old: MVal, before: MVal, after: MVal): MVal = {
    val removed = before.keys.filterNot(after.asMap.contains).toSet
    val kept = old.fields.filterNot { case (k, _) => removed.contains(k) }
    val afterMap = after.asMap
    val beforeMap = before.asMap
    val patched = kept.map { case (k, ov) =>
      afterMap.get(k) match {
        case Some(av: MVal) if beforeMap.get(k).exists(_.isInstanceOf[MVal]) =>
          // recursion case: minimal child objects; null old side acts as {}
          val oldChild = ov match {
            case m: MVal  => m
            case NullVal  => AttrVal.emptyM
            case _        => AttrVal.emptyM // cross-type guarded by diff semantics
          }
          (k, applyPatch(oldChild, beforeMap(k).asInstanceOf[MVal], av))
        case Some(av) => (k, av)
        case None     => (k, ov)
      }
    }
    val existing = patched.map(_._1).toSet
    val added = after.fields.filterNot { case (k, _) => existing.contains(k) || removed.contains(k) }
    MVal(patched ++ added)
  }

  /** Structural equality modulo JS-diff invisibilities: key order ignored,
    * numbers by value, and `null` ≡ `{}` (quirk Q1).
    */
  def eqModNull(a: AttrVal, b: AttrVal): Boolean = (a, b) match {
    case (NullVal, NullVal)                   => true
    case (NullVal, MVal(fs))                  => fs.isEmpty
    case (MVal(fs), NullVal)                  => fs.isEmpty
    case (SVal(x), SVal(y))                   => x == y
    case (NVal(x), NVal(y))                   => x.compare(y) == 0
    case (BoolVal(x), BoolVal(y))             => x == y
    case (BVal(x), BVal(y))                   => x == y
    case (LVal(x), LVal(y))                   => x.length == y.length && x.lazyZip(y).forall(eqModNull)
    case (x: MVal, y: MVal) =>
      x.fields.map(_._1).toSet == y.fields.map(_._1).toSet &&
        x.fields.forall { case (k, v) => eqModNull(v, y.asMap(k)) }
    case (SSVal(x), SSVal(y))                 => x.sorted == y.sorted
    case (NSVal(x), NSVal(y))                 => x.sortBy(_.toString) == y.sortBy(_.toString)
    case (BSVal(x), BSVal(y))                 => x.map(_.toVector).sortBy(_.toString) == y.map(_.toVector).sortBy(_.toString)
    case _                                    => false
  }

  /** Top-level entry mirroring `compareJSON({newImage, oldImage, level: ""})`
    * where either image may be absent (`Object.keys(undefined || {}) == []` —
    * INSERT puts everything in `after`, REMOVE everything in `before`).
    */
  def diffImages(newImage: Option[MVal], oldImage: Option[MVal]): DiffResult =
    compare(newImage.getOrElse(AttrVal.emptyM), oldImage.getOrElse(AttrVal.emptyM), "")
}
