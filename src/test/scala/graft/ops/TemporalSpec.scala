package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSuite {

  test("scd2Dimension: contiguous version chains, one current row per user, no repeat versions") {
    val rows = Temporal.scd2Dimension(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, versions) =>
      val sorted = versions.sortBy(_.getLong(1)) // by event_id
      // exactly one open (current) version, and it is the last one
      assert(sorted.count(_.getLong(5) == 1L) == 1)
      assert(sorted.last.isNullAt(4) && sorted.last.getLong(5) == 1L)
      sorted.sliding(2).foreach {
        case Array(prev, next) =>
          // ranges chain: valid_to of one version == valid_from of the next
          assert(prev.getLong(4) == next.getLong(3))
          // consecutive versions differ (repeats were collapsed)
          assert(prev.getString(2) != next.getString(2))
        case _ =>
      }
    }
  }

  test("temporalJoin: every purchase maps to exactly ONE containing version") {
    val facts = Tables.events(spark, sf).filter(col("event_type") === "purchase")
    val out = Temporal.temporalJoin(spark, sf).collect()
    // one output row per fact — the half-open ranges tile without overlap
    assert(out.length.toLong == facts.count())
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    // containment holds row by row, and the picked state is genuinely the
    // version active at the fact's time: from <= ms < to
    out.foreach { r =>
      val ms = r.getLong(2); val since = r.getLong(6)
      assert(ms >= since, s"fact ${r.getLong(0)} before its version")
    }
    // spot-reconcile against the dimension: the matched version must be the
    // LAST version opened at or before the fact's ms for that user
    val dim = Temporal.scd2Dimension(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    // data contract (temporalJoin scaladoc): ts monotone in event_id per
    // user — version valid_from must be non-decreasing in event_id order,
    // else ranges overlap and the exactly-one-match tiling breaks. This is
    // the testdata-regeneration tripwire for the whole temporal family.
    dim.values.foreach { versions =>
      versions.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) <= b.getLong(3),
            s"ts not monotone in event_id for user ${a.getLong(0)} — temporal ranges overlap")
        case _ =>
      }
    }
    out.take(200).foreach { r =>
      val versions = dim(r.getLong(1))
      val expect = versions.filter(_.getLong(3) <= r.getLong(2)).last
      assert(expect.getLong(1) == r.getLong(4),
        s"fact ${r.getLong(0)} picked version ${r.getLong(4)}, expected ${expect.getLong(1)}")
    }
  }

  test("eventAnomalies: flags exactly the |z|>3 tail, integer-exactly") {
    val out = Temporal.eventAnomalies(spark, sf).collect()
    assert(out.nonEmpty)
    // recompute the moments driver-side in BigInt and re-derive the flag set
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), Exact.c2(col("value")).as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byType = ev.groupBy(_._2).view.mapValues { rows =>
      val n = BigInt(rows.length)
      val s = rows.map(r => BigInt(r._3)).sum
      val q = rows.map(r => BigInt(r._3) * BigInt(r._3)).sum
      (n, s, q)
    }.toMap
    val expected = ev.filter { case (_, t, v) =>
      val (n, s, q) = byType(t)
      val dev = n * BigInt(v) - s
      dev * dev > 9 * (n * q - s * s)
    }.map(_._1).toSet
    assert(out.map(_.getLong(0)).toSet == expected)
    // z_sign marks the side of the mean
    out.foreach { r =>
      val (n, s, _) = byType(r.getString(1))
      val dev = n * BigInt(r.getLong(2)) - s
      assert((if (dev > 0) 1L else -1L) == r.getLong(3))
    }
  }

  test("eventAnomaliesRobust: flags exactly the 5-MAD tail from driver-side median/MAD") {
    val out = Temporal.eventAnomaliesRobust(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), Exact.c2(col("value")).as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // value-at-rank-ceil(n/2) lower median, the discrete semantics both
    // engines pin
    def atMedian(xs: Seq[Long]): Long = xs.sorted.apply(((xs.size + 1) / 2) - 1)
    val stats = ev.groupBy(_._2).view.mapValues { rows =>
      val med = atMedian(rows.map(_._3).toSeq)
      val mad = atMedian(rows.map(r => math.abs(r._3 - med)).toSeq)
      (med, mad)
    }.toMap
    val expected = ev.filter { case (_, t, v) =>
      val (med, mad) = stats(t); math.abs(v - med) > 5L * mad
    }.map(_._1).toSet
    assert(out.map(_.getLong(0)).toSet == expected)
    out.foreach { r =>
      val (med, mad) = stats(r.getString(1))
      assert(r.getLong(3) == med && r.getLong(4) == mad, "evidence columns drifted")
    }
    // the two detectors see the same heavy tail differently but overlap:
    // every 5-MAD flag set is nonempty per type present in the z-flags
    assert(out.map(_.getString(1)).toSet.nonEmpty)
  }

  test("incrementalAnomalies: merged-moment flags equal the batch detector's new-slice rows") {
    val full = Temporal.eventAnomalies(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    val inc = Temporal.incrementalAnomalies(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(inc.nonEmpty)
    assert(inc.forall(_._1 % 10 == 0), "incremental form flagged old-slice events")
    assert(inc.map(_._1).toSet == full.keySet.filter(_ % 10 == 0),
      "flag coverage differs from the batch detector's new slice")
    assert(inc.forall { case (id, z) => full(id) == z }, "z_sign drifted")
  }

  test("scd2AsOf: at most one version per user, and exactly the containing one") {
    val t = 1706572800000L
    val out = Temporal.scd2AsOf(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).distinct.length == out.length, "a user got two versions")
    val dim = Temporal.scd2Dimension(spark, sf).collect()
    val expected = dim.filter { r =>
      r.getLong(3) <= t && (r.isNullAt(4) || t < r.getLong(4))
    }.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
  }

  test("winsorizedStats: clipped sums and clip counts recompute exactly") {
    val out = Temporal.winsorizedStats(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), Exact.c2(col("value")).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1)
    assert(out.map(_.getString(0)).toSet == byType.keySet)
    out.foreach { r =>
      val vs = byType(r.getString(0)).map(_._2).toSeq
      val sorted = vs.sorted
      def atRank(num: Long, den: Long): Long =
        sorted(((num * vs.size + den - 1) / den - 1).toInt)
      val (p05, p95) = (atRank(1, 20), atRank(19, 20))
      assert(r.getLong(5) == p05 && r.getLong(6) == p95, "clip points drifted")
      assert(r.getLong(1) == vs.size.toLong)
      assert(r.getLong(2) == vs.map(v => v.max(p05).min(p95)).map(BigInt(_)).sum)
      assert(r.getLong(3) == vs.count(_ < p05).toLong)
      assert(r.getLong(4) == vs.count(_ > p95).toLong)
    }
  }

  test("eventChangepoint: BigInt recompute of the argmax and every floored export") {
    val out = Temporal.eventChangepoint(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), if (r.isNullAt(6)) None else Some(r.getLong(6)))))
      .toMap
    def floorDiv(a: BigInt, b: BigInt): BigInt = {
      val q = a / b
      if (a % b != 0 && (a < 0) != (b < 0)) q - 1 else q
    }
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), Sessions.dayIdx(spark, sf).as("day"),
        Exact.c2(col("value")).as("c2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = daily.groupBy(_._1).map { case (et, rows) =>
      val byDay = rows.groupBy(_._2)
        .map { case (day, rs) => (day, rs.map(x => BigInt(x._3)).sum) }
        .toSeq.sortBy(_._1)
      val n = BigInt(byDay.size)
      val total = byDay.map(_._2).sum
      var prefix = BigInt(0)
      val scored = byDay.zipWithIndex.map { case ((day, v), i) =>
        prefix += v
        (day, BigInt(i + 1), prefix, (prefix * n - BigInt(i + 1) * total).abs)
      }
      // argmax stat, earliest day on ties (strict-greater keeps the first)
      val (day, t, pfx, stat) = scored.reduceLeft((a, b) => if (b._4 > a._4) b else a)
      val after = if (t < n) Some(floorDiv(total - pfx, n - t).toLong) else None
      (et, (day, t.toLong, n.toLong, (stat / n).toLong, floorDiv(pfx, t).toLong, after))
    }
    assert(out == want)
  }

  test("incrementalChangepoint: merged daily sums reproduce the full-log CUSUM exactly") {
    val full = Temporal.eventChangepoint(spark, sf).collect().toSeq
    val inc = Temporal.incrementalChangepoint(spark, sf).collect().toSeq
    assert(inc == full)
    assert(full.nonEmpty)
    // second call rides the memoized/persisted artifact and stays identical
    assert(Temporal.incrementalChangepoint(spark, sf).collect().toSeq == full)
  }

  test("seasonalForecast: driver recompute; gap days produce no prediction") {
    val out = Temporal.seasonalForecast(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), Sessions.dayIdx(spark, sf).as("day"),
        Exact.c2(col("value")).as("c2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case (k, rs) => (k, rs.map(_._3).sum) }
    val want = daily.keys.toSeq.flatMap { case (et, day) =>
      daily.get((et, day - 7)).map(pred => (et, daily((et, day)) - pred))
    }.groupBy(_._1).map { case (et, errs) =>
      (et, (errs.size.toLong, errs.map(e => math.abs(e._2)).sum, errs.map(_._2).sum))
    }
    assert(out == want)
    assert(out.nonEmpty)
  }

  test("incrementalForecast: merged daily sums reproduce the full-log backtest exactly") {
    val full = Temporal.seasonalForecast(spark, sf).collect().toSeq
    val inc = Temporal.incrementalForecast(spark, sf).collect().toSeq
    assert(inc == full)
    assert(full.nonEmpty)
  }

  test("gapFillDaily: per-type day grid is contiguous, fills are zero, totals are preserved") {
    val out = Temporal.gapFillDaily(spark, sf).collect()
    out.groupBy(_.getString(0)).foreach { case (_, days) =>
      val idx = days.map(_.getLong(1)).sorted
      assert(idx.zip(idx.min to idx.max).forall { case (a, b) => a == b })
    }
    val nTotal = out.map(_.getLong(2)).sum
    val raw = Tables.events(spark, sf).count()
    assert(nTotal == raw)
    assert(out.filter(_.getLong(2) == 0L).forall(_.getLong(3) == 0L))
  }

  test("rollingRevenue7d matches a windowed recompute") {
    val out = Temporal.rollingRevenue7d(spark, sf).collect()
    val daily = out.map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    out.foreach { r =>
      val expected = (r.getLong(1) - 6 to r.getLong(1))
        .flatMap(day => daily.get((r.getString(0), day))).sum
      assert(r.getLong(3) == expected, s"rolling mismatch at $r")
    }
  }

  test("snapshotDiff equals an independent two-snapshot recompute") {
    val out = Temporal.snapshotDiff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), Sessions.msFloor(spark, sf).as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def snap(t: Long): Map[Long, Long] = events
      .filter(e => e._3 > t - 7L * 86400000L && e._3 <= t)
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).max }
    val a = snap(1705276800000L); val b = snap(1706572800000L)
    val want = (a.keySet ++ b.keySet).flatMap { u =>
      (a.get(u), b.get(u)) match {
        case (None, Some(n))                  => Some((u, "INSERT", None, Some(n)))
        case (Some(o), None)                  => Some((u, "REMOVE", Some(o), None))
        case (Some(o), Some(n)) if o != n     => Some((u, "MODIFY", Some(o), Some(n)))
        case _                                => None
      }
    }
    assert(out == want)
    assert(out.exists(_._2 == "MODIFY")) // diff is non-trivial at this sf
    // the liveness window must reach the scan as raw ts bounds (pushable to
    // parquet zone maps) — not sit above it as a derived-ms filter
    val scans = Temporal.snapshotDiff(spark, sf).queryExecution.executedPlan
      .collectLeaves().map(_.toString).mkString
    assert(scans.contains("GreaterThan(ts,") && scans.contains("LessThanOrEqual(ts,"),
      s"ts bounds not pushed to the scan:\n${scans.take(500)}")
  }

  test("batchPacking: prefix-sum assignment recomputes exactly; batches are contiguous") {
    val rows = TextOps.batchPacking(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._2)
      var cum = 0L
      ordered.foreach { case (_, _, nChars, cumChars, batchIdx) =>
        assert(batchIdx == cum / 4000L) // assigned where the prefix starts
        cum += nChars
        assert(cumChars == cum)
      }
      // batch ids are non-decreasing and start at 0
      assert(ordered.head._5 == 0L)
      ordered.map(_._5).sliding(2).foreach { case Array(x, y) => assert(x <= y); case _ => }
    }
  }

  test("prioritySample: byte-deterministic, equals brute-force top-k, biased toward weight") {
    val s1 = TextOps.prioritySample(spark, sf).collect()
    val s2 = TextOps.prioritySample(spark, sf).collect()
    assert(s1.toSeq == s2.toSeq && s1.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = docs.groupBy(_._2).values.toSeq.flatMap { ds =>
      ds.toSeq.map { case (id, lang, n) =>
        val u = ((id % 2147483648L) * 2654435761L) % 4294967296L + 1L
        (id, lang, n, n * 4294967296L / u)
      }.sortBy { case (id, _, _, p) => (-p, id) }.take(20)
    }.toSet
    val got = s1.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    // weight bias: the sample's mean length exceeds the corpus mean
    val sampleMean = s1.map(_.getLong(2)).sum.toDouble / s1.length
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    assert(sampleMean > corpusMean,
      s"priority sample not weight-biased: $sampleMean <= $corpusMean")
  }

  test("latenessProfile: naive driver recompute; segment-size invariant") {
    val out = Temporal.latenessProfile(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), Sessions.msFloor(spark, sf).as("ms"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).map { case (et, rs) =>
      val ordered = rs.sortBy(_._2).map(_._3)
      var runMax = Long.MinValue
      val lates = ordered.map { ms =>
        val l = if (runMax > ms) runMax - ms else 0L
        runMax = math.max(runMax, ms)
        l
      }
      (et, (ordered.length.toLong, lates.count(_ > 0).toLong, lates.max,
        lates.sum, lates.count(_ > 0).toLong * 1000000L / ordered.length))
    }
    assert(out == want)
    // the carry-in decomposition is segment-size invariant (tiny segments
    // force many cross-segment carries)
    val tiny = Temporal.latenessProfile(spark, sf, segSize = 4L).collect().toSeq
    assert(tiny == Temporal.latenessProfile(spark, sf).collect().toSeq)
  }

  test("watermarkRecommendation: naive driver recompute; admits >=99% by construction") {
    val got = Temporal.watermarkRecommendation(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), Sessions.msFloor(spark, sf).as("ms"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).map { case (tpe, rows) =>
      val ordered = rows.sortBy(_._2)
      var runMax = Long.MinValue
      val late = ordered.map { case (_, _, ms) =>
        val l = if (runMax > ms) runMax - ms else 0L
        runMax = math.max(runMax, ms)
        l
      }
      val n = late.length.toLong
      val rec = late.sorted.apply(((99L * n + 99L) / 100L - 1L).toInt)
      val admitted = late.count(_ <= rec).toLong
      (tpe, n, rec, admitted, admitted * 1000000L / n)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
    got.foreach { case (tpe, _, _, _, ppm) =>
      assert(ppm >= 990000L, s"recommendation for $tpe admits < 99%")
    }
  }

  test("interarrivalStats: naive driver recompute of the exact selections") {
    val out = Temporal.interarrivalStats(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("event_id"),
        Sessions.msFloor(spark, sf).as("ms"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(x => (x._2, x._1)).toSeq
      .flatMap { case ((_, tpe), rs) =>
        rs.sortBy(_._3).map(_._4).toSeq.sliding(2).collect {
          case Seq(a, b) => (tpe, b - a) }
      }
      .groupBy(_._1).map { case (tpe, gs) =>
        val sorted = gs.map(_._2).sorted
        val n = sorted.length.toLong
        def at(num: Long, den: Long) = sorted(((num * n + den - 1) / den - 1).toInt)
        (tpe, (n, at(1, 2), at(19, 20), sorted.last))
      }
    assert(out == want)
    out.values.foreach { case (_, p50, p95, mx) =>
      assert(p50 >= 0L && p50 <= p95 && p95 <= mx) }
  }

  test("dailyBurstiness + dailyAutoregression: driver recompute over the zero-filled series") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), Sessions.dayIdx(spark, sf).as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (lo, hi) = (ev.map(_._2).min, ev.map(_._2).max)
    val series = ev.map(_._1).distinct.sorted.map { tpe =>
      val byDay = ev.filter(_._1 == tpe).groupBy(_._2).map { case (d, xs) => (d, xs.size.toLong) }
      (tpe, (lo to hi).map(d => byDay.getOrElse(d, 0L)))
    }

    val fano = Temporal.dailyBurstiness(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val wantFano = series.map { case (tpe, xs) =>
      val n = BigInt(xs.length); val s = BigInt(xs.sum)
      val q = xs.map(x => BigInt(x) * x).sum
      (tpe, (xs.length.toLong, xs.sum, ((n * q - s * s) * 1000000 / (n * s)).toLong))
    }.toMap
    assert(fano == wantFano)

    val beta = Temporal.dailyAutoregression(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val wantBeta = series.map { case (tpe, xs) =>
      val pairs = xs.sliding(2).collect { case Seq(a, b) => (BigInt(a), BigInt(b)) }.toSeq
      val n = BigInt(pairs.length)
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum; val sxx = pairs.map(p => p._1 * p._1).sum
      (tpe, (pairs.length.toLong, ((n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)).toLong))
    }.toMap
    assert(beta == wantBeta)
  }

  test("incremental daily stats reproduce the full-log burstiness and autoregression") {
    assert(Temporal.incrementalBurstiness(spark, sf).collect().toSeq ==
      Temporal.dailyBurstiness(spark, sf).collect().toSeq)
    assert(Temporal.incrementalAutoregression(spark, sf).collect().toSeq ==
      Temporal.dailyAutoregression(spark, sf).collect().toSeq)
  }

  test("dailyDrift: driver recompute of the total-variation distance; bounded by 2e6") {
    val out = Temporal.dailyDrift(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), Sessions.dayIdx(spark, sf).as("day"),
        graft.ops.Exact.c2(col("value")).as("c2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def floorB(v: Long) = v - (((v % 1000) + 1000) % 1000)
    val hist = ev.groupBy(x => (x._1, x._2))
      .map { case (k, rs) => (k, rs.groupBy(x => floorB(x._3))
        .map { case (b, xs) => (b, xs.size.toLong) }) }
    val want = hist.keys.toSeq.flatMap { case (tpe, day) =>
      hist.get((tpe, day - 1)).map { prev =>
        val cur = hist((tpe, day))
        val (nc, np) = (cur.values.sum, prev.values.sum)
        val drift = (cur.keySet ++ prev.keySet).toSeq.map { b =>
          math.abs(cur.getOrElse(b, 0L) * 1000000L / nc -
            prev.getOrElse(b, 0L) * 1000000L / np)
        }.sum
        ((tpe, day), (nc, np, drift))
      }
    }.toMap
    assert(out == want)
    assert(out.values.forall(_._3 <= 2000000L))
  }

  test("dailyValueBands: exact rank selections recompute per cell") {
    val out = Temporal.dailyValueBands(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val cells = Tables.events(spark, sf)
      .select(col("event_type"), Sessions.dayIdx(spark, sf).as("day"),
        Exact.c2(col("value")).as("v"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1)
    val want = cells.map { case (k, rs) =>
      val vs = rs.map(_._2).sorted
      val n = vs.length.toLong
      def at(num: Long, den: Long): Long = vs(((num * n + den - 1) / den - 1).toInt)
      (k, (n, at(1, 2), at(19, 20)))
    }
    assert(out == want)
    assert(out.nonEmpty)
  }

  test("funnelWindowed: stage-relative driver recompute; counts monotone") {
    val W = 7L * 86400000L
    val out = Temporal.funnelWindowed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._2).toSeq == Seq("signup", "view", "click", "purchase"))
    val ev = Tables.events(spark, sf)
      .withColumn("ms", Sessions.msFloor(spark, sf))
      .select("user_id", "event_type", "ms")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    def stageTimes(users: Map[Long, Long], stage: String): Map[Long, Long] =
      users.flatMap { case (u, tPrev) =>
        byUser.getOrElse(u, Array.empty[(Long, String, Long)])
          .collect { case (_, s, ms) if s == stage && ms > tPrev && ms <= tPrev + W => ms }
          .sorted.headOption.map(u -> _)
      }
    val t1 = byUser.flatMap { case (u, rs) =>
      rs.collect { case (_, "signup", ms) => ms }.sorted.headOption.map(u -> _)
    }.toMap
    val t2 = stageTimes(t1, "view")
    val t3 = stageTimes(t2, "click")
    val t4 = stageTimes(t3, "purchase")
    val want = Seq((1L, "signup", t1.size.toLong), (2L, "view", t2.size.toLong),
      (3L, "click", t3.size.toLong), (4L, "purchase", t4.size.toLong))
    assert(out.toSeq == want)
    out.map(_._3).sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
  }

  test("incrementalFunnelWindowed equals the batch funnel on the full log") {
    assert(Temporal.incrementalFunnelWindowed(spark, sf).collect().toSeq ==
      Temporal.funnelWindowed(spark, sf).collect().toSeq)
  }

  test("mergeStageTimes: a cross-boundary conversion advances the ladder") {
    import spark.implicits._
    val W = 7L * 86400000L
    // history: user 1 signed up at ms 0 and nothing else; user 2 reached
    // view; user 3 exists only in the suffix
    val hist = Seq(
      (1L, "signup", 0L),
      (2L, "signup", 0L), (2L, "view", 10L)).toDF("user_id", "event_type", "ms")
    val state = Temporal.stageTimes(hist, W)
    val suffix = Seq(
      (1L, "view", 100L),              // in-window: stage 2 crosses the boundary
      (1L, "click", 200L),             // chains on the suffix-set t2
      (1L, "purchase", W + 201L),      // OUT of window relative to t3=200
      (2L, "view", 20L),               // later than history's t2 — must not win
      (2L, "click", 30L),
      (3L, "signup", 50L), (3L, "view", 60L)).toDF("user_id", "event_type", "ms")
    // merge drops/re-adds stage columns, so read them BY NAME
    val byName = Temporal.mergeStageTimes(state, suffix, W)
      .select("user_id", "t1", "t2", "t3", "t4")
      .collect().map(r => r.getLong(0) -> ((1 to 4).map(i =>
        if (r.isNullAt(i)) None else Some(r.getLong(i))))).toMap
    assert(byName(1L) == Seq(Some(0L), Some(100L), Some(200L), None),
      "cross-boundary conversion did not advance user 1's ladder")
    assert(byName(2L) == Seq(Some(0L), Some(10L), Some(30L), None),
      "suffix event beat the history's earlier stage time")
    assert(byName(3L) == Seq(Some(50L), Some(60L), None, None),
      "suffix-only user did not enter the funnel")
    assert(byName.keySet == Set(1L, 2L, 3L))
  }

  test("touchAttribution: driver recompute; credit mass bounded by purchases") {
    val W = 7L * 86400000L
    val out = Temporal.touchAttribution(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Sessions.msFloor(spark, sf).as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val touchTypes = Set("signup", "view", "click")
    val credited = ev.filter(_._3 == "purchase").flatMap { case (u, pid, _, tp) =>
      val ts = byUser(u).filter(x => touchTypes(x._3) && x._4 >= tp - W && x._4 < tp)
      ts.map(x => (x._3, pid, ts.length.toLong))
    }
    val want = credited.groupBy(_._1).map { case (tpe, rs) =>
      (tpe, (rs.length.toLong, rs.map(_._2).distinct.length.toLong,
        rs.map(r => 1000000L / r._3).sum))
    }
    assert(out == want)
    // total credit mass cannot exceed 1e6 per credited purchase
    val nCredited = credited.map(_._2).distinct.length.toLong
    assert(out.values.map(_._3).sum <= 1000000L * nCredited)
  }

  test("conversionLagBands: exact discrete p50/p95 lag per type vs driver recompute") {
    val W = 7L * 86400000L
    val out = Temporal.conversionLagBands(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        Sessions.msFloor(spark, sf).as("ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val touchTypes = Set("signup", "view", "click")
    val lags = ev.filter(_._2 == "purchase").flatMap { case (u, _, tp) =>
      byUser(u).filter(x => touchTypes(x._2) && x._3 >= tp - W && x._3 < tp)
        .map(x => (x._2, tp - x._3))
    }
    val want = lags.groupBy(_._1).map { case (tpe, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length.toLong
      def at(num: Long, den: Long) = sorted(((num * n + den - 1) / den - 1).toInt)
      (tpe, (n, at(1, 2), at(19, 20)))
    }
    assert(out == want)
  }

  test("incrementalAttribution: window-tail merge reproduces the full log; boundary credit exercised") {
    val full = Temporal.touchAttribution(spark, sf).collect().toSeq
    assert(Temporal.incrementalAttribution(spark, sf).collect().toSeq == full)
    assert(full.nonEmpty)
    // non-vacuity: at least one suffix purchase credits a HISTORY touch
    // (otherwise the tail store was never exercised)
    val W = 7L * 86400000L
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Sessions.msFloor(spark, sf).as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val cut = ev.map(_._2).max * 9 / 10
    val touchTypes = Set("signup", "view", "click")
    val byUser = ev.groupBy(_._1)
    val crossCredits = ev
      .filter(e => e._3 == "purchase" && e._2 > cut)
      .count { case (u, _, _, tp) =>
        byUser(u).exists(x =>
          touchTypes(x._3) && x._2 <= cut && x._4 >= tp - W && x._4 < tp) }
    assert(crossCredits > 0,
      "no suffix purchase credited a history touch — the tail path is unexercised")
  }

  test("positionAttribution: driver recompute of the U-shaped 40/20/40 credit") {
    val W = 7L * 86400000L
    val out = Temporal.positionAttribution(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Sessions.msFloor(spark, sf).as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val touchTypes = Set("signup", "view", "click")
    val credited = ev.filter(_._3 == "purchase").flatMap { case (u, pid, _, tp) =>
      // position = rank by (ms, event_id) — the engine's (t_t, t_id) order
      val ts = byUser(u).filter(x => touchTypes(x._3) && x._4 >= tp - W && x._4 < tp)
        .sortBy(x => (x._4, x._2))
      val k = ts.length
      ts.zipWithIndex.map { case (x, i) =>
        val credit =
          if (k == 1) 1000000L
          else if (k == 2) 500000L
          else if (i == 0 || i == k - 1) 400000L
          else 200000L / (k - 2)
        (x._3, pid, credit)
      }
    }
    val want = credited.groupBy(_._1).map { case (tpe, rs) =>
      (tpe, (rs.length.toLong, rs.map(_._2).distinct.length.toLong, rs.map(_._3).sum))
    }
    assert(out == want)
    // non-vacuity: all three credit arities must occur in the data, or the
    // lone/pair/middle branches went untested
    val ks = ev.filter(_._3 == "purchase").map { case (u, _, _, tp) =>
      byUser(u).count(x => touchTypes(x._3) && x._4 >= tp - W && x._4 < tp) }
    assert(ks.exists(_ == 1) && ks.exists(_ >= 3),
      "purchase touch-count arities too uniform — a credit branch is unexercised")
  }

  test("incrementalPositionAttribution: shared window tail reproduces the full log") {
    val full = Temporal.positionAttribution(spark, sf).collect().toSeq
    assert(full.nonEmpty)
    assert(Temporal.incrementalPositionAttribution(spark, sf).collect().toSeq == full)
  }

  test("decayAttribution: driver recompute of the half-life credit split") {
    val W = 7L * 86400000L
    val H = 86400000L
    val out = Temporal.decayAttribution(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Sessions.msFloor(spark, sf).as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val touchTypes = Set("signup", "view", "click")
    val credited = ev.filter(_._3 == "purchase").flatMap { case (u, pid, _, tp) =>
      val ts = byUser(u).filter(x => touchTypes(x._3) && x._4 >= tp - W && x._4 < tp)
      val ws = ts.map(x => 1000000L >> ((tp - x._4) / H).toInt)
      val sw = ws.sum
      ts.zip(ws).map { case (x, w) => (x._3, pid, w * 1000000L / sw) }
    }
    val want = credited.groupBy(_._1).map { case (tpe, rs) =>
      (tpe, (rs.length.toLong, rs.map(_._2).distinct.length.toLong, rs.map(_._3).sum))
    }
    assert(out == want)
    // per-purchase mass never exceeds 1e6 (integral-div remainders only shrink it)
    credited.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sum <= 1000000L)
    }
    // decay must actually bite: some credited touch must be >= 1 half-life old
    assert(ev.filter(_._3 == "purchase").exists { case (u, _, _, tp) =>
      byUser(u).exists(x => touchTypes(x._3) && x._4 >= tp - W && x._4 < tp - H)
    }, "no credited touch older than one half-life — decay path unexercised")
  }

  test("incrementalDecayAttribution: shared window tail reproduces the full log") {
    val full = Temporal.decayAttribution(spark, sf).collect().toSeq
    assert(full.nonEmpty)
    assert(Temporal.incrementalDecayAttribution(spark, sf).collect().toSeq == full)
  }

  test("funnelConversion: stage counts are monotonically non-increasing and stage 1 is exact") {
    val out = Temporal.funnelConversion(spark, sf).collect().sortBy(_.getLong(0))
    assert(out.map(_.getString(1)).toSeq == Seq("signup", "view", "click", "purchase"))
    val counts = out.map(_.getLong(2))
    counts.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
    val signups = Tables.events(spark, sf)
      .filter(col("event_type") === "signup").select("user_id").distinct().count()
    assert(counts.head == signups)
  }
}
