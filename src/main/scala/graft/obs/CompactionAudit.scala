package graft.obs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.streaming.StreamingSessions

/** The compaction cost story, measured (r19 verdict item 5): every monitor
  * ships compact* entry points and the store design's flat-per-trigger
  * claim RESTS on them, but no artifact had numbers. This main drives the
  * busiest composite-store monitor (sessions: summed session partials +
  * LWW open state) over the full event log in `nSlices` contiguous slices
  * TWICE via the real [[StreamingSessions.admissionBatch]]:
  *
  *  - CONTROL: all triggers against ever-accumulating stores;
  *  - COMPACTED: identical, except after trigger `foldAfter` commits, both
  *    stores fold into fresh dirs ([[StreamingSessions.compactSessionStore]]
  *    / `compactOpenStore` — the fold itself timed as `compact_cost`) and
  *    the remaining triggers run against the compacted stores.
  *
  * Per-trigger wall/cpu is recorded SEPARATELY per slice in both regimes,
  * so "compaction keeps per-trigger cost flat as history grows" is read
  * directly off the artifact; `final_equal` pins that the two regimes'
  * on-demand [[StreamingSessions.liveSessionTable]]s are row-identical
  * (compaction is probe-transparent at full scale, not just in the spec's
  * small forcing). Prints one JSON line (and writes args(0), default
  * `COMPACTION_AUDIT.json`).
  */
object CompactionAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nSlices = 12
    val foldAfter = 5L
    val gapMs = 30 * 60 * 1000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ev = graft.ops.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        graft.ops.Sessions.msFloor(spark, sfDir).as("ms"),
        graft.ops.Exact.c2(col("value")).as("c2"))
      .persist()
    val total = ev.count()
    val (loId, hiId) = {
      val r = ev.agg(org.apache.spark.sql.functions.min(col("event_id")),
        org.apache.spark.sql.functions.max(col("event_id"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val span = hiId - loId + 1
    def sliceOf(i: Int) = {
      val from = loId + i * span / nSlices
      val to = loId + (i + 1) * span / nSlices
      ev.filter(col("event_id") >= from && col("event_id") < to)
        .as[StreamingSessions.SessionEvent]
    }

    def timed[A](body: => A): (A, Double, Double) = {
      var out: Option[A] = None
      val t0 = System.nanoTime()
      val (_, snap) = ScopedMetrics.measure(spark) { out = Some(body) }
      (out.get, (System.nanoTime() - t0) / 1e9, snap.executorCpuNs / 1e9)
    }

    /** One regime: per-trigger (wall, cpu) series; `fold` runs between
      * trigger `foldAfter` and `foldAfter`+1 and returns the repointed
      * (sessDir, openDir).
      */
    def regime(tag: String,
        fold: Option[(String, String) => (String, String)])
        : (Seq[(Int, Double, Double)], String) = {
      val base = graft.ops.Scratch.dir(s"graft_compaudit_$tag").toString
      var sessDir = s"$base/sessions"
      var openDir = s"$base/open"
      val series = (0 until nSlices).map { i =>
        fold.foreach { f =>
          if (i.toLong == foldAfter + 1) {
            val (s2, o2) = f(sessDir, openDir)
            sessDir = s2; openDir = o2
          }
        }
        val batch = sliceOf(i).persist()
        batch.count()
        val (_, wall, cpu) = timed {
          StreamingSessions.admissionBatch(batch, i.toLong,
            StreamingSessions.emptyOpenState(spark), sessDir, openDir, gapMs,
            (df, _) => { df.count(); () })
        }
        batch.unpersist()
        (i, wall, cpu)
      }
      (series, sessDir)
    }

    val (control, controlSess) = regime("control", None)

    var compactCost = (0.0, 0.0)
    var foldedRows = (0L, 0L)
    var rowsBefore = (0L, 0L)
    val (compacted, compactedSess) = regime("folded", Some { (sessDir, openDir) =>
      val base = graft.ops.Scratch.dir("graft_compaudit_out").toString
      rowsBefore = (
        StreamingSessions.readSessionStore(spark, sessDir).count(),
        StreamingSessions.readOpenStore(spark, openDir).count())
      val ((nSess, nOpen), wall, cpu) = timed {
        (StreamingSessions.compactSessionStore(spark, sessDir,
            s"$base/sessions", foldAfter),
          StreamingSessions.compactOpenStore(spark, openDir,
            s"$base/open", foldAfter))
      }
      compactCost = (wall, cpu)
      foldedRows = (nSess, nOpen)
      (s"$base/sessions", s"$base/open")
    })

    // probe transparency at full scale: the two regimes' live tables agree
    val liveA = StreamingSessions.liveSessionTable(spark, controlSess,
      StreamingSessions.emptySessionTable(spark))
    val liveB = StreamingSessions.liveSessionTable(spark, compactedSess,
      StreamingSessions.emptySessionTable(spark))
    val finalEqual = liveA.count() == liveB.count() &&
      liveA.exceptAll(liveB).isEmpty && liveB.exceptAll(liveA).isEmpty

    def r2(v: Double) = math.rint(v * 100) / 100.0
    def series(s: Seq[(Int, Double, Double)]) = s.map { case (i, w, c) =>
      s"""{"batch":$i,"wall_s":${r2(w)},"cpu_s":${r2(c)}}"""
    }.mkString(",")
    val json = s"""{"metric":"compaction_audit","workload":"sessions",""" +
      s""""input_rows":$total,"slices":$nSlices,"fold_after":$foldAfter,""" +
      s""""control":[${series(control)}],"compacted":[${series(compacted)}],""" +
      s""""compact_cost":{"wall_s":${r2(compactCost._1)},""" +
      s""""cpu_s":${r2(compactCost._2)},"sess_rows":${foldedRows._1},""" +
      s""""open_rows":${foldedRows._2}},""" +
      s""""rows_before_fold":{"sess":${rowsBefore._1},"open":${rowsBefore._2}},""" +
      s""""final_equal":$finalEqual,"sf":"$sfDir"}"""
    val outPath = if (args.nonEmpty) args(0) else "COMPACTION_AUDIT.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
