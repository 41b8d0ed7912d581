package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The partial-store laws every monitor relies on, driven with seeded
  * random partials (the four monitors exercise the mechanics against real
  * data; this pins the algebra in isolation): replay overwrite, own-batch
  * exclusion, and compaction preserving keyed sums for any fold point.
  */
class PartialStoreSpec extends SparkSuite {

  private def emptyStore: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Long, Long)].toDF("k1", "k2", "v", "batch_id")
  }

  private def randomPartials(seed: Long, n: Int): Seq[(String, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((s"key${rnd.nextInt(5)}", rnd.nextInt(4).toLong,
      (rnd.nextInt(2001) - 1000).toLong))
  }

  private def keyedSums(df: DataFrame): Map[(String, Long), Long] =
    df.groupBy(col("k1"), col("k2")).agg(sum(col("v")).as("v"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap

  test("write/read/compact preserve keyed sums for any fold point; replay overwrites") {
    import spark.implicits._
    (0 until 3).foreach { trial =>
      val store = graft.ops.Scratch.dir(s"pstore_prop_$trial").toString + "/s"
      val batches = (0 until 4).map { b =>
        randomPartials(trial * 100L + b, 30 + 10 * b)
          .groupBy(t => (t._1, t._2))
          .map { case ((k1, k2), rs) => (k1, k2, rs.map(_._3).sum) }.toSeq
      }
      batches.zipWithIndex.foreach { case (rows, b) =>
        PartialStore.write(rows.toDF("k1", "k2", "v"), b.toLong, store)
      }
      val expect = batches.flatten.groupBy(t => (t._1, t._2))
        .map { case (k, rs) => (k, rs.map(_._3).sum) }
      assert(keyedSums(PartialStore.read(spark, store, emptyStore).drop("batch_id"))
        .filter(_._2 != 0L) == expect.filter(_._2 != 0L))

      // replaying batch 2 with the SAME content changes nothing
      PartialStore.write(batches(2).toDF("k1", "k2", "v"), 2L, store)
      assert(keyedSums(PartialStore.read(spark, store, emptyStore).drop("batch_id"))
        .filter(_._2 != 0L) == expect.filter(_._2 != 0L))

      // compaction at every fold point preserves the keyed sums and keeps
      // the uncompacted partitions' ids
      (0L to 3L).foreach { upTo =>
        val out = graft.ops.Scratch.dir(s"pstore_prop_${trial}_c$upTo").toString + "/s"
        PartialStore.compactSummed(spark, store, out, upTo, emptyStore,
          Seq("k1", "k2"), "v")
        val compacted = PartialStore.read(spark, out, emptyStore)
        assert(keyedSums(compacted.drop("batch_id")).filter(_._2 != 0L) ==
          expect.filter(_._2 != 0L), s"fold at $upTo lost mass")
        val ids = compacted.select("batch_id").distinct()
          .collect().map(_.getLong(0)).toSet
        assert(ids.filter(_ < upTo).isEmpty, s"fold at $upTo left stale partitions")
      }
    }
  }

  test("cold start returns the typed empty frame") {
    val none = PartialStore.read(spark,
      graft.ops.Scratch.dir("pstore_cold").toString + "/never", emptyStore)
    assert(none.columns.toSeq == Seq("k1", "k2", "v", "batch_id"))
    assert(none.count() == 0L)
  }
}
