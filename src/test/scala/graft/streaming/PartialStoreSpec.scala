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

      // compaction at every fold point preserves the keyed sums, lands the
      // fold in the unownable sentinel partition, and keeps the
      // uncompacted partitions' ids
      (0L to 3L).foreach { upTo =>
        val out = graft.ops.Scratch.dir(s"pstore_prop_${trial}_c$upTo").toString + "/s"
        PartialStore.compactSummed(spark, store, out, upTo, emptyStore,
          Seq("k1", "k2"), "v")
        val compacted = PartialStore.read(spark, out, emptyStore)
        assert(keyedSums(compacted.drop("batch_id")).filter(_._2 != 0L) ==
          expect.filter(_._2 != 0L), s"fold at $upTo lost mass")
        val ids = compacted.select("batch_id").distinct()
          .collect().map(_.getLong(0)).toSet
        assert(ids.filter(b => b >= 0 && b <= upTo).isEmpty,
          s"fold at $upTo left stale partitions")
        assert(!ids.contains(upTo) || upTo > 3L,
          s"fold at $upTo landed in an ownable partition")

        // the r16-ADVICE scenario: batch `upTo` REPLAYS against the
        // compacted store. Under the old fold-into-`upTo` layout the
        // replay's own-partition-exclusion probe dropped ALL folded
        // history and its overwrite then destroyed it; with the sentinel
        // the probe still sees every folded batch and the overwrite
        // touches only partition `upTo`. (Exactness of the fold point's
        // OWN mass stays a caller contract — fold only committed
        // batches — which is why the probe below equals the full sums,
        // `upTo`'s first attempt included.)
        PartialStore.write(batches(upTo.toInt).toDF("k1", "k2", "v"), upTo, out)
        val probe = PartialStore.read(spark, out, emptyStore)
          .filter(col("batch_id") =!= upTo).drop("batch_id")
        assert(keyedSums(probe).filter(_._2 != 0L) == expect.filter(_._2 != 0L),
          s"replay of fold point $upTo hid folded history from the probe")
        val sentinelSums = keyedSums(PartialStore.read(spark, out, emptyStore)
          .filter(col("batch_id") === PartialStore.FoldedBatchId).drop("batch_id"))
        val foldedExpect = batches.take(upTo.toInt + 1).flatten
          .groupBy(t => (t._1, t._2)).map { case (k, rs) => (k, rs.map(_._3).sum) }
        assert(sentinelSums.filter(_._2 != 0L) == foldedExpect.filter(_._2 != 0L),
          s"replay of fold point $upTo destroyed the sentinel partition")
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
