package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Parameter-space sweep of the codegen'd [[HyperplaneBuckets]] against an
  * independent scalar reference: the fixed-parameter parity spec in OpsSpec
  * covers the production operating point; this sweeps (tables, bits,
  * probes) arity and adversarial vectors (empty, zeros, negatives,
  * shorter/longer than the 64-dim planes) so a codegen edit cannot drift at
  * a shape the defaults don't exercise. Deterministic (seeded) — failures
  * reproduce.
  */
class HyperplaneBucketsFuzzSpec extends SparkSuite {

  /** Scalar reference: same contract as the expression scaladoc. */
  private def reference(emb: Array[Float], planes: Array[Array[Array[Double]]],
      probes: Int): Array[Long] = {
    val nTables = planes.length
    val bits = planes(0).length
    val out = new Array[Long](nTables * (1 + probes))
    for (t <- 0 until nTables) {
      val margins = new Array[Double](bits)
      var home = 0L
      for (i <- 0 until bits) {
        var acc = 0.0
        val p = planes(t)(i)
        val n = math.min(emb.length, p.length)
        var j = 0
        while (j < n) { acc += emb(j).toDouble * p(j); j += 1 }
        if (acc >= 0) home |= (1L << i)
        margins(i) = math.abs(acc)
      }
      out(t * (1 + probes)) = home
      var used = 0L
      for (q <- 1 to probes) {
        var best = -1
        var bm = Double.MaxValue
        for (b <- 0 until bits if ((used >> b) & 1L) == 0L && margins(b) < bm) {
          bm = margins(b); best = b
        }
        used |= (1L << best)
        out(t * (1 + probes) + q) = home ^ (1L << best)
      }
    }
    out
  }

  test("codegen expression == scalar reference across the parameter space") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vecs: Seq[Array[Float]] = Seq(
      Array.empty[Float],
      Array.fill(64)(0f),
      Array.fill(5)(-1f),                              // shorter than dim
      Array.fill(80)(rnd.nextFloat() * 2 - 1),         // longer than dim
      Array.fill(64)(rnd.nextFloat() * 2e6f - 1e6f),   // large magnitudes
      Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "embedding")
    for {
      nTables <- Seq(1, 2, 4)
      bits <- Seq(1, 2, 3, 5, 8)
      probes <- 0 to math.min(3, bits)
    } {
      val planes = graft.ops.Similarity.hyperplanes(nTables, bits)
      val got = df.select(col("id"),
          VectorFunctions.hyperplane_buckets(col("embedding"), planes, probes))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      vecs.zipWithIndex.foreach { case (v, i) =>
        val want = reference(v, planes, probes)
        assert(got(i.toLong).sameElements(want),
          s"drift at tables=$nTables bits=$bits probes=$probes vecLen=${v.length}: " +
            s"got ${got(i.toLong).mkString(",")} want ${want.mkString(",")}")
      }
    }
  }
}
