package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF example — the user-extension aggregation surface
  * (`spark.udf.register("graft_var", udaf(WelfordVariance))`).
  *
  * Sample variance via Chan's parallel Welford update: the buffer
  * (count, mean, M2) is MERGEABLE, which is the property that makes a
  * custom aggregate a first-class distributed citizen — partial states
  * combine map-side exactly like Spark's built-ins, so the shuffle carries
  * one 24-byte buffer per group per mapper regardless of row count. The
  * single-pass sum-of-squares shortcut is avoided deliberately: it
  * catastrophically cancels at large magnitudes.
  */
final case class WelfordBuf(n: Long, mean: Double, m2: Double)

object WelfordVariance extends Aggregator[Double, WelfordBuf, Double] {
  type Buf = WelfordBuf
  private def Buf(n: Long, mean: Double, m2: Double) = WelfordBuf(n, mean, m2)

  override def zero: Buf = Buf(0L, 0.0, 0.0)

  override def reduce(b: Buf, x: Double): Buf = {
    val n = b.n + 1
    val d = x - b.mean
    val mean = b.mean + d / n
    Buf(n, mean, b.m2 + d * (x - mean))
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      Buf(n, a.mean + d * b.n / n, a.m2 + b.m2 + d * d * a.n * b.n / n)
    }
  }

  /** Sample variance; NaN below 2 observations (var_samp parity). */
  override def finish(b: Buf): Double =
    if (b.n < 2) Double.NaN else b.m2 / (b.n - 1)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
