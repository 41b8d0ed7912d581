package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Minimal bridge into `private[sql]` Column↔Expression conversion (the
  * supported conversion utilities are package-private in Spark 4.x; hosting
  * this one-file shim inside the sql namespace is the standard extension
  * pattern for native-expression libraries).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Codegen'd bloom probe: the engine's own `BloomFilterMightContain`
    * expression (what Spark's runtime row-level filtering injects) over a
    * serialized `org.apache.spark.util.sketch.BloomFilter` — the SAME
    * implementation `DataFrameStatFunctions.bloomFilter` builds, so the
    * sketch round-trips through `writeTo`/`readFrom` losslessly. `value`
    * must be an integral column (the sketch hashes longs).
    */
  def bloomMightContain(bloomBytes: Array[Byte], value: Column): Column =
    column(BloomFilterMightContain(Literal(bloomBytes, BinaryType), expression(value)))
}
