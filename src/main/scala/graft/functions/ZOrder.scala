package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve value for multi-dimensional data clustering —
  * sort a table by [[zValue]] before writing and a parquet scan with a
  * predicate box over BOTH dimensions prunes most row groups via footer
  * min/max (proven in ScaleSpec). The classic layout technique for
  * two-column point lookups on 100 TB fact tables where partitioning can
  * only cover one dimension.
  *
  * Pure integer Column arithmetic (shift/mask bit spreading, the standard
  * "magic numbers" construction) — no UDF, fuses into whole-stage codegen,
  * and every step is expressible identically in any engine with bit ops,
  * so the declared query (q_zorder) is hash-checked against the oracle.
  */
object ZOrder {

  /** Spread the low 16 bits of `c`: bit i moves to bit 2i (a zero between
    * every bit). Long arithmetic throughout — no sign-bit hazards. */
  private[functions] def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton interleave of two non-negative dimension columns
    * (each truncated to 16 bits): a's bit i → bit 2i, b's bit i → bit
    * 2i+1. Callers bucket/clamp wider domains to 16 bits first (range
    * quantization is the standard pre-step). */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
}
