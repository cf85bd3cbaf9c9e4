package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handling covers sort-
  * merge joins automatically; salting is the explicit fallback when a hot
  * key would still overwhelm one task (e.g. the null-ish "unknown user" key
  * holding 10% of a 100 TB fact table).
  *
  * Left rows get a deterministic salt from their content hash; right rows
  * are replicated once per salt value. The join key becomes
  * (keys..., salt), splitting each hot key's rows across `saltFactor`
  * tasks. Results are identical to the unsalted join (salt values only
  * partition work, never change matches).
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    val leftSalted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(saltFactor)))
    val rightSalted = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    leftSalted.join(rightSalted, keys :+ "__salt").drop("__salt")
  }
}
