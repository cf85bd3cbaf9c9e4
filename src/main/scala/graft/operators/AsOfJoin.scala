package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the payload of the latest right row with
  * rightTime <= leftTime (inclusive) for the same key. Spark has no native
  * as-of operator; per the extension ladder this composes built-ins: tag
  * both sides, union, and take a running `last(payload, ignoreNulls)` over
  * (key, time) — one shuffle on the key, window state is a single struct,
  * no range cross-product. The same plan shape survives 100 TB: it
  * partitions by key and sorts within partitions, exactly like any windowed
  * aggregation.
  *
  * Determinism contract: callers must make the right side unique per
  * (key, time) — e.g. arg-max dedupe — otherwise "which right row wins a
  * time tie" is undefined (DuckDB's native ASOF JOIN, used as the oracle,
  * leaves it undefined too). At equal timestamps the right row is visible
  * to the left row (inclusive semantics, matching ASOF's `>=`).
  */
object AsOfJoin {

  /** The time columns only need to be mutually orderable for the as-of
    * itself; tolerance bounds and nearest-gap comparisons additionally need
    * them on a microsecond number line — TimestampType converts, integral
    * epoch-µs columns pass through, anything else has no defined µs
    * distance. */
  private def asMicros(c: Column, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case TimestampType => unix_micros(c)
      case LongType | IntegerType | ShortType | ByteType => c.cast("long")
      case other => throw new IllegalArgumentException(
        s"asofJoin: toleranceUs bounds and nearest-direction gaps need " +
          s"time columns on a microsecond number line — TIMESTAMP or " +
          s"integral epoch-micros, got $other")
    }
  }

  /** NULL-key caveat: rows with NULL key values land in the same window
    * partition and therefore match each other — unlike SQL join equality,
    * where NULL = NULL is not true. Filter NULL keys upstream if SQL
    * semantics are required (current call sites have non-null keys).
    *
    * `toleranceUs` bounds match staleness (pandas merge_asof's tolerance /
    * market-data max-age): the as-of match is nulled out when it is more
    * than that many microseconds older than the left time. Only the LATEST
    * right row is ever the candidate — an older row inside the bound does
    * not resurrect a match, identical to merge_asof. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String,
               toleranceUs: Option[Long] = None): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keyCols.contains(c) || c == rightTime)
    require(payloadCols.nonEmpty,
      s"asofJoin: right side needs at least one payload column beyond " +
        s"keys ${keyCols.mkString(",")} and time '$rightTime' " +
        "(struct() of zero columns is an analysis error)")
    // the matched right TIME rides along in the payload struct so the
    // tolerance bound can compare it against the left time after the window
    val payloadStruct = struct(col(rightTime).as("__rt") +: payloadCols.map(col): _*)
    val rightTagged = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        payloadStruct.as("__payload")): _*)
    val payloadType = rightTagged.schema("__payload").dataType

    val leftCols = left.columns.filterNot(keyCols.contains)
    val leftTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(payloadType).as("__payload")) ++
        Seq(struct(leftCols.map(col): _*).as("__lrow")): _*)
    val rightAligned = rightTagged
      .withColumn("__lrow", lit(null).cast(leftTagged.schema("__lrow").dataType))

    // right rows (side 0) sort before left rows (side 1) at equal time →
    // a right row at exactly leftTime is visible: inclusive as-of.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = leftTagged.unionByName(rightAligned)
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = toleranceUs match {
      case None => matched
      case Some(us) => matched.withColumn("__matched",
        when(asMicros(col("__t"), left.schema(leftTime).dataType)
          - asMicros(col("__matched.__rt"), right.schema(rightTime).dataType) <= us,
          col("__matched")))
    }
    bounded.select(
      keyCols.map(col) ++
        leftCols.map(c => col(s"__lrow.$c").as(c)) ++
        payloadCols.map(c => col(s"__matched.$c").as(c)): _*)
  }

  /** NEAREST as-of (pandas merge_asof direction='nearest'): for each left
    * row, the right row with the SMALLEST absolute time gap — backward and
    * forward candidates computed in ONE union/window pass (two frames over
    * the same partitioning+ordering: one shuffle, one sort, one Window
    * exec), then a per-row gap comparison picks the winner. Ties (equal
    * backward and forward gap) deterministically prefer the BACKWARD
    * (earlier) match. An equal-time right row is the backward candidate at
    * gap 0 and therefore always wins — so the forward frame's equal-time
    * exclusivity (right rows sort before left rows here) cannot change the
    * result. Same one-shuffle cost profile and NULL-key caveat as
    * [[asofJoin]]; time columns must be TIMESTAMP or integral epoch-µs
    * (the gap needs a µs number line). */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      leftTime: String, rightTime: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keyCols.contains(c) || c == rightTime)
    require(payloadCols.nonEmpty,
      s"asofJoinNearest: right side needs a payload column beyond " +
        s"keys ${keyCols.mkString(",")} and time '$rightTime'")
    // the matched right TIME rides in the payload struct for the gap math
    val payloadStruct = struct(col(rightTime).as("__rt") +: payloadCols.map(col): _*)
    val rightTagged = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        payloadStruct.as("__payload")): _*)
    val payloadType = rightTagged.schema("__payload").dataType
    val leftCols = left.columns.filterNot(keyCols.contains)
    val leftTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(payloadType).as("__payload")) ++
        Seq(struct(leftCols.map(col): _*).as("__lrow")): _*)
    val rightAligned = rightTagged
      .withColumn("__lrow", lit(null).cast(leftTagged.schema("__lrow").dataType))
    // right (side 0) before left (side 1) at equal time: backward frame is
    // INCLUSIVE of equal-time right rows (the asofJoin convention)
    val wBack = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val both = leftTagged.unionByName(rightAligned)
      .withColumn("__b", last(col("__payload"), ignoreNulls = true).over(wBack))
      .withColumn("__f", first(col("__payload"), ignoreNulls = true).over(wFwd))
      .filter(col("__side") === 1)
    val lUs = asMicros(col("__t"), left.schema(leftTime).dataType)
    val rdt = right.schema(rightTime).dataType
    val bGap = lUs - asMicros(col("__b.__rt"), rdt)
    val fGap = asMicros(col("__f.__rt"), rdt) - lUs
    val useBack = col("__f").isNull ||
      (col("__b").isNotNull && bGap <= fGap)
    both
      .withColumn("__matched", when(useBack, col("__b")).otherwise(col("__f")))
      .select(
        keyCols.map(col) ++
          leftCols.map(c => col(s"__lrow.$c").as(c)) ++
          payloadCols.map(c => col(s"__matched.$c").as(c)): _*)
  }

  /** FORWARD as-of (pandas merge_asof direction='forward'): for each left
    * row, the EARLIEST right row at or after its time — the mirrored
    * window of [[asofJoin]]: left rows sort BEFORE right rows at equal
    * time and the frame runs (currentRow, unboundedFollowing) closed by
    * `first(ignoreNulls)`, so an equal-time right row is visible
    * (inclusive) and the earliest following payload wins. Same union
    * construction, same one-shuffle cost profile, same NULL-key caveat. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      leftTime: String, rightTime: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keyCols.contains(c) || c == rightTime)
    require(payloadCols.nonEmpty,
      s"asofJoinForward: right side needs a payload column beyond " +
        s"keys ${keyCols.mkString(",")} and time '$rightTime'")
    val payloadStruct = struct(payloadCols.map(col): _*)
    val rightTagged = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(1).as("__side"),
        payloadStruct.as("__payload")): _*)
    val payloadType = rightTagged.schema("__payload").dataType
    val leftCols = left.columns.filterNot(keyCols.contains)
    val leftTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(0).as("__side"),
        lit(null).cast(payloadType).as("__payload")) ++
        Seq(struct(leftCols.map(col): _*).as("__lrow")): _*)
    val rightAligned = rightTagged
      .withColumn("__lrow", lit(null).cast(leftTagged.schema("__lrow").dataType))
    // left (side 0) sorts before right (side 1) at equal time → an
    // equal-time right row is inside the following frame: inclusive.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    leftTagged.unionByName(rightAligned)
      .withColumn("__matched", first(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(
        keyCols.map(col) ++
          leftCols.map(c => col(s"__lrow.$c").as(c)) ++
          payloadCols.map(c => col(s"__matched.$c").as(c)): _*)
  }
}
