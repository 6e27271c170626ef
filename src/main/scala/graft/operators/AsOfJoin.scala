package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — the feature-pipeline primitive Spark
  * lacks natively: for every left row, attach the single latest right
  * row whose time is <= the left row's time within the same key
  * (DuckDB/Pandas `ASOF JOIN`, kdb `aj`).
  *
  * Distributed shape: both sides are UNIONED and swept by ONE window
  * pass per key ordered by (time, side) — `last(right_payload,
  * ignoreNulls)` over the unbounded-preceding frame carries the most
  * recent right payload onto every left row. One shuffle keyed on the
  * join key, no range-condition join (which Spark would execute as a
  * broadcast-nested-loop — all-pairs per key), no per-key explosion:
  * cost is sort + linear sweep, the same shape as sessionization, so
  * it survives 100 TB as long as single keys fit a partition (salt the
  * key and as-of per salt epoch when they don't).
  *
  * Equal timestamps match (right sorts before left at the same time —
  * DuckDB ASOF `l.t >= r.t` parity). Right rows should be unique per
  * (key, time): pre-aggregate duplicates deterministically upstream,
  * otherwise which duplicate wins is tie-broken arbitrarily (same
  * caveat as DuckDB).
  */
object AsOfJoin {

  /** @param left           probe side; all its columns are preserved
    * @param right          reference side, already projected to
    *                       keyCols + rightTimeCol + rightValueCols with
    *                       names that do not collide with `left`'s
    * @param keyCols        equi-join key
    * @param leftTimeCol    event time on the left
    * @param rightTimeCol   event time on the right (also emitted — the
    *                       matched as-of timestamp)
    * @param rightValueCols right payload columns to attach
    * @param tolerance      optional max staleness: matches older than
    *                       `leftTime - tolerance` are nulled out
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String],
      tolerance: Option[Column] = None
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadCols = rightTimeCol +: rightValueCols
    require(
      payloadCols.intersect(leftCols).isEmpty,
      s"right payload ${payloadCols.intersect(leftCols)} collides with left columns — rename upstream"
    )
    // the sweep introduces scratch columns _t/_side/_l/_r/_m alongside
    // the key columns; a user column with one of those names would
    // silently shadow them
    val scratch = Seq("_t", "_side", "_l", "_r", "_m")
    val userCols = (leftCols ++ payloadCols ++ keyCols).distinct
    require(
      userCols.intersect(scratch).isEmpty,
      s"columns ${userCols.intersect(scratch)} collide with AsOfJoin scratch names ${scratch.mkString("/")} — rename upstream"
    )
    val rPayload = struct(payloadCols.map(col): _*)
    val rPayloadType = right.select(rPayload).schema.head.dataType
    val lStruct = struct(leftCols.map(col): _*)
    val lStructType = left.select(lStruct).schema.head.dataType

    val lp = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTimeCol).as("_t"),
        lit(1).as("_side"),
        lStruct.as("_l"),
        lit(null).cast(rPayloadType).as("_r")
      ): _*
    )
    // A NULL join key never matches (join/ASOF semantics) — but
    // Window.partitionBy groups NULL keys together, so null-key right
    // rows must be dropped BEFORE the union; null-key left rows then
    // sweep an empty partition and keep their left-join NULL payload.
    // A NULL right TIME never matches either (l.t >= r.t is unknowable
    // — DuckDB ASOF parity): left in, it sorts FIRST in the ascending
    // sweep and would attach as the "match" to any left row with no
    // real earlier right row.
    val rp = right
      .where(
        (keyCols.map(col(_).isNotNull) :+ col(rightTimeCol).isNotNull)
          .reduce(_ && _)
      )
      .select(
        keyCols.map(col) ++ Seq(
          col(rightTimeCol).as("_t"),
          lit(0).as("_side"),
          lit(null).cast(lStructType).as("_l"),
          rPayload.as("_r")
        ): _*
      )
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = lp
      .unionByName(rp)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    val bounded = tolerance match {
      case Some(tol) =>
        swept.withColumn(
          "_m",
          when(col(s"_m.$rightTimeCol") >= col("_t") - tol, col("_m"))
        )
      case None => swept
    }
    bounded.select(
      leftCols.map(c => col(s"_l.$c").as(c)) ++
        payloadCols.map(c => col(s"_m.$c").as(c)): _*
    )
  }
}
