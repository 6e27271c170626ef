package graft.profiler

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection over a time-partitioned dataset —
  * the day-over-day companion to the point-in-time profiler
  * (reference scope: thoth monitors per-day metric series; PSI is the
  * standard industry extension for *distribution* change, not just
  * moment change).
  *
  * Scale shape: one scan bins every row (the global min/max ride a
  * 1-row broadcast), one map-side-combinable count per (day, bin),
  * and everything after operates on |days| x |bins| rows — grain-level
  * data, independent of raw size. Nothing here rescans raw data per
  * day pair.
  */
object Drift {

  /** Day-over-day Population Stability Index of a numeric column.
    *
    * Bins are equi-width over the GLOBAL [min, max] — shared edges are
    * what makes day-to-day proportions comparable (per-day edges would
    * conflate range drift with shape drift). Each day's per-bin
    * proportion is clamped to `eps` so empty bins contribute a large
    * finite term instead of infinity; PSI(d) = sum_bins
    * (p_d - p_{d-1}) * (ln p_d - ln p_{d-1}) against the previous
    * CALENDAR day (a missing day yields no pair — surface those with
    * [[missingDays]]).
    *
    * Interpretation rule of thumb: < 0.1 stable, 0.1-0.25 moderate
    * shift, > 0.25 action.
    */
  def psiDrift(
      df: DataFrame,
      tsCol: String = "ts",
      valueCol: String = "value",
      bins: Int = 10,
      eps: Double = 1e-6
  ): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(eps > 0, s"eps must be positive, got $eps")
    val e = df
      .where(col(valueCol).isNotNull)
      .select(
        date_trunc("day", col(tsCol)).as("_day"),
        col(valueCol).as("_v")
      )
    val global = e
      .agg(min(col("_v")).as("_mn"), max(col("_v")).as("_mx"))
      .withColumn("_k", lit(1))
    val binned = e
      .withColumn("_k", lit(1))
      .join(broadcast(global), "_k")
      .select(
        col("_day"),
        when(col("_mx") === col("_mn"), lit(0))
          .otherwise(
            least(
              floor((col("_v") - col("_mn")) / (col("_mx") - col("_mn")) * bins)
                .cast("int"),
              lit(bins - 1)
            )
          )
          .as("_bin")
      )
    val counts = binned.groupBy(col("_day"), col("_bin")).agg(count(lit(1)).as("_n"))
    val totals = counts.groupBy(col("_day")).agg(sum(col("_n")).as("_nt"))
    // dense (day x bin) grid — a bin empty on one day but not its
    // neighbor must still contribute an eps-clamped term
    val grid = totals.select(
      col("_day"),
      col("_nt"),
      explode(sequence(lit(0), lit(bins - 1))).as("_bin")
    )
    val p = grid
      .join(counts, Seq("_day", "_bin"), "left_outer")
      .select(
        col("_day"),
        col("_bin"),
        greatest(
          coalesce(col("_n"), lit(0L)).cast("double") / col("_nt"),
          lit(eps)
        ).as("_p")
      )
    val q = p.select(
      col("_day").as("_qday"),
      col("_bin").as("_qbin"),
      col("_p").as("_q")
    )
    p.join(
        q,
        col("_qday") === col("_day") - expr("INTERVAL 1 DAY") &&
          col("_qbin") === col("_bin")
      )
      .groupBy(col("_day").as("ts"))
      .agg(
        graft.functions
          .round6(sum((col("_p") - col("_q")) * (log(col("_p")) - log(col("_q")))))
          .as("psi")
      )
  }

  /** Calendar days with NO rows per key, within the dataset's global
    * [min day, max day] span — the "silent partition" detector (a
    * pipeline that stops delivering for one key is invisible to
    * per-day aggregates, which simply have no row to flag).
    *
    * Scale shape: the observed (key, day) set is a distinct aggregate
    * of the scan; expected days explode from a 1-row global span onto
    * the distinct key list (|keys| x |span| rows, grain-level); the
    * anti-join is keyed on (key, day). Raw data is scanned once.
    */
  def missingDays(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String]
  ): DataFrame = {
    require(keyCols.nonEmpty, "missingDays needs at least one key column")
    val day = date_trunc("day", col(tsCol))
    val observed = df
      .select(keyCols.map(col) :+ day.as("_day"): _*)
      .distinct()
    val span = df
      .agg(min(day).as("_min_day"), max(day).as("_max_day"))
      .withColumn("_k", lit(1))
    val expected = observed
      .select(keyCols.map(col): _*)
      .distinct()
      .withColumn("_k", lit(1))
      .join(broadcast(span), "_k")
      .select(
        keyCols.map(col) :+
          explode(
            sequence(col("_min_day"), col("_max_day"), expr("INTERVAL 1 DAY"))
          ).as("_day"): _*
      )
    expected
      .join(observed, keyCols :+ "_day", "left_anti")
      .select(keyCols.map(col) :+ col("_day").as("missing_day"): _*)
  }
}
