package graft.profiler

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A profiling analyzer: a named aggregate `Column` expression.
  *
  * This is the core architectural departure from the reference
  * (thoth/profiler.py:40-135 builds Deequ analyzer *jobs*): graft
  * analyzers are plain Catalyst aggregate expressions, so an arbitrary
  * set of analyzers over an arbitrary set of columns collapses into a
  * SINGLE `groupBy(ts).agg(...)` pass — one shuffle, map-side partial
  * aggregation, whole-stage codegen. At 100 TB this matters: the
  * reference submits one Spark job per day-partition; graft submits one
  * job total regardless of the number of days.
  */
trait ColumnAnalyzer extends Serializable {

  /** Analyzer name as it appears in the metric key (e.g. "Mean"). */
  def name: String

  /** Aggregate expression producing a double for the given column. */
  def expr(column: String): Column
}

object Analyzers {

  /** Fraction of non-null values (reference: Deequ Completeness). */
  case object Completeness extends ColumnAnalyzer {
    val name = "Completeness"
    def expr(c: String): Column =
      (count(col(c)) / count(lit(1))).cast(DoubleType)
  }

  /** Arithmetic mean of a numeric column. */
  case object Mean extends ColumnAnalyzer {
    val name = "Mean"
    def expr(c: String): Column = avg(col(c)).cast(DoubleType)
  }

  /** Sample standard deviation.
    *
    * graft standardizes on the sample estimator (n-1 denominator) —
    * the ANSI SQL `stddev` default — for oracle parity across engines.
    */
  case object StandardDeviation extends ColumnAnalyzer {
    val name = "StandardDeviation"
    def expr(c: String): Column = stddev_samp(col(c)).cast(DoubleType)
  }

  case object Min extends ColumnAnalyzer {
    val name = "Minimum"
    def expr(c: String): Column = min(col(c)).cast(DoubleType)
  }

  case object Max extends ColumnAnalyzer {
    val name = "Maximum"
    def expr(c: String): Column = max(col(c)).cast(DoubleType)
  }

  case object Sum extends ColumnAnalyzer {
    val name = "Sum"
    def expr(c: String): Column = sum(col(c)).cast(DoubleType)
  }

  /** Exact interpolated percentile (correctness path; oracle-parity
    * with ANSI `percentile_cont`). For 100 TB prefer [[ApproxQuantile]].
    * For several quantiles of one column use [[Quantiles]] — one
    * shared sorted-counts aggregate instead of one per quantile.
    */
  case class Quantile(q: Double) extends ColumnAnalyzer {
    val name = s"Quantile-$q"
    def expr(c: String): Column =
      percentile(col(c), lit(q)).cast(DoubleType)
  }

  /** A set of exact percentiles served by ONE shared aggregate — the
    * same PhysicalAggregation dedup as [[ApproxQuantiles]], applied to
    * the exact `percentile` (its sorted value-counts state is built
    * once per column instead of once per quantile). Values are
    * IDENTICAL to independent [[Quantile]] analyzers, so oracle-gated
    * outputs do not move.
    */
  object Quantiles {
    def apply(qs: Seq[Double]): Seq[ColumnAnalyzer] = {
      require(qs.nonEmpty, "at least one quantile required")
      qs.map(q => QuantileShared(q, qs))
    }
  }

  /** One quantile of a shared exact-percentile set — see [[Quantiles]]. */
  case class QuantileShared(q: Double, all: Seq[Double]) extends ColumnAnalyzer {
    require(all.contains(q), s"quantile $q missing from the shared set $all")
    val name = s"Quantile-$q"
    def expr(c: String): Column =
      element_at(percentile(col(c), array(all.map(lit): _*)), all.indexOf(q) + 1)
        .cast(DoubleType)
  }

  /** Approximate percentile (t-digest-style sketch, partial-aggregatable
    * — the 100 TB path; reference: Deequ ApproxQuantiles). For several
    * quantiles of one column use [[ApproxQuantiles]], which shares one
    * sketch across all of them.
    */
  case class ApproxQuantile(q: Double, accuracy: Int = 10000) extends ColumnAnalyzer {
    val name = s"ApproxQuantile-$q"
    def expr(c: String): Column =
      percentile_approx(col(c), lit(q), lit(accuracy)).cast(DoubleType)
  }

  /** A set of approximate percentiles served by ONE shared sketch.
    *
    * Each returned analyzer emits `element_at(percentile_approx(c,
    * array(all), acc), i)` — the inner aggregates are structurally
    * identical, so Spark's PhysicalAggregation dedupes them into a
    * single QuantileSummaries per column. Versus one independent
    * `ApproxQuantile` per q this divides both the build work and the
    * partial-state shipped through the shuffle by |qs| (measured ~30%
    * off the whole sketch-report wall-time at sf0.1 for the default
    * .25/.5/.75 triple).
    */
  object ApproxQuantiles {
    def apply(qs: Seq[Double], accuracy: Int = 10000): Seq[ColumnAnalyzer] = {
      require(qs.nonEmpty, "at least one quantile required")
      qs.map(q => ApproxQuantileShared(q, qs, accuracy))
    }
  }

  /** One quantile of a shared-sketch set — see [[ApproxQuantiles]]. */
  case class ApproxQuantileShared(q: Double, all: Seq[Double], accuracy: Int)
      extends ColumnAnalyzer {
    require(all.contains(q), s"quantile $q missing from the shared set $all")
    val name = s"ApproxQuantile-$q"
    def expr(c: String): Column =
      element_at(
        percentile_approx(col(c), array(all.map(lit): _*), lit(accuracy)),
        all.indexOf(q) + 1
      ).cast(DoubleType)
  }

  /** Exact distinct count (reference: Deequ CountDistinct). Exact
    * distinct inside a wide agg requires expand+reshuffle; at 100 TB
    * use [[ApproxCountDistinct]] (HLL++, sketch-mergeable).
    */
  case object CountDistinct extends ColumnAnalyzer {
    val name = "CountDistinct"
    def expr(c: String): Column = count_distinct(col(c)).cast(DoubleType)
  }

  /** HLL++ approximate distinct count — constant-size partial state,
    * the scale path for distinctness profiling.
    */
  case class ApproxCountDistinct(rsd: Double = 0.01) extends ColumnAnalyzer {
    val name = "ApproxCountDistinct"
    def expr(c: String): Column =
      approx_count_distinct(col(c), rsd).cast(DoubleType)
  }

  /** Population skewness from raw moments:
    * (m3 - 3*m1*m2 + 2*m1^3) / (m2 - m1^2)^1.5 with m_k = avg(x^k).
    *
    * Built explicitly from avg() moments rather than the engine
    * `skewness()` built-in: engines disagree on sample-vs-population
    * correction factors (Spark = population, DuckDB = sample-adjusted),
    * while the moment formula is plain arithmetic with identical
    * results everywhere — and each avg is partial-aggregatable, so the
    * analyzer stays single-pass. NULL for constant columns (zero
    * variance).
    */
  case object Skewness extends ColumnAnalyzer {
    val name = "Skewness"
    def expr(c: String): Column = {
      val x = col(c).cast(DoubleType)
      val m1 = avg(x)
      val m2 = avg(x * x)
      val m3 = avg(x * x * x)
      val variance = m2 - m1 * m1
      // variance^1.5 as v*sqrt(v): IEEE sqrt is correctly rounded on
      // every engine, pow() is not — pow would leak last-ulp
      // differences into the oracle hash
      when(
        variance > 0,
        (m3 - lit(3) * m1 * m2 + lit(2) * m1 * m1 * m1) / (variance * sqrt(variance))
      )
    }
  }

  /** Excess kurtosis from raw moments:
    * (m4 - 4*m1*m3 + 6*m1^2*m2 - 3*m1^4) / (m2 - m1^2)^2 - 3.
    * Same moment-arithmetic rationale as [[Skewness]].
    */
  case object Kurtosis extends ColumnAnalyzer {
    val name = "Kurtosis"
    def expr(c: String): Column = {
      val x = col(c).cast(DoubleType)
      val m1 = avg(x)
      val m2 = avg(x * x)
      val m3 = avg(x * x * x)
      val m4 = avg(x * x * x * x)
      val variance = m2 - m1 * m1
      when(
        variance > 0,
        (m4 - lit(4) * m1 * m3 + lit(6) * m1 * m1 * m2 - lit(3) * m1 * m1 * m1 * m1) /
          (variance * variance) - lit(3)
      )
    }
  }

  /** Dataset-scoped row count (reference: Deequ Size). */
  case object Size extends ColumnAnalyzer {
    val name = "Size"
    def expr(c: String): Column = count(lit(1)).cast(DoubleType)
  }

  /** Ratio of distinct values to rows (Deequ Distinctness). */
  case object Distinctness extends ColumnAnalyzer {
    val name = "Distinctness"
    def expr(c: String): Column =
      (count_distinct(col(c)) / count(lit(1))).cast(DoubleType)
  }

  /** Fraction of rows satisfying a row-level predicate (Deequ
    * Compliance). A NULL predicate result counts as non-compliant,
    * matching Deequ's `sum(if(predicate,1,0))/count(*)`. The predicate
    * may reference any columns, so the bound column name is ignored —
    * register as a dataset analyzer (instance `*`).
    */
  case class Compliance(constraint: String, predicate: Column) extends ColumnAnalyzer {
    val name = s"Compliance($constraint)"
    def expr(c: String): Column =
      (sum(when(predicate, 1L).otherwise(0L)) / count(lit(1))).cast(DoubleType)
  }

  /** Fraction of rows whose value contains a regex match (Deequ
    * PatternMatch); NULLs count as non-matching. Unanchored find
    * semantics on both engines (Spark `rlike`, DuckDB
    * `regexp_matches`) — anchor the pattern for full-match checks.
    */
  case class PatternMatch(pattern: String) extends ColumnAnalyzer {
    val name = s"PatternMatch($pattern)"
    def expr(c: String): Column =
      (sum(when(col(c).rlike(pattern), 1L).otherwise(0L)) / count(lit(1)))
        .cast(DoubleType)
  }

  /** Shortest value length of a string column (Deequ MinLength);
    * NULLs ignored.
    */
  case object MinLength extends ColumnAnalyzer {
    val name = "MinLength"
    def expr(c: String): Column = min(length(col(c))).cast(DoubleType)
  }

  /** Longest value length of a string column (Deequ MaxLength);
    * NULLs ignored.
    */
  case object MaxLength extends ColumnAnalyzer {
    val name = "MaxLength"
    def expr(c: String): Column = max(length(col(c))).cast(DoubleType)
  }
}
