package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Core analytics-engine queries (SURVEY §2.3) — the bench headliners.
  *
  * Plan notes for 100 TB: `q1` is a single map-side-combinable
  * aggregation; joins are size-adaptive — only the BOUNDED dims
  * (nation 25 rows, region 5) carry broadcast hints, everything that
  * grows with SF (customer, supplier, orders) is left to Catalyst/AQE
  * so the same declarative plan broadcasts at bench scale and
  * shuffle-joins at 100 TB; top-k uses rank-over-partition with
  * partial top-k pushdown via the window group limit optimizer rule
  * (Spark 3.5+ WindowGroupLimit) rather than a global sort.
  */
object EngineQueries extends QueryPack {

  private val q1 = Q(
    fn = (s, d) =>
      Tables
        .lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSum2(col("l_quantity")).as("sum_qty"),
          decSum2(col("l_extendedprice")).as("sum_base_price"),
          decSum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          decSum6(
            col("l_extendedprice") * (lit(1) - col("l_discount")) *
              (lit(1) + col("l_tax"))
          ).as("sum_charge"),
          decAvg2(col("l_quantity")).as("avg_qty"),
          decAvg2(col("l_extendedprice")).as("avg_price"),
          decAvg2(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    oracle = Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${sqlDecSum2("l_quantity")} AS sum_qty,
        ${sqlDecSum2("l_extendedprice")} AS sum_base_price,
        ${sqlDecSum6("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
        ${sqlDecSum6("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
        ${sqlDecAvg2("l_quantity")} AS avg_qty,
        ${sqlDecAvg2("l_extendedprice")} AS avg_price,
        ${sqlDecAvg2("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
  )

  // TPC-H Q6 shape: pure scan + filter + scalar aggregate — the
  // pushdown benchmark (every predicate reaches the parquet reader,
  // zero shuffle beyond the final partial-agg exchange)
  private val q6 = Q(
    fn = (s, d) =>
      Tables
        .lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24
        )
        .agg(
          decSum6(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_rows")
        ),
    oracle = Some(s"""
      SELECT ${sqlDecSum6("l_extendedprice * l_discount")} AS revenue,
        COUNT(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")
  )

  // TPC-H Q18 shape (large-volume customers): the HAVING-subquery is a
  // single lineitem aggregation whose result (order key + summed qty)
  // joins straight back — one pass over the fact table, no second scan
  private val q18 = Q(
    fn = (s, d) => {
      val big = Tables
        .lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(decSum2(col("l_quantity")).as("sum_qty"))
        .where(col("sum_qty") > 250)
      Tables
        .orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(
          col("c_name"),
          col("o_custkey"),
          col("o_orderkey"),
          col("o_orderdate"),
          col("o_totalprice"),
          col("sum_qty")
        )
        .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    },
    oracle = Some(s"""
      WITH big AS (
        SELECT l_orderkey, ${sqlDecSum2("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY 1
        HAVING ${sqlDecSum2("l_quantity")} > 250)
      SELECT c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      FROM orders JOIN big ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      LIMIT 100""")
  )

  // bloom semi-join reduction: lineitem rows are pre-filtered by a
  // fixed-size bloom over the urgent orders' keys before the join
  // shuffle; the oracle is the PLAIN join — proving false positives
  // never change results, only shuffled volume
  private val bloomQ = Q(
    fn = (s, d) => {
      val dim = Tables
        .orders(s, d)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      graft.operators.BloomJoin
        .bloomReducedJoin(Tables.lineitem(s, d), dim, "l_orderkey", "o_orderkey")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(
          count(lit(1)).as("n_items"),
          decSum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue")
        )
        .orderBy("month")
    },
    oracle = Some(s"""
      SELECT ${sqlTrunc("month", "o_orderdate")} AS month,
        COUNT(*) AS n_items,
        ${sqlDecSum6("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1 ORDER BY 1""")
  )

  private val q14 = Q(
    fn = (s, d) => {
      val li = Tables
        .lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1995-09-01") && col("l_shipdate") < lit("1995-10-01")
        )
        .select(
          col("l_partkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev")
        )
      // part grows with SF — no broadcast hint, AQE decides (broadcasts
      // here, shuffle-joins at 100 TB)
      val part = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
      li.join(part, col("l_partkey") === col("p_partkey"))
        .agg(
          round6(
            lit(100.0) *
              sum(
                when(col("p_type").startsWith("PROMO"), col("rev"))
                  .otherwise(lit(0.0))
                  .cast(DecimalType(28, 6))
              ).cast(DoubleType) /
              sum(col("rev").cast(DecimalType(28, 6))).cast(DoubleType)
          ).as("promo_revenue")
        )
    },
    oracle = Some("""
      SELECT round(100.0 *
        CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
          THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE),
        6) AS promo_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'""")
  )

  private val q3 = Q(
    fn = (s, d) => {
      val cust = Tables
        .customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = Tables
        .orders(s, d)
        .filter(col("o_orderdate") < lit("1995-03-15"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables
        .lineitem(s, d)
        .filter(col("l_shipdate") > lit("1995-03-15"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      // customer is NOT hinted: at bench scale Catalyst auto-broadcasts
      // it, at 100 TB (customer ~ lineitem/10) a forced broadcast would
      // OOM — size-adaptive planning picks the right join per scale
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(
          decSum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue")
        )
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    oracle = Some(s"""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        ${sqlDecSum6("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""")
  )

  private val q5 = Q(
    fn = (s, d) => {
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val nat = Tables.nation(s, d)
      val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val ord = Tables
        .orders(s, d)
        .filter(
          col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1998-01-01")
        )
        .select("o_orderkey")
      Tables
        .lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        // supplier grows with SF (10k x SF rows) — size-adaptive, not
        // hinted; nation (25) and region (5) are bounded: always hint
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          decSum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue")
        )
        .orderBy(col("revenue").desc, col("n_name"))
    },
    oracle = Some(s"""
      SELECT n_name,
        ${sqlDecSum6("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""")
  )

  private val windowTopK = Q(
    fn = (s, d) => {
      val w = Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables
        .orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .orderBy(col("o_orderpriority"), col("rank"))
    },
    oracle = Some("""
      SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey) AS rank
        FROM orders)
      WHERE rank <= 3
      ORDER BY o_orderpriority, rank""")
  )

  // Same result as q_window_topk, computed by the bounded-heap
  // aggregate (graft.functions.TopKByAgg) instead of a window rank:
  // each map task reduces its slice of a group to <= k entries BEFORE
  // the exchange, so the shuffle is O(partitions * k) per group where
  // the window formulation shuffles and sorts EVERY row. The shared
  // oracle with q_window_topk doubles as an equivalence proof.
  private val groupTopKAgg = Q(
    fn = (s, d) =>
      Tables
        .orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          graft.functions.topkAggregate
            .topKBy(col("o_totalprice"), col("o_orderkey"), 3)
            .as("_top")
        )
        .select(col("o_orderpriority"), posexplode(col("_top")).as(Seq("_pos", "_e")))
        .select(
          col("o_orderpriority"),
          col("_e.id").as("o_orderkey"),
          col("_e.metric").as("o_totalprice"),
          (col("_pos") + 1).as("rank")
        )
        .orderBy(col("o_orderpriority"), col("rank")),
    oracle = Some("""
      SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey) AS rank
        FROM orders)
      WHERE rank <= 3
      ORDER BY o_orderpriority, rank""")
  )

  private val antiJoin = Q(
    fn = (s, d) =>
      Tables
        .orders(s, d)
        .join(
          Tables.lineitem(s, d).select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"),
          "left_anti"
        )
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")),
    oracle = Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE NOT EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      ORDER BY o_orderkey""")
  )

  private val rollup = Q(
    fn = (s, d) =>
      Tables
        .lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSum2(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n")
        )
        .orderBy(
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first
        ),
    oracle = Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${sqlDecSum2("l_quantity")} AS sum_qty, COUNT(*) AS n
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
  )

  private val semiJoin = Q(
    fn = (s, d) =>
      Tables
        .customer(s, d)
        .join(
          Tables
            .orders(s, d)
            .filter(col("o_totalprice") > 300000.0)
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"),
          "left_semi"
        )
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey")),
    oracle = Some("""
      SELECT c_custkey, c_mktsegment
      FROM customer
      WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      ORDER BY c_custkey""")
  )

  private val runningSum = Q(
    fn = (s, d) => {
      val w = Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables
        .orders(s, d)
        .groupBy(
          col("o_orderpriority"),
          date_trunc("month", col("o_orderdate")).as("day")
        )
        .agg(decSum2(col("o_totalprice")).as("monthly"))
        .withColumn("running_total", sum(col("monthly").cast(DecimalType(28, 2))).over(w).cast("double"))
        .orderBy(col("o_orderpriority"), col("day"))
    },
    oracle = Some(s"""
      WITH m AS (
        SELECT o_orderpriority, ${sqlTrunc("month", "o_orderdate")} AS day,
          ${sqlDecSum2("o_totalprice")} AS monthly,
          SUM(SUM(CAST(o_totalprice AS DECIMAL(18,2)))) OVER (
            PARTITION BY o_orderpriority ORDER BY ${sqlTrunc("month", "o_orderdate")}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rt
        FROM orders GROUP BY o_orderpriority, day)
      SELECT o_orderpriority, day, monthly, CAST(rt AS DOUBLE) AS running_total
      FROM m ORDER BY o_orderpriority, day""")
  )

  // Time-RANGE windowed aggregate — the calendar-aware companion to
  // q_running_sum's ROWS frame: rolling 28-day revenue per priority,
  // where sparse days shrink the window (a ROWS frame would silently
  // span calendar gaps). The range frame runs at DAILY grain AFTER
  // aggregation, so the window scans |priorities × days| rows, never
  // the fact table; DECIMAL rolling sums keep the frame-order
  // arithmetic exact on both engines.
  private val rollingTimeRange = Q(
    fn = (s, d) => {
      val w = Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("day_num"))
        .rangeBetween(-27, 0)
      Tables
        .orders(s, d)
        .groupBy(
          col("o_orderpriority"),
          datediff(col("o_orderdate").cast("date"), to_date(lit("1970-01-01")))
            .cast("long")
            .as("day_num")
        )
        .agg(decSum2(col("o_totalprice")).as("daily"))
        .withColumn(
          "rolling_28d",
          sum(col("daily").cast(DecimalType(28, 2))).over(w).cast("double")
        )
        .orderBy(col("o_orderpriority"), col("day_num"))
    },
    oracle = Some(s"""
      WITH m AS (
        SELECT o_orderpriority,
          CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS day_num,
          ${sqlDecSum2("o_totalprice")} AS daily,
          SUM(SUM(CAST(o_totalprice AS DECIMAL(18,2)))) OVER (
            PARTITION BY o_orderpriority
            ORDER BY CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
            RANGE BETWEEN 27 PRECEDING AND CURRENT ROW) AS r
        FROM orders GROUP BY 1, 2)
      SELECT o_orderpriority, day_num, daily, CAST(r AS DOUBLE) AS rolling_28d
      FROM m ORDER BY o_orderpriority, day_num""")
  )

  /** Salted-join demo: result must hash-match the plain SQL join — the
    * oracle proves salting preserves semantics while spreading hot keys
    * over nSalts reducers.
    */
  private val skewSaltedJoin = Q(
    fn = (s, d) =>
      graft.operators.SkewJoin
        .saltedInnerJoin(
          Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount"),
          Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
          Seq("l_orderkey" -> "o_orderkey"),
          nSalts = 8
        )
        .groupBy(col("o_orderpriority"))
        .agg(
          decSum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n")
        )
        .orderBy(col("o_orderpriority")),
    oracle = Some(s"""
      SELECT o_orderpriority,
        ${sqlDecSum6("l_extendedprice * (1 - l_discount)")} AS revenue,
        COUNT(*) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  /** Gap-based sessionization with window functions: a new session
    * starts when the gap to the previous event exceeds 30 min; session
    * id = running count of session starts per user. Pure declarative
    * windows — two window exchanges on the same (user) partitioning,
    * reused by Catalyst.
    */
  /** TPC-H Q19 shape: disjunctive multi-predicate join (OR of ANDs
    * across both sides). Catalyst extracts the common l_partkey =
    * p_partkey equi-condition so the join stays hash-based with the
    * disjunction as a post-join filter — the optimizer behavior this
    * query exists to pin.
    */
  private val q19 = Q(
    fn = (s, d) => {
      val li = Tables.lineitem(s, d)
      val part = Tables.part(s, d)
      li.join(part, col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 30))
        )
        .agg(
          decSum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n")
        )
    },
    oracle = Some(s"""
      SELECT ${sqlDecSum6("l_extendedprice * (1 - l_discount)")} AS revenue,
        COUNT(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""")
  )

  private val cubeQ = Q(
    fn = (s, d) =>
      Tables
        .lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(decSum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first
        ),
    oracle = Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${sqlDecSum2("l_quantity")} AS sum_qty, COUNT(*) AS n
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
  )

  private val unpivotQ = Q(
    fn = (s, d) =>
      Tables
        .part(s, d)
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_size").cast("double"), col("p_retailprice")),
          "attr",
          "val"
        )
        .orderBy("p_partkey", "attr"),
    oracle = Some("""
      SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
      ORDER BY p_partkey, attr""")
  )

  private val pivotQ = Q(
    fn = (s, d) =>
      Tables
        .events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("ts"))
        // explicit value list: an unpinned pivot would add a distinct
        // scan AND make the column set data-dependent
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round6(avg(col("value"))))
        .orderBy("ts"),
    oracle = Some(s"""
      SELECT ${sqlDay("ts")} AS ts,
        round(AVG(CASE WHEN event_type = 'click' THEN value END), 6) AS click,
        round(AVG(CASE WHEN event_type = 'error' THEN value END), 6) AS error,
        round(AVG(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
        round(AVG(CASE WHEN event_type = 'signup' THEN value END), 6) AS signup,
        round(AVG(CASE WHEN event_type = 'view' THEN value END), 6) AS view
      FROM events GROUP BY 1 ORDER BY ts""")
  )

  private val asofQ = Q(
    fn = (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      // dedup the reference side per (key, time) so the as-of pick is
      // deterministic on both engines
      val views = ev
        .where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("view_value"))
        .withColumnRenamed("ts", "view_ts")
      graft.operators.AsOfJoin
        .asOf(purchases, views, Seq("user_id"), "ts", "view_ts", Seq("view_value"))
        .orderBy("event_id")
    },
    oracle = Some("""
      WITH p AS (SELECT event_id, user_id, ts, value FROM events
                 WHERE event_type = 'purchase'),
        v AS (SELECT user_id, ts AS view_ts, max(value) AS view_value
              FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, p.ts, p.value, v.view_ts, v.view_value
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.view_ts
      ORDER BY p.event_id""")
  )

  private val rangeQ = Q(
    fn = (s, d) => {
      // price bands derived from part sizes: centers 1000 apart, width
      // 500 — non-overlapping, so each lineitem hits at most one band
      val bands = Tables
        .part(s, d)
        .select(
          col("p_size").as("band_id"),
          (col("p_size") * 1000.0 - 250).as("lo"),
          (col("p_size") * 1000.0 + 250).as("hi")
        )
        .distinct()
      val li = Tables.lineitem(s, d).select(col("l_extendedprice").as("price"))
      graft.operators.RangeJoin
        .intervalJoin(li, bands, "price", "lo", "hi", bucketWidth = 500.0)
        .groupBy("band_id")
        .agg(count(lit(1)).as("n"), decSum2(col("price")).as("sum_price"))
        .orderBy("band_id")
    },
    oracle = Some(s"""
      WITH bands AS (SELECT DISTINCT p_size AS band_id,
          p_size * 1000.0 - 250 AS lo, p_size * 1000.0 + 250 AS hi FROM part)
      SELECT band_id, COUNT(*) AS n, ${sqlDecSum2("l_extendedprice")} AS sum_price
      FROM lineitem JOIN bands ON l_extendedprice >= lo AND l_extendedprice <= hi
      GROUP BY band_id ORDER BY band_id""")
  )

  private val splitQ = Q(
    fn = (s, d) =>
      graft.operators.Sampling
        .hashSplit(
          Tables.documents(s, d),
          "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
        )
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id"),
    oracle = Some(s"""
      SELECT doc_id,
        ${graft.operators.Sampling
        .hashSplitSql("doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))} AS split
      FROM documents ORDER BY doc_id""")
  )

  // EXACT stratified split: per (lang, source) stratum the split
  // counts are floor-exact, not binomial — oracle mirrors the
  // rank-within-stratum boundary arithmetic on the same md5 ordering
  private val stratSplitQ = Q(
    fn = (s, d) =>
      graft.operators.Sampling
        .stratifiedSplit(
          Tables.documents(s, d).withColumn(
            "stratum",
            concat(col("lang"), lit(":"), col("source"))),
          "stratum",
          "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
        )
        .select(col("doc_id"), col("stratum"), col("split"))
        .orderBy("doc_id"),
    // boundary literals are the EXACT decimal cumulative fractions
    // (BigDecimal over toString, matching Sampling.stratifiedSplit):
    // both engines floor a DECIMAL product, so IEEE folding noise
    // (0.8+0.1 == 0.9000000000000001 as doubles) can never shift a
    // boundary on an unlucky stratum size
    oracle = Some {
      val cum = Seq(0.8, 0.1, 0.1)
        .scanLeft(BigDecimal(0))((acc, f) => acc + BigDecimal(f.toString))
        .tail
      s"""
      WITH s AS (SELECT doc_id, lang || ':' || source AS stratum,
          substring(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 8) AS h
        FROM documents),
      r AS (SELECT doc_id, stratum,
          row_number() OVER (PARTITION BY stratum ORDER BY h, doc_id) AS i,
          count(*) OVER (PARTITION BY stratum) AS n
        FROM s)
      SELECT doc_id, stratum,
        CASE WHEN i <= floor(CAST('${cum(0)}' AS DECIMAL(38,18)) * n) THEN 'train'
             WHEN i <= floor(CAST('${cum(1)}' AS DECIMAL(38,18)) * n) THEN 'val'
             ELSE 'test' END AS split
      FROM r ORDER BY doc_id"""
    }
  )

  // Leakage-safe split: every event of a user lands in one split
  // (split by hash of user_id, not event_id)
  private val groupSplitQ = Q(
    fn = (s, d) =>
      graft.operators.Sampling
        .groupSplit(
          Tables.events(s, d),
          "user_id",
          Seq("train" -> 0.9, "test" -> 0.1)
        )
        .select(col("event_id"), col("user_id"), col("split"))
        .orderBy("event_id"),
    oracle = Some(s"""
      SELECT event_id, user_id,
        ${graft.operators.Sampling
        .hashSplitSql("user_id", Seq("train" -> 0.9, "test" -> 0.1))} AS split
      FROM events ORDER BY event_id""")
  )

  // Exact fuzzy self-join on part names at lev <= 2: symmetric-delete
  // blocking + thresholded verification must reproduce DuckDB's
  // exhaustive all-pairs levenshtein filter exactly.
  private val fuzzyJoinQ = Q(
    fn = (s, d) =>
      graft.operators.FuzzyJoin
        .fuzzySelfPairs(Tables.part(s, d), "p_name", "p_partkey", maxEdits = 2)
        .orderBy("id_a", "id_b"),
    oracle = Some("""
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        levenshtein(a.p_name, b.p_name) AS dist
      FROM part a JOIN part b ON a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 2
      ORDER BY id_a, id_b""")
  )

  // Entity resolution over part names: fuzzy pairs -> connected
  // components -> canonical election by retail price. Oracle rebuilds
  // the transitive closure with a recursive reachability CTE over the
  // exhaustive levenshtein pair set.
  private val entityResolutionQ = Q(
    fn = (s, d) =>
      graft.operators.FuzzyJoin
        .resolveEntities(
          Tables.part(s, d),
          "p_name",
          "p_partkey",
          maxEdits = 2,
          rankCol = "p_retailprice"
        )
        .orderBy("p_partkey"),
    oracle = Some("""
      WITH RECURSIVE pr AS (
        SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
        FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 2),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pr
                UNION SELECT id_b, id_a FROM pr),
      reach AS (SELECT src AS id, src AS r FROM edges
                UNION
                SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
      lbl AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
      ent AS (
        SELECT p.p_partkey AS id, COALESCE(l.label, p.p_partkey) AS entity_id,
          p.p_retailprice AS rk
        FROM part p LEFT JOIN lbl l ON p.p_partkey = l.id),
      w AS (
        SELECT id, entity_id, rk,
          ROW_NUMBER() OVER (PARTITION BY entity_id ORDER BY rk DESC, id) AS rn,
          COUNT(*) OVER (PARTITION BY entity_id) AS nm
        FROM ent),
      can AS (SELECT entity_id, id AS canonical_id FROM w WHERE rn = 1)
      SELECT w.id AS p_partkey, w.entity_id, can.canonical_id,
        CAST(w.nm AS BIGINT) AS n_members
      FROM w JOIN can ON w.entity_id = can.entity_id
      ORDER BY p_partkey""")
  )

  private val stratifiedQ = {
    // downsample the dominant strata, keep more of 0; unlisted labels
    // fall back to the default fraction
    val fr = Seq("0" -> 0.8, "1" -> 0.25)
    Q(
      fn = (s, d) =>
        graft.operators.Sampling
          .stratifiedSample(
            Tables.embeddings(s, d),
            "vec_id",
            "label",
            fr,
            defaultFraction = 0.1
          )
          .select(col("vec_id"), col("label"))
          .orderBy("vec_id"),
      oracle = Some(s"""
        SELECT vec_id, label FROM embeddings
        WHERE ${graft.operators.Sampling
          .stratifiedSampleSql("vec_id", "label", fr, defaultFraction = 0.1)}
        ORDER BY vec_id""")
    )
  }

  // Weighted sample-without-replacement (Efraimidis–Spirakis keys over
  // md5 uniforms), k docs per source weighted by length. The DuckDB
  // mirror decodes the 13 hex chars with a CASE chain (no hex->int
  // builtin), then ranks the identical round6(ln(u)/w) key — ln parity
  // Java vs duckdb probed bit-exact over the md5-uniform range.
  private val weightedSampleQ = {
    def hexDigit(e: String): String =
      "(CASE " + "0123456789abcdef"
        .map(c => s"WHEN $e = '$c' THEN ${Integer.parseInt(c.toString, 16)}")
        .mkString(" ") + " END)"
    val digits = (0 until 13)
      .map(i => s"CAST(${hexDigit(s"substr(h, ${i + 1}, 1)")} AS BIGINT) * ${1L << (4 * (12 - i))}")
      .mkString(" + ")
    Q(
      fn = (s, d) =>
        graft.operators.Sampling
          .weightedSamplePerGroup(
            Tables.documents(s, d),
            Seq("source"),
            "doc_id",
            greatest(col("n_chars"), lit(1)).cast("double"),
            k = 5,
            salt = "wsample"
          )
          .orderBy("source", "rank"),
      oracle = Some(s"""
        WITH d AS (SELECT doc_id, source,
                     CAST(greatest(n_chars, 1) AS DOUBLE) AS w,
                     md5(CAST(doc_id AS VARCHAR) || ':wsample') AS h
                   FROM documents),
        u AS (SELECT doc_id, source,
                round(ln((($digits) + 1) / 4503599627370496.0) / w, 6) AS sample_key
              FROM d),
        r AS (SELECT source, doc_id, sample_key,
                ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY sample_key DESC, doc_id) AS rank
              FROM u)
        SELECT source, rank, doc_id, sample_key FROM r
        WHERE rank <= 5 ORDER BY source, rank""")
    )
  }

  // Z-order layout: per-slice min/max of every clustered dimension —
  // exactly the statistics a scan uses for file skipping. The oracle
  // recomputes the full interleave in SQL with the same double-exact
  // affine bucketing, proving key portability row-for-row.
  private val zorderQ = {
    val bits = 8
    def sqlBucket(x: String, mn: String, mx: String): String =
      s"CAST(floor((CAST($x - $mn AS DOUBLE) * ${1L << bits}) / CAST($mx - $mn + 1 AS DOUBLE)) AS BIGINT)"
    val sqlInterleave = (0 until bits)
      .flatMap { j =>
        Seq(
          s"((sx >> $j) & 1) * ${1L << (j * 2)}",
          s"((sy >> $j) & 1) * ${1L << (j * 2 + 1)}"
        )
      }
      .mkString(" + ")
    Q(
      fn = (s, d) =>
        graft.operators.Layout
          .zorderKeyed(Tables.lineitem(s, d), Seq("l_partkey", "l_suppkey"), bits)
          .groupBy(shiftright(col("zkey"), bits).as("z_slice"))
          .agg(
            count(lit(1)).as("n_rows"),
            min(col("l_partkey")).as("min_part"),
            max(col("l_partkey")).as("max_part"),
            min(col("l_suppkey")).as("min_supp"),
            max(col("l_suppkey")).as("max_supp")
          )
          .orderBy("z_slice"),
      oracle = Some(s"""
        WITH b AS (SELECT min(l_partkey) AS mnx, max(l_partkey) AS mxx,
                          min(l_suppkey) AS mny, max(l_suppkey) AS mxy
                   FROM lineitem),
        k AS (SELECT l_partkey, l_suppkey,
                ${sqlBucket("l_partkey", "mnx", "mxx")} AS sx,
                ${sqlBucket("l_suppkey", "mny", "mxy")} AS sy
              FROM lineitem, b),
        z AS (SELECT l_partkey, l_suppkey, ($sqlInterleave) AS zkey FROM k)
        SELECT (zkey >> $bits) AS z_slice, COUNT(*) AS n_rows,
          min(l_partkey) AS min_part, max(l_partkey) AS max_part,
          min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
        FROM z GROUP BY 1 ORDER BY z_slice""")
    )
  }

  // Spark's NATIVE session_window operator (the engine-managed
  // merging-interval aggregation — same 1800s gap rule as the custom
  // q_sessionize, different machinery). Boundary semantics differ by
  // one instant: session_window's half-open [t, t+gap) means a gap of
  // EXACTLY 1800s starts a new session (the custom rule keeps it);
  // the oracle mirrors the native >= boundary.
  private val sessionWindowQ = Q(
    fn = (s, d) =>
      Tables
        .events(s, d)
        .groupBy(
          col("user_id"),
          session_window(col("ts"), "30 minutes").as("_w")
        )
        .agg(
          min(col("ts")).as("s_start"),
          max(col("ts")).as("s_end"),
          count(lit(1)).as("n_events")
        )
        .select("user_id", "s_start", "s_end", "n_events")
        .orderBy("user_id", "s_start"),
    oracle = Some("""
      WITH marked AS (
        SELECT user_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
               THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked)
      SELECT user_id, min(ts) AS s_start, max(ts) AS s_end,
        count(*) AS n_events
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, s_start""")
  )

  private val sessionize = Q(
    fn = (s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      Tables
        .events(s, d)
        .withColumn("_prev", lag(col("ts"), 1).over(byUser))
        .withColumn(
          "_new_session",
          when(
            col("_prev").isNull ||
              col("ts").cast("timestamp").cast("long") -
              col("_prev").cast("timestamp").cast("long") > 1800,
            1L
          ).otherwise(0L)
        )
        .withColumn("session_id", sum(col("_new_session")).over(byUser))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          (max(col("ts")).cast("timestamp").cast("long") -
            min(col("ts")).cast("timestamp").cast("long"))
            .as("duration_s")
        )
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("duration_s")).as("max_duration_s")
        )
        .orderBy("user_id")
    },
    oracle = Some("""
      WITH marked AS (
        SELECT user_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
               THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sessions AS (
        SELECT user_id, ts,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked),
      agg AS (
        SELECT user_id, session_id, count(*) AS n_events,
          CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s
        FROM sessions GROUP BY 1, 2)
      SELECT user_id, count(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events,
        max(duration_s) AS max_duration_s
      FROM agg GROUP BY user_id ORDER BY user_id""")
  )

  // TPC-H Q7 shape: two roles of the same dim (supplier nation vs
  // customer nation). Both nation sides are pre-filtered to the 2-name
  // set BEFORE joining (an IN + inequality replaces Q7's OR-of-ANDs —
  // equivalent on a 2-element set, and it prunes the dim scan instead
  // of post-filtering the fact join).
  private val q7Nations = Seq("NATION_1", "NATION_2")
  private val q7 = Q(
    fn = (s, d) => {
      val n1 = Tables
        .nation(s, d)
        .filter(col("n_name").isin(q7Nations: _*))
        .select(col("n_nationkey").as("_n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables
        .nation(s, d)
        .filter(col("n_name").isin(q7Nations: _*))
        .select(col("n_nationkey").as("_n2_key"), col("n_name").as("cust_nation"))
      val li = Tables
        .lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") <= lit("1997-12-31")
        )
      li.join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("_n1_key"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("_n2_key"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(
          col("supp_nation"),
          col("cust_nation"),
          year(col("l_shipdate")).as("l_year")
        )
        .agg(
          decSum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    oracle = Some(s"""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        EXTRACT(year FROM l_shipdate) AS l_year,
        ${sqlDecSum6("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('${q7Nations.mkString("', '")}')
        AND n2.n_name IN ('${q7Nations.mkString("', '")}')
        AND n1.n_name <> n2.n_name
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <= TIMESTAMP '1997-12-31 00:00:00'
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")
  )

  // TPC-H Q8 shape: market share = conditional-sum / sum over a
  // 6-table join. Region restricts the CUSTOMER side; the share is the
  // SUPPLIER nation's. Both sums ride one aggregation in DECIMAL, and
  // the final ratio is one double division — bit-equal both engines.
  private val q8 = Q(
    fn = (s, d) => {
      val amPart = Tables
        .part(s, d)
        .filter(col("p_type") === "ECONOMY")
        .select("p_partkey")
      val amNation = Tables
        .nation(s, d)
        .join(
          Tables.region(s, d).filter(col("r_name") === "AMERICA"),
          col("n_regionkey") === col("r_regionkey")
        )
        .select(col("n_nationkey").as("_cn_key"))
      val suppNation = Tables
        .nation(s, d)
        .select(col("n_nationkey").as("_sn_key"), col("n_name").as("_supp_nation"))
      val vol = decSum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
      val volBrazil = decSum6(
        when(
          col("_supp_nation") === "NATION_5",
          col("l_extendedprice") * (lit(1) - col("l_discount"))
        ).otherwise(lit(0.0))
      )
      Tables
        .lineitem(s, d)
        .join(amPart, col("l_partkey") === col("p_partkey"), "left_semi")
        .join(
          Tables
            .orders(s, d)
            .filter(
              col("o_orderdate") >= lit("1996-01-01") &&
                col("o_orderdate") <= lit("1997-12-31")
            ),
          col("l_orderkey") === col("o_orderkey")
        )
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(amNation), col("c_nationkey") === col("_cn_key"), "left_semi")
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("_sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((volBrazil / vol).as("mkt_share"), count(lit(1)).as("n_rows"))
        .orderBy("o_year")
    },
    oracle = Some(s"""
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
        ${sqlDecSum6(
        "CASE WHEN n2.n_name = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END"
      )} / ${sqlDecSum6("l_extendedprice * (1 - l_discount)")} AS mkt_share,
        COUNT(*) AS n_rows
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00'
      GROUP BY 1 ORDER BY 1""")
  )

  // TPC-H Q10 shape: returned-item revenue ranking — 4-table join,
  // grouped revenue, deterministic top-20 (revenue desc, custkey
  // tiebreak). TakeOrderedAndProject, not a global sort.
  private val q10 = Q(
    fn = (s, d) =>
      Tables
        .customer(s, d)
        .join(
          Tables
            .orders(s, d)
            .filter(
              col("o_orderdate") >= lit("1996-01-01") &&
                col("o_orderdate") < lit("1996-07-01")
            ),
          col("c_custkey") === col("o_custkey")
        )
        .join(
          Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey")
        )
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(
          decSum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue")
        )
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20),
    oracle = Some(s"""
      SELECT c_custkey, c_name, c_acctbal, n_name,
        ${sqlDecSum6("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""")
  )

  // TPC-H Q12 shape: join + CASE-bucketed conditional counts (the
  // schema has no l_shipmode/l_commitdate, so the buckets are order
  // priorities among severely-late shipments — same plan shape: one
  // join, one aggregation, the CASE arithmetic rides the partial agg).
  private val q12 = Q(
    fn = (s, d) => {
      val highSet = Seq("1-URGENT", "2-HIGH")
      Tables
        .lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1998-01-01")
        )
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin(highSet: _*), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority").isin(highSet: _*), 0L).otherwise(1L))
            .as("low_line_count")
        )
        .orderBy("l_returnflag")
    },
    oracle = Some("""
      SELECT l_returnflag,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  // TPC-H Q9 shape: profit by (supplier nation, year) over a 5-table
  // join with an arithmetic measure spanning two tables. The schema
  // has no partsupp, so ps_supplycost is proxied by a fixed fraction
  // of p_retailprice — the plan shape (part-name filter pruning the
  // part dim, fact-fact join on (orderkey), measure combining
  // lineitem and part columns, group on dim attributes) is unchanged.
  private val q9 = Q(
    fn = (s, d) => {
      val redParts = Tables
        .part(s, d)
        .filter(col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
      Tables
        .lineitem(s, d)
        .join(redParts, col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(
          decSum6(
            col("l_extendedprice") * (lit(1) - col("l_discount")) -
              lit(0.6) * col("p_retailprice") * col("l_quantity")
          ).as("sum_profit")
        )
        .orderBy(col("nation"), col("o_year").desc)
    },
    oracle = Some(s"""
      SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
        ${sqlDecSum6(
        "l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity"
      )} AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%red%'
      GROUP BY 1, 2 ORDER BY nation, o_year DESC""")
  )

  // Per-group relative ranking (percent_rank + quartile buckets) —
  // the stratification primitive for per-segment feature engineering.
  // The window partitions on nation (25 groups), so no single global
  // sort exists at any scale; the custkey tiebreak makes the total
  // order — and thus every rank — deterministic cross-engine.
  // Co-purchase PageRank: parts co-occurring in an order are linked;
  // 3 damped iterations rank cross-sell centrality. The per-order
  // self-join is bounded by order size (<= 7 lineitems), so the edge
  // build is O(|orders| * maxOrderSize^2) — never quadratic in parts.
  // Oracle unrolls the same iterations as chained CTEs; all scalar
  // arithmetic is forced to DOUBLE on both sides (DuckDB would
  // otherwise fold (1 - 0.85) in exact DECIMAL and diverge in the
  // last ulp) and contribution sums go through DECIMAL(38,12), so
  // ranks are bit-identical at every iteration.
  // Shared co-purchase graph: parts linked iff they co-occur in an
  // order (symmetrized by construction — both directions emitted)
  private def buildCopurchaseEdges(
      s: org.apache.spark.sql.SparkSession,
      dir: String
  ): org.apache.spark.sql.DataFrame = {
    val pairs = Tables
      .lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
    pairs
      .as("a")
      .join(pairs.as("b"), "l_orderkey")
      .where(col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
  }

  private val stagedEdgesView = "graft_copurchase_edges"
  private val stagedEdgesDirKey = "graft.staged.copurchase.dir"

  /** Stage the shared co-purchase edge table once for `dir` — written
    * to parquet at `path` and registered as a temp view that the four
    * graph queries (pagerank / label propagation / triangle count /
    * k-core) read instead of each re-running the per-order self-join.
    * This is how a real pipeline prices a multi-analysis graph: one
    * edge build, many algorithms. The dir guard keeps a staged table
    * from ever serving a DIFFERENT scale factor's query; the
    * correctness gate (Verify) never stages, so the full build stays
    * oracle-tested.
    */
  def stageCopurchaseEdges(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      path: String
  ): Unit = {
    buildCopurchaseEdges(s, dir).write.mode("overwrite").parquet(path)
    s.read.parquet(path).createOrReplaceTempView(stagedEdgesView)
    s.conf.set(stagedEdgesDirKey, dir)
  }

  /** Drop the staged edge table (guard conf + view). */
  def unstageCopurchaseEdges(s: org.apache.spark.sql.SparkSession): Unit = {
    s.conf.unset(stagedEdgesDirKey)
    s.catalog.dropTempView(stagedEdgesView)
  }

  private def copurchaseEdges(
      s: org.apache.spark.sql.SparkSession,
      dir: String
  ): org.apache.spark.sql.DataFrame =
    if (s.conf.getOption(stagedEdgesDirKey).contains(dir))
      s.table(stagedEdgesView)
    else buildCopurchaseEdges(s, dir)

  private val copurchaseEdgesSql = """
    pairs AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM pairs a JOIN pairs b ON a.l_orderkey = b.l_orderkey
        AND a.l_partkey <> b.l_partkey)"""

  private val pagerankQ = {
    val d = "CAST(0.85 AS DOUBLE)"
    def iter(i: Int): String = s"""
      c$i AS (SELECT e.dst AS node,
          CAST(sum(CAST(r.rank / r.deg AS DECIMAL(38,12))) AS DOUBLE) AS s
        FROM edges e JOIN r${i - 1} r ON e.src = r.node GROUP BY 1),
      r$i AS (SELECT n.node, n.deg,
          (1 - $d) + $d * COALESCE(c$i.s, CAST(0 AS DOUBLE)) AS rank
        FROM r${i - 1} n LEFT JOIN c$i ON n.node = c$i.node)"""
    Q(
      fn = (s, dir) =>
        graft.operators.Graph
          .pageRank(copurchaseEdges(s, dir), "src", "dst", iterations = 3)
          .select(
            col("node").as("p_partkey"),
            col("degree"),
            col("rank").as("pagerank")
          )
          .orderBy("p_partkey"),
      oracle = Some(s"""
        WITH $copurchaseEdgesSql,
        deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        r0 AS (SELECT src AS node, deg, CAST(1 AS DOUBLE) AS rank FROM deg),
        ${iter(1)},
        ${iter(2)},
        ${iter(3)}
        SELECT node AS p_partkey, deg AS degree, round(rank, 6) AS pagerank
        FROM r3 ORDER BY p_partkey""")
    )
  }

  // Community detection over the same co-purchase graph: 3 rounds of
  // deterministic (min-label tie-break) synchronous label propagation,
  // integer-only — the oracle unrolls each round as a count + argmax
  // CTE pair, no floating point anywhere.
  private val lpaQ = {
    def iter(i: Int): String = s"""
      c$i AS (SELECT e.dst AS node, l.label, count(*) AS c
        FROM edges e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2),
      l$i AS (SELECT node, label FROM (
          SELECT node, label,
            row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
          FROM c$i) WHERE rn = 1)"""
    Q(
      fn = (s, dir) => {
        val labels = graft.operators.Graph
          .labelPropagation(copurchaseEdges(s, dir), "src", "dst", iterations = 3)
        // community size as a window count, NOT a groupBy+self-join:
        // the join's two branches each re-execute the full 3-iteration
        // lineage (no exchange reuse across them — measured 4x the
        // runtime); the window is one pass over the |V|-row result
        labels
          .select(
            col("node").as("p_partkey"),
            col("label").as("community"),
            count(lit(1))
              .over(Window.partitionBy("label"))
              .as("community_size")
          )
          .orderBy("p_partkey")
      },
      oracle = Some(s"""
        WITH $copurchaseEdgesSql,
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
        ${iter(1)},
        ${iter(2)},
        ${iter(3)},
        sz AS (SELECT label, count(*) AS community_size FROM l3 GROUP BY 1)
        SELECT node AS p_partkey, l3.label AS community, community_size
        FROM l3 JOIN sz ON l3.label = sz.label ORDER BY p_partkey""")
    )
  }

  // Join-size pre-flight: exact output cardinality of the events
  // self-join on user_id (the sessionize/funnel shuffle key), ranked
  // by per-key contribution — the "do I need to salt this?" report
  private val joinCardQ = Q(
    fn = (s, d) => {
      val ev = Tables.events(s, d)
      graft.operators.JoinStats
        .joinCardinality(ev, ev, "user_id", "user_id", topK = 25)
        .withColumnRenamed("key", "user_id")
    },
    oracle = Some("""
      WITH l AS (SELECT user_id AS key, count(*) AS n_left
                 FROM events GROUP BY 1),
      p AS (SELECT key, n_left, n_left AS n_right,
              n_left * n_left AS out_rows FROM l),
      t AS (SELECT SUM(out_rows) AS tot FROM p)
      SELECT p.key AS user_id, p.n_left, p.n_right,
        CAST(p.out_rows AS BIGINT) AS out_rows,
        round(p.out_rows / t.tot, 6) AS share
      FROM p, t ORDER BY p.out_rows DESC, p.key LIMIT 25""")
  )

  // Per-node triangles + clustering coefficient on the co-purchase
  // graph; degree-ordered orientation keeps the wedge join O(|E|^1.5)
  private val triangleQ = Q(
    fn = (s, dir) =>
      graft.operators.Graph
        .triangleCounts(copurchaseEdges(s, dir), "src", "dst")
        .select(
          col("node").as("p_partkey"),
          col("degree"),
          col("triangles"),
          col("clustering")
        )
        .orderBy("p_partkey"),
    oracle = Some(s"""
      WITH $copurchaseEdgesSql,
      deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
      o AS (SELECT e.src, e.dst FROM edges e
        JOIN deg d1 ON e.src = d1.src JOIN deg d2 ON e.dst = d2.src
        WHERE d1.deg < d2.deg OR (d1.deg = d2.deg AND e.src < e.dst)),
      tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst <> e2.dst
        WHERE EXISTS (SELECT 1 FROM o WHERE o.src = e1.dst AND o.dst = e2.dst)),
      pn AS (SELECT node, count(*) AS triangles FROM (
          SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri) GROUP BY 1)
      SELECT d.src AS p_partkey, d.deg AS degree,
        COALESCE(pn.triangles, 0) AS triangles,
        CASE WHEN d.deg >= 2 THEN
          round(CAST(2 AS DOUBLE) * COALESCE(pn.triangles, 0)
                / (d.deg * (d.deg - 1)), 6)
        END AS clustering
      FROM deg d LEFT JOIN pn ON d.src = pn.node ORDER BY p_partkey""")
  )

  // Dense-core extraction on the co-purchase graph: 3 synchronous
  // k-core peel rounds at k=3 — the oracle unrolls each round as a
  // degree + keep-set + edge-restriction CTE triple, integer-only.
  // Survivors are the co-purchase cliques; tendrils dissolve.
  private val kcoreQ = {
    val k = 3
    def iter(i: Int): String = s"""
      d$i AS (SELECT src, count(*) AS deg FROM e${i - 1} GROUP BY 1),
      k$i AS (SELECT src FROM d$i WHERE deg >= $k),
      e$i AS (SELECT e.src, e.dst FROM e${i - 1} e
        JOIN k$i a ON e.src = a.src JOIN k$i b ON e.dst = b.src)"""
    Q(
      fn = (s, dir) =>
        graft.operators.Graph
          // copurchaseEdges is symmetric+distinct+loop-free by
          // construction — skip the 2|E| re-symmetrize shuffle
          .kCore(copurchaseEdges(s, dir), "src", "dst", k = k, rounds = 3,
            symmetrize = false)
          .select(col("node").as("p_partkey"), col("deg"))
          .orderBy("p_partkey"),
      oracle = Some(s"""
        WITH $copurchaseEdgesSql,
        e0 AS (SELECT src, dst FROM edges),
        ${iter(1)},
        ${iter(2)},
        ${iter(3)}
        SELECT src AS p_partkey, count(*) AS deg
        FROM e3 GROUP BY 1 ORDER BY p_partkey""")
    )
  }

  // Common-neighbor / Jaccard link prediction, top-100 candidate
  // pairs by jaccard (TakeOrdered). The synthetic co-purchase graph
  // is abnormally DENSE (~115 median degree — every part in ~30
  // orders), so the demo runs on a 10%-of-orders slice (median degree
  // ~12, the realistic regime); the hub cap still bounds the wedge
  // join, and its exclusion semantics are spec-pinned on GraphSpec's
  // planted hub
  private val linkPredictionQ = Q(
    fn = (s, dir) => {
      val pairs = Tables
        .lineitem(s, dir)
        .where(pmod(col("l_orderkey"), lit(10)) === 0)
        .select(col("l_orderkey"), col("l_partkey"))
        .distinct()
      val edges = pairs
        .as("a")
        .join(pairs.as("b"), "l_orderkey")
        .where(col("a.l_partkey") =!= col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      graft.operators.Graph
        .commonNeighbors(edges, "src", "dst", maxCenterDegree = 120, minCommon = 2)
        .orderBy(col("jaccard").desc, col("node_a"), col("node_b"))
        .limit(100)
    },
    oracle = Some("""
      WITH pairs AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        WHERE l_orderkey % 10 = 0),
      edges AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM pairs a JOIN pairs b ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey <> b.l_partkey),
      deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
      adj AS (SELECT e.src, e.dst FROM edges e
        JOIN deg d ON e.src = d.src AND d.deg <= 120),
      p AS (SELECT e1.dst AS node_a, e2.dst AS node_b, count(*) AS common
        FROM adj e1 JOIN adj e2 ON e1.src = e2.src AND e1.dst < e2.dst
        GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT p.node_a, p.node_b, p.common,
        round(p.common / (da.deg + db.deg - p.common), 6) AS jaccard
      FROM p JOIN deg da ON p.node_a = da.src
        JOIN deg db ON p.node_b = db.src
      ORDER BY jaccard DESC, node_a, node_b LIMIT 100""")
  )

  private val percentRank = Q(
    fn = (s, d) => {
      val w = Window
        .partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables
        .customer(s, d)
        .select(
          col("c_custkey"),
          col("c_nationkey"),
          col("c_acctbal"),
          round6(percent_rank().over(w)).as("bal_pct"),
          ntile(4).over(w).as("bal_quartile")
        )
        .orderBy("c_custkey")
    },
    oracle = Some(s"""
      SELECT c_custkey, c_nationkey, c_acctbal,
        ${sqlRound6(
        "percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)"
      )} AS bal_pct,
        ntile(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
          AS bal_quartile
      FROM customer ORDER BY c_custkey""")
  )

  val queries: Map[String, Q] = Map(
    "q_percent_rank" -> percentRank,
    "q_copurchase_pagerank" -> pagerankQ,
    "q_label_propagation" -> lpaQ,
    "q_triangle_count" -> triangleQ,
    "q_kcore" -> kcoreQ,
    "q_link_prediction" -> linkPredictionQ,
    "q_join_cardinality" -> joinCardQ,
    "q9_product_profit" -> q9,
    "q7_volume_shipping" -> q7,
    "q8_market_share" -> q8,
    "q10_returned_items" -> q10,
    "q12_priority_buckets" -> q12,
    "q1_agg" -> q1,
    "q6_filter_agg" -> q6,
    "q18_top_customers" -> q18,
    "q_bloom_join" -> bloomQ,
    "q14_promo_revenue" -> q14,
    "q19_disjunctive_join" -> q19,
    "q_sessionize" -> sessionize,
    "q_session_window" -> sessionWindowQ,
    "q_asof_join" -> asofQ,
    "q_range_join" -> rangeQ,
    "q_hash_split" -> splitQ,
    "q_group_split" -> groupSplitQ,
    "q_stratified_split" -> stratSplitQ,
    "q_fuzzy_join" -> fuzzyJoinQ,
    "q_entity_resolution" -> entityResolutionQ,
    "q_stratified_sample" -> stratifiedQ,
    "q_weighted_sample" -> weightedSampleQ,
    "q_zorder_stats" -> zorderQ,
    "q_pivot" -> pivotQ,
    "q_cube" -> cubeQ,
    "q_unpivot" -> unpivotQ,
    "q3_join" -> q3,
    "q5_multi_join" -> q5,
    "q_window_topk" -> windowTopK,
    "q_group_topk_agg" -> groupTopKAgg,
    "q_anti_join" -> antiJoin,
    "q_rollup" -> rollup,
    "q_semi_join" -> semiJoin,
    "q_running_sum" -> runningSum,
    "q_rolling_time_range" -> rollingTimeRange,
    "q_skew_salted_join" -> skewSaltedJoin
  )
}
