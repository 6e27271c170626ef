package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** TPC-H correlated-subquery shapes (Q4/Q13/Q15/Q17/Q21/Q22),
  * re-expressed as the decorrelated join/aggregate plans a distributed
  * engine actually runs, plus keep-latest-per-key compaction.
  *
  * Why these six: each exercises a distinct decorrelation pattern the
  * reference's SQL surface relies on — EXISTS → left-semi with a
  * cross-side predicate (Q4), COUNT over LEFT JOIN with an ON-clause
  * filter (Q13), scalar aggregate subquery → 1-row broadcast join
  * (Q15, Q22), correlated per-group average → grouped pre-aggregate
  * joined back (Q17), and stacked EXISTS / NOT EXISTS on the same
  * relation → semi + anti self-joins (Q21).
  *
  * Scale notes (100 TB): every subquery becomes a keyed shuffle or a
  * broadcast of a provably-bounded side (1-row scalars, the 25-row
  * nation set, a per-part aggregate that is |part|-sized). Nothing
  * re-executes per outer row — the classic correlated-subquery
  * scaling trap — and no nested-loop join appears in any plan. The
  * schema here lacks l_commitdate/l_receiptdate/c_phone, so the Q4/Q21
  * "late" predicate is l_shipdate vs o_orderdate and Q22's country
  * prefix is a nation-key set; the plan shapes are unchanged.
  */
object DecorrelatedQueries extends QueryPack {

  // TPC-H Q4 shape: EXISTS(correlated, cross-side predicate) → LEFT
  // SEMI join whose condition references both sides. One shuffle on
  // orderkey; the semi join short-circuits per order (no fan-out).
  private val q4 = Q(
    fn = (s, d) => {
      val ord = Tables
        .orders(s, d)
        .filter(
          col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1996-07-01")
        )
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      ord
        .join(
          li,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"),
          "left_semi"
        )
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    oracle = Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders o
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  )

  // TPC-H Q13 shape: LEFT OUTER join with the filter in the ON clause
  // (NOT pushed to WHERE — customers with zero matching orders must
  // survive with count 0), then a count-of-counts distribution. Two
  // keyed shuffles (custkey, then c_count) — both map-side combinable.
  private val q13 = Q(
    fn = (s, d) => {
      val cust = Tables.customer(s, d).select("c_custkey")
      val ord = Tables
        .orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_custkey", "o_orderkey")
      cust
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    oracle = Some("""
      SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""")
  )

  // TPC-H Q15 shape: aggregate view + scalar MAX subquery → the view
  // is computed ONCE, its 1-row max is broadcast back onto it via an
  // equi-join on a literal key (never a nested loop, never a
  // recompute). Revenue sums ride DECIMAL for cross-engine exactness,
  // so the `revenue = max` equality is bit-safe.
  private val q15 = Q(
    fn = (s, d) => {
      val revenue = Tables
        .lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1996-04-01")
        )
        .groupBy(col("l_suppkey"))
        .agg(
          decSum6(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("total_revenue")
        )
      val maxRev = revenue
        .agg(max(col("total_revenue")).as("_max_rev"))
        .withColumn("_k", lit(1))
      val top = revenue
        .withColumn("_k", lit(1))
        .join(broadcast(maxRev), "_k")
        .where(col("total_revenue") === col("_max_rev"))
      Tables
        .supplier(s, d)
        .select("s_suppkey", "s_name")
        .join(top, col("s_suppkey") === col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },
    oracle = Some(s"""
      WITH revenue AS (
        SELECT l_suppkey,
          ${sqlDecSum6("l_extendedprice * (1 - l_discount)")} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier JOIN revenue ON s_suppkey = l_suppkey
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      ORDER BY s_suppkey""")
  )

  // TPC-H Q17 shape: correlated per-part AVG subquery → a grouped
  // pre-aggregate over ONLY the parts that can match (semi-filtered
  // through the dim predicate first — at 100 TB that prunes the
  // per-part aggregate from |part| to |selected parts|), joined back
  // and compared. Threshold arithmetic is exact-decimal-sum / count,
  // identical both engines.
  private val q17 = Q(
    fn = (s, d) => {
      val parts = Tables
        .part(s, d)
        .filter(col("p_brand") === "Brand#7" && col("p_type") === "ECONOMY")
        .select("p_partkey")
      val li = Tables
        .lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(parts, col("l_partkey") === col("p_partkey"), "left_semi")
      val perPart = li
        .groupBy(col("l_partkey").as("_avg_partkey"))
        .agg(decAvg2(col("l_quantity")).as("_avg_qty"))
      li.join(perPart, col("l_partkey") === col("_avg_partkey"))
        .where(col("l_quantity") < lit(0.2) * col("_avg_qty"))
        .agg(
          (decSum2(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_rows")
        )
    },
    oracle = Some(s"""
      SELECT ${sqlDecSum2("l_extendedprice")} / 7.0 AS avg_yearly,
        COUNT(*) AS n_rows
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#7' AND p.p_type = 'ECONOMY'
        AND l.l_quantity < 0.2 * (
          SELECT ${sqlDecAvg2("l2.l_quantity")}
          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""")
  )

  // TPC-H Q21 shape: EXISTS + NOT EXISTS stacked on the same relation
  // → one "late lineitems of F-orders" build reused three ways: as the
  // probe, as a left-semi (another supplier shipped on the order), and
  // as a left-anti (no OTHER supplier was late). Self-joins key on
  // orderkey — each is one shuffle of the bounded late-subset, not of
  // lineitem.
  private val q21 = Q(
    fn = (s, d) => {
      val ordF = Tables
        .orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
      val late = Tables
        .lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(ordF, col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
      val l2 = li.select(
        col("l_orderkey").as("_l2_orderkey"),
        col("l_suppkey").as("_l2_suppkey")
      )
      val l3 = late.select(
        col("l_orderkey").as("_l3_orderkey"),
        col("l_suppkey").as("_l3_suppkey")
      )
      val waiting = late
        .join(
          l2,
          col("l_orderkey") === col("_l2_orderkey") &&
            col("l_suppkey") =!= col("_l2_suppkey"),
          "left_semi"
        )
        .join(
          l3,
          col("l_orderkey") === col("_l3_orderkey") &&
            col("l_suppkey") =!= col("_l3_suppkey"),
          "left_anti"
        )
      Tables
        .supplier(s, d)
        .select("s_suppkey", "s_name")
        .join(waiting, col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },
    oracle = Some("""
      SELECT s_name, COUNT(*) AS numwait
      FROM supplier, lineitem l1, orders o
      WHERE s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
        AND o.o_orderstatus = 'F'
        AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3, orders o3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND o3.o_orderkey = l3.l_orderkey
                          AND o3.o_orderstatus = 'F'
                          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 20""")
  )

  // TPC-H Q22 shape: scalar AVG subquery + NOT EXISTS → the 1-row
  // average broadcast-joined on a literal key, then a left-anti against
  // orders. The nation-key set plays Q22's phone-prefix role (schema
  // has no c_phone).
  private val natSet = Seq(1, 5, 9, 13, 17, 21)

  private val q22 = Q(
    fn = (s, d) => {
      val cust = Tables
        .customer(s, d)
        .filter(col("c_nationkey").isin(natSet: _*))
        .select("c_custkey", "c_nationkey", "c_acctbal")
      val avgBal = cust
        .where(col("c_acctbal") > 0)
        .agg(decAvg2(col("c_acctbal")).as("_avg_bal"))
        .withColumn("_k", lit(1))
      // "idle" = no order since the cutoff — the date predicate pushes
      // into the orders scan, shrinking the anti-join build side
      val ord = Tables
        .orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01"))
        .select("o_custkey")
      cust
        .withColumn("_k", lit(1))
        .join(broadcast(avgBal), "_k")
        .where(col("c_acctbal") > col("_avg_bal"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(
          count(lit(1)).as("numcust"),
          decSum2(col("c_acctbal")).as("totacctbal")
        )
        .orderBy(col("c_nationkey"))
    },
    oracle = Some(s"""
      SELECT c_nationkey, COUNT(*) AS numcust,
        ${sqlDecSum2("c_acctbal")} AS totacctbal
      FROM customer c
      WHERE c_nationkey IN (${natSet.mkString(", ")})
        AND c_acctbal > (
          SELECT ${sqlDecAvg2("c2.c_acctbal")}
          FROM customer c2
          WHERE c2.c_acctbal > 0 AND c2.c_nationkey IN (${natSet.mkString(", ")}))
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY c_nationkey
      ORDER BY c_nationkey""")
  )

  // Keep-latest-per-key compaction (SCD-style "current view" of an
  // event stream): rank-over-partition with a deterministic tiebreak,
  // pruned by the WindowGroupLimit rule to a per-partition top-1 —
  // never a global sort, never a groupBy+join-back double scan.
  private val latestQ = Q(
    fn = (s, d) => {
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables
        .events(s, d)
        .withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .orderBy("user_id")
    },
    oracle = Some("""
      SELECT user_id, event_id, ts, event_type, value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
      ORDER BY user_id""")
  )

  // CDC companion to keep-latest: SCD2 validity intervals. Each change
  // event becomes a versioned row [valid_from, valid_to) with the open
  // interval flagged current — temporal-table construction from a
  // change log in ONE keyed window (shuffle on user, sort within), no
  // self-join. At 100 TB this is the minimal-cost shape: the same
  // partitioning serves both the lead() and any as-of lookup built on
  // the result.
  private val scd2Q = Q(
    fn = (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables
        .events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
        .withColumn("valid_from", col("ts"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .select(
          col("user_id"),
          col("event_id"),
          col("valid_from"),
          col("valid_to"),
          col("is_current"),
          col("event_type"),
          col("value")
        )
        .orderBy("user_id", "valid_from", "event_id")
    },
    oracle = Some("""
      SELECT user_id, event_id, ts AS valid_from,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
          AS is_current,
        event_type, value
      FROM events
      ORDER BY user_id, valid_from, event_id""")
  )

  // ---- derived part-supplier relation --------------------------------
  // The synthetic schema has no partsupp table; Q2/Q11/Q16/Q20 run over
  // the relation derived from lineitem: one row per (partkey, suppkey)
  // with supplycost = MIN(l_extendedprice) (order-independent, exact in
  // double) and availqty = SUM(l_quantity) through DECIMAL. One keyed
  // map-side-combinable shuffle; at 100 TB this is the same shape as
  // scanning a real partsupp table bucketed by partkey.
  private def partsupp(
      s: org.apache.spark.sql.SparkSession,
      d: String
  ): org.apache.spark.sql.DataFrame =
    Tables
      .lineitem(s, d)
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(
        min(col("l_extendedprice")).as("ps_supplycost"),
        decSum2(col("l_quantity")).as("ps_availqty")
      )

  private val psSql: String =
    """ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(l_extendedprice) AS ps_supplycost,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ps_availqty
        FROM lineitem GROUP BY 1, 2)"""

  // TPC-H Q2 shape: correlated scalar MIN subquery ("cheapest supplier
  // of this part within the region") → decorrelated as a grouped MIN
  // over the region-restricted partsupp joined back on
  // (partkey, cost = min_cost). Dims (supplier x nation x region) are
  // bounded → broadcast; the min-table join reuses the partkey shuffle.
  // Double equality on the join is safe: both sides carry the SAME
  // stored values and MIN is exact.
  private val q2 = Q(
    fn = (s, d) => {
      val eu = Tables
        .supplier(s, d)
        .join(
          broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey")
        )
        .join(
          broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey")
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val rs = partsupp(s, d).join(broadcast(eu), col("ps_suppkey") === col("s_suppkey"))
      val mn = rs.groupBy("ps_partkey").agg(min(col("ps_supplycost")).as("_min_cost"))
      val prt = Tables
        .part(s, d)
        .filter(col("p_size") === 15 && col("p_type") === "ECONOMY")
        .select("p_partkey", "p_name")
      rs.join(mn, Seq("ps_partkey"))
        .where(col("ps_supplycost") === col("_min_cost"))
        .join(broadcast(prt), col("ps_partkey") === col("p_partkey"))
        .select(
          col("s_acctbal"),
          col("s_name"),
          col("n_name"),
          col("p_partkey"),
          col("p_name"),
          col("ps_supplycost")
        )
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    oracle = Some(s"""
      WITH $psSql,
      eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
             FROM supplier
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
      rs AS (SELECT ps.*, eu.s_name, eu.s_acctbal, eu.n_name
             FROM ps JOIN eu ON ps_suppkey = s_suppkey),
      mn AS (SELECT ps_partkey, MIN(ps_supplycost) AS min_cost FROM rs GROUP BY 1)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
      FROM rs
      JOIN mn ON rs.ps_partkey = mn.ps_partkey AND ps_supplycost = min_cost
      JOIN part ON p_partkey = rs.ps_partkey AND p_size = 15 AND p_type = 'ECONOMY'
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100""")
  )

  // TPC-H Q11 shape: GROUP BY ... HAVING value > fraction-of-total,
  // where the total is a scalar subquery over the same aggregate → the
  // per-part value table is computed ONCE, its 1-row total broadcast
  // back. The threshold compare is cross-multiplied in DECIMAL
  // (value * cnt > 3 * total) so both engines decide the boundary on
  // exact arithmetic, never on a double division.
  private val q11 = Q(
    fn = (s, d) => {
      val natSupp = Tables
        .supplier(s, d)
        .join(
          broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_0")),
          col("s_nationkey") === col("n_nationkey")
        )
        .select("s_suppkey")
      val value = partsupp(s, d)
        .join(broadcast(natSupp), col("ps_suppkey") === col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(
          sum(
            col("ps_supplycost").cast(DecimalType(18, 2)) *
              col("ps_availqty").cast(DecimalType(18, 2))
          ).as("_value_dec")
        )
      val tot = value
        .agg(sum(col("_value_dec")).as("_total"), count(lit(1)).as("_cnt"))
        .withColumn("_k", lit(1))
      // Cross-multiplied threshold stays exact, but DECIMAL(38,4) * cnt
      // can exceed precision 38 (≈34 integer digits / group count) and
      // Spark's non-ANSI overflow answer is NULL — which a bare filter
      // would silently drop. Both operands are non-null by construction
      // (sums/counts over non-null inputs), so a NULL product can ONLY
      // mean overflow: fail loudly instead of losing qualifying rows.
      val lhs = col("_value_dec") * col("_cnt")
      val rhs = col("_total") * lit(3)
      value
        .withColumn("_k", lit(1))
        .join(broadcast(tot), "_k")
        .where(
          when(
            lhs.isNull || rhs.isNull,
            raise_error(lit(
              "q11: decimal overflow in threshold cross-multiply — " +
                "value*cnt exceeded DECIMAL(38,4); rescale the inputs"
            )).cast("boolean")
          ).otherwise(lhs > rhs)
        )
        .select(col("ps_partkey"), col("_value_dec").cast(DoubleType).as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    },
    oracle = Some(s"""
      WITH $psSql,
      v AS (SELECT ps_partkey,
              SUM(CAST(ps_supplycost AS DECIMAL(18,2)) *
                  CAST(ps_availqty AS DECIMAL(18,2))) AS value_d
            FROM ps
            JOIN supplier ON ps_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_0'
            GROUP BY 1),
      t AS (SELECT SUM(value_d) AS total, COUNT(*) AS cnt FROM v)
      SELECT ps_partkey, CAST(value_d AS DOUBLE) AS value
      FROM v, t
      WHERE value_d * cnt > 3 * total
      ORDER BY value DESC, ps_partkey""")
  )

  // TPC-H Q16 shape: NOT IN (subquery) → broadcast LEFT ANTI join
  // against the excluded-supplier set, then COUNT(DISTINCT suppkey) per
  // (brand, type, size). The distinct-count shuffles the already
  // part-filtered partsupp — never the corpus — and the supplier
  // exclusion list is |supplier|-bounded.
  private val q16 = Q(
    fn = (s, d) => {
      val excluded = Tables
        .supplier(s, d)
        .filter(col("s_acctbal") < 500)
        .select(col("s_suppkey"))
      val prt = Tables
        .part(s, d)
        .filter(
          col("p_brand") =!= "Brand#13" && col("p_type") =!= "MEDIUM" &&
            col("p_size").isin(1, 4, 9, 14, 19, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
      partsupp(s, d)
        .join(broadcast(excluded), col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(prt), col("ps_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    oracle = Some(s"""
      WITH $psSql
      SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
      FROM ps
      JOIN part ON p_partkey = ps_partkey
      WHERE p_brand <> 'Brand#13' AND p_type <> 'MEDIUM'
        AND p_size IN (1, 4, 9, 14, 19, 25, 36, 49)
        AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
  )

  // TPC-H Q20 shape: nested correlated subqueries ("suppliers whose
  // stock of a named part exceeds half of what they shipped in the
  // window") → the shipped-quantity aggregate groups on the SAME
  // (partkey, suppkey) key as the derived partsupp, so the correlation
  // join is co-partitioned; the qualifying-supplier set then drives a
  // LEFT SEMI join on the bounded supplier table. The half-of-shipped
  // threshold cross-multiplies in DECIMAL (2*avail > shipped) to stay
  // engine-exact.
  private val q20 = Q(
    fn = (s, d) => {
      val shipped = Tables
        .lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1996-07-01")
        )
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(decSum2(col("l_quantity")).as("_qty"))
      val redParts = Tables
        .part(s, d)
        .filter(col("p_name").like("red%"))
        .select(col("p_partkey"))
      val cand = partsupp(s, d)
        .join(broadcast(redParts), col("ps_partkey") === col("p_partkey"), "left_semi")
        .join(
          shipped,
          col("ps_partkey") === col("l_partkey") && col("ps_suppkey") === col("l_suppkey")
        )
        .where(
          col("ps_availqty").cast(DecimalType(18, 2)) * lit(2) >
            col("_qty").cast(DecimalType(18, 2))
        )
        .select(col("ps_suppkey"))
      Tables
        .supplier(s, d)
        .join(
          broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_0")),
          col("s_nationkey") === col("n_nationkey")
        )
        .join(cand, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    },
    oracle = Some(s"""
      WITH $psSql,
      shipped AS (SELECT l_partkey, l_suppkey,
                    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
                  FROM lineitem
                  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                    AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
                  GROUP BY 1, 2),
      cand AS (SELECT ps_suppkey FROM ps
               JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
               WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
                 AND CAST(ps_availqty AS DECIMAL(18,2)) * 2 > CAST(qty AS DECIMAL(18,2)))
      SELECT s_name, s_acctbal
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_0'
      WHERE s_suppkey IN (SELECT ps_suppkey FROM cand)
      ORDER BY s_name""")
  )

  val queries: Map[String, Q] = Map(
    "q2_min_cost_supplier" -> q2,
    "q4_order_priority" -> q4,
    "q11_important_stock" -> q11,
    "q13_custdist" -> q13,
    "q15_top_supplier" -> q15,
    "q16_supplier_cnt" -> q16,
    "q17_small_qty_revenue" -> q17,
    "q20_excess_stock" -> q20,
    "q21_late_suppliers" -> q21,
    "q22_idle_customers" -> q22,
    "q_dedup_latest" -> latestQ,
    "q_scd2_intervals" -> scd2Q
  )
}
