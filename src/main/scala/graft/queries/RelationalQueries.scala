package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Relational coverage over the TPC-H-ish tables: joins (broadcast +
  * shuffle), multi-way joins, distinct aggregation, analytic windows,
  * top-k. The reference never joins on data values (SURVEY.md §2.3) —
  * these come "free" from Catalyst and anchor the 100-TB scale story:
  * small dims are broadcast, the lineitem side never shuffles for them.
  */
object RelationalQueries {

  import org.apache.spark.sql.Column

  /** Monetary sums are computed in exact DECIMAL, not double: parquet
    * doubles carry 2-decimal values, and a double-sum rounded at 2
    * decimals lands exactly on the .xx5 half-way boundary, where
    * partial-agg order noise flips the last cent vs the oracle. The
    * decimal path is order-independent and exact on both engines; the
    * result is cast back to double at the edge. */
  private def money(c: Column): Column = c.cast("decimal(12,2)")
  private def factor(c: Column): Column = c.cast("decimal(4,2)")
  private def sum2(c: Column): Column = round(sum(c), 2).cast("double")

  private val discPrice =
    money(col("l_extendedprice")) * factor(lit(1) - col("l_discount"))
  private val charge =
    money(col("l_extendedprice")) * factor(lit(1) - col("l_discount")) *
      factor(lit(1) + col("l_tax"))

  val all: Seq[Q] = Seq(

    // TPC-H Q1-shaped scan+agg: the bench workhorse (map-side partial agg,
    // 4 groups, no shuffle pressure).
    Q("q1_pricing_summary",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum2(money(col("l_quantity"))).as("sum_qty"),
          sum2(money(col("l_extendedprice"))).as("sum_base_price"),
          sum2(discPrice).as("sum_disc_price"),
          sum2(charge).as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_qty,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_base_price,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))),2) AS DOUBLE) AS sum_disc_price,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2)) * CAST(1+l_tax AS DECIMAL(4,2))),2) AS DOUBLE) AS sum_charge,
             |  round(avg(l_quantity),6) AS avg_qty,
             |  round(avg(l_extendedprice),6) AS avg_price,
             |  round(avg(l_discount),6) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // TPC-H Q3-shaped 3-way join; customer+orders broadcast-able sides at
    // test SF, shuffle join at 100 TB — Catalyst/AQE picks per stats.
    Q("q3_shipping_priority",
      (s, dir) => {
        val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy("l_orderkey")
          .agg(sum2(discPrice).as("revenue"))
          .orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))),2) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |  AND l_shipdate > TIMESTAMP '1998-01-01'
             |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // TPC-H Q5-shaped 6-way join through region→nation→(customer,supplier)
    Q("q5_local_supplier_volume",
      (s, dir) => {
        val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
        val n = Tables.nation(s, dir)
        val c = Tables.customer(s, dir)
        val sup = Tables.supplier(s, dir)
        val o = Tables.orders(s, dir)
        val l = Tables.lineitem(s, dir)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey")
            && c("c_nationkey") === sup("s_nationkey"))
          .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("n_name")
          .agg(sum2(discPrice).as("revenue"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))),2) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Broadcast dim join: part is always the small side — explicit hint.
    Q("join_part_brand",
      (s, dir) => Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum2(money(col("l_extendedprice"))).as("sum_price"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand, count(*) AS n,
             |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_price
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // Semi/anti joins: orders with vs without any high-quantity lineitem.
    Q("join_semi_anti",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val big = Tables.lineitem(s, dir).filter(col("l_quantity") >= 45)
          .select(col("l_orderkey"))
        val semi = o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
          .agg(count(lit(1)).as("n")).select(lit("with_big_line").as("side"), col("n"))
        val anti = o.join(big, o("o_orderkey") === big("l_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n")).select(lit("without_big_line").as("side"), col("n"))
        semi.unionAll(anti).orderBy("side")
      },
      Some("""SELECT 'with_big_line' AS side, count(*) AS n FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
             |UNION ALL
             |SELECT 'without_big_line' AS side, count(*) AS n FROM orders
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem
             |                  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
             |ORDER BY side""".stripMargin)),

    // Binned range join: events.value against value bands via the
    // fixed-width bin-grid equi-join (ops/RangeJoin) — identical
    // result to the naive range-predicate join the oracle runs, but
    // the plan is a hash join, never BroadcastNestedLoop (PlanSpec
    // pins the shape)
    Q("join_range_binned",
      (s, dir) => {
        import s.implicits._
        val bands = Seq(
          ("b1_tiny", 0.0, 10.0), ("b2_low", 10.0, 25.0),
          ("b3_mid", 25.0, 50.0), ("b4_high", 50.0, 100.0),
          ("b5_extreme", 100.0, 1000.0)).toDF("band", "lo", "hi")
        graft.ops.RangeJoin.pointInInterval(
            Tables.events(s, dir).na.drop(Seq("value")).select(col("value")),
            "value", bands, "lo", "hi", 25.0)
          .groupBy("band")
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_v"))
          .orderBy("band")
      },
      Some("""WITH bands(band, lo, hi) AS (VALUES
             |  ('b1_tiny', 0.0, 10.0), ('b2_low', 10.0, 25.0),
             |  ('b3_mid', 25.0, 50.0), ('b4_high', 50.0, 100.0),
             |  ('b5_extreme', 100.0, 1000.0))
             |SELECT band, count(*) AS n, round(sum(value), 4) AS sum_v
             |FROM events e JOIN bands b
             |  ON e.value >= b.lo AND e.value < b.hi
             |WHERE e.value IS NOT NULL
             |GROUP BY band ORDER BY band""".stripMargin)),

    // Distinct aggregation (expand + two-phase agg in Spark)
    Q("agg_distinct_counts",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("parts"),
          countDistinct(col("l_suppkey")).as("supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS parts,
             |       count(DISTINCT l_suppkey) AS supps, count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ROLLUP hierarchy: per (flag, status), per flag, grand total —
    // SURVEY §2.4 lists grouping sets as "Catalyst provides"; this row
    // proves the provided semantics match ANSI (DuckDB ROLLUP) exactly,
    // including the NULL subtotal rows and GROUPING() markers
    Q("agg_rollup",
      (s, dir) => Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          sum2(money(col("l_quantity"))).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("g_flag"), col("g_status"), col("sum_qty"), col("n"))
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
             |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
             |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
             |  count(*) AS n
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin)),

    // CUBE: all 2^k grouping-set combinations in one pass (the OLAP
    // twin of ROLLUP's hierarchy)
    Q("agg_cube",
      (s, dir) => Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          sum2(money(col("l_quantity"))).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("g_flag"), col("g_status"), col("sum_qty"), col("n"))
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
             |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
             |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
             |  count(*) AS n
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin)),

    // GROUPING SETS with arbitrary (non-hierarchical) sets: per-flag,
    // per-status, and grand total in one pass — the case ROLLUP/CUBE
    // can't express. Uses the Dataset groupingSets API (Spark 4).
    Q("agg_grouping_sets",
      (s, dir) => Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          sum2(money(col("l_quantity"))).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("g_flag"), col("g_status"), col("sum_qty"), col("n"))
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
             |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
             |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
             |  count(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin)),

    // Pivot: one column per line status, decimal-exact sums — the
    // oracle spells the same thing as conditional aggregation
    Q("agg_pivot",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum2(money(col("l_quantity"))))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(round(sum(CASE WHEN l_linestatus = 'F'
             |    THEN CAST(l_quantity AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS qty_f,
             |  CAST(round(sum(CASE WHEN l_linestatus = 'O'
             |    THEN CAST(l_quantity AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS qty_o
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // HLL++ sketch vs exact distinct: the oracle can't reproduce the
    // sketch estimate, so the query emits the SELF-VALIDATING form —
    // the exact count plus a within-5% flag computed from the sketch.
    // DuckDB recomputes the exact count and pins the flag TRUE: the row
    // goes red if the sketch ever drifts out of tolerance. (The sketch
    // is the 100-TB path: fixed memory per group vs the exact
    // expand+two-phase distinct.)
    Q("agg_approx_distinct",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
        .select(col("l_returnflag"), col("exact"),
          (abs(col("approx") - col("exact")) <= col("exact") * 0.05).as("within_5pct"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS exact,
             |       TRUE AS within_5pct
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Exact interpolated percentiles per group: Spark `percentile` and
    // DuckDB `quantile_cont` both sort and linearly interpolate at
    // rank p·(n−1), so the doubles agree at 6dp. (percentile_approx /
    // t-digest sketches are the 100-TB form; the exact agg is the
    // oracle-checkable one — it shuffles only per-group sorted values
    // and is fine to ~10⁸ rows per group.)
    Q("agg_quantiles",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.9), lit(0.99))).as("qs"))
        .select(col("l_returnflag"), posexplode(col("qs")).as(Seq("pos", "qv")))
        .select(col("l_returnflag"), col("pos").cast("long").as("pos"),
          round(col("qv"), 6).as("qv"))
        .orderBy("l_returnflag", "pos"),
      Some("""WITH q AS (SELECT l_returnflag,
             |  quantile_cont(l_quantity, [0.25, 0.5, 0.75, 0.9, 0.99]) AS qs
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, CAST(u.i AS BIGINT) AS pos, round(qs[u.i + 1], 6) AS qv
             |FROM q, LATERAL (SELECT unnest(range(5)) AS i) u
             |ORDER BY l_returnflag, pos""".stripMargin)),

    // The quantile SKETCH (percentile_approx, GK-style, accuracy 1e4)
    // self-validated the agg_approx_distinct way: a sketch estimate is
    // not oracle-reproducible, so the hash surface is two THEOREMS
    // checked in rank space — (1) the returned value's rank interval
    // [count(x<v)/n, count(x≤v)/n] must contain p within the sketch's
    // ε=1/accuracy guarantee (+1% slack), (2) a GK sketch returns an
    // OBSERVED value, never an interpolation. DuckDB recomputes n and
    // pins both flags TRUE; sketch drift turns the row red. This is
    // the proof behind agg_quantiles' "sketch is the 100-TB form"
    // claim: one fixed-memory pass vs the exact per-group sort. (The
    // rank-validation join is the honesty harness, not the production
    // path — it broadcasts 3·|groups| rows back over one more scan.)
    Q("agg_approx_quantiles",
      (s, dir) => {
        val ps = Seq(0.5, 0.9, 0.99)
        val li = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("g"), col("l_quantity").cast("double").as("x"))
        val ap = li.groupBy("g")
          .agg(percentile_approx(col("x"),
              array(ps.map(lit): _*), lit(10000)).as("avs"),
            count(lit(1)).as("n"))
          .select(col("g"), col("n"), posexplode(col("avs")).as(Seq("pi", "av")))
          .select(col("g"), col("n"),
            element_at(typedLit(ps), col("pi") + 1).as("p"), col("av"))
        ap.join(li, Seq("g"))
          .groupBy("g", "p", "n", "av")
          .agg(sum(when(col("x") < col("av"), 1L).otherwise(0L)).as("__lo"),
            sum(when(col("x") <= col("av"), 1L).otherwise(0L)).as("__hi"),
            max(when(col("x") === col("av"), true).otherwise(false)).as("member_ok"))
          .select(col("g"), col("p"), col("n"),
            (col("p") >= col("__lo").cast("double") / col("n") - 0.0101 &&
              col("p") <= col("__hi").cast("double") / col("n") + 0.0101)
              .as("rank_ok"),
            col("member_ok"))
          .orderBy("g", "p")
      },
      Some("""SELECT l_returnflag AS g, CAST(p.p AS DOUBLE) AS p,
             |       count(*) AS n, TRUE AS rank_ok, TRUE AS member_ok
             |FROM lineitem, (SELECT unnest([0.5, 0.9, 0.99]) AS p) p
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Analytic window: running quantity per supplier over a unique order
    // The synthetic lineitem does NOT have unique (l_orderkey,
    // l_linenumber) (≈118k dup pairs at sf0.1), so l_quantity is the
    // final ORDER BY tie-breaker: rows still tied are then identical in
    // every summed column, making each running prefix
    // permutation-invariant — without it the cumulative sum is
    // engine-dependent at scale factors where the dups appear.
    Q("win_running_sum",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"))
          .rowsBetween(Long.MinValue, 0)
        Tables.lineitem(s, dir)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            round(sum(col("l_quantity")).over(w), 4).as("running_qty"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  round(sum(l_quantity) OVER (PARTITION BY l_suppkey
             |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             |    ROWS UNBOUNDED PRECEDING),4) AS running_qty
             |FROM lineitem
             |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin)),

    // lag/lead/ntile analytic windows over the per-user event sequence
    // (event_id is unique within a user → tie-free ordering)
    // Rolling per-series statistics over the trailing 5-event frame —
    // the classic smoothing/outlier-context operator. Both engines
    // accumulate the SAME ordered frame, so the float sums agree and
    // the rows hash-match at 6dp.
    // Time-RANGE window frame: trailing 1-hour per-user stats keyed on
    // EVENT TIME, not row position — rangeBetween over epoch seconds,
    // so same-second events are peers on both engines. The row-frame
    // twin is win_rolling_stats.
    Q("win_time_range",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_s"))
          .rangeBetween(-3599L, 0L)
        Tables.events(s, dir).na.drop(Seq("value"))
          .select(col("user_id"), col("event_id"),
            unix_timestamp(col("ts")).as("ts_s"), col("value"))
          .select(col("user_id"), col("event_id"),
            count(lit(1)).over(w).as("n_1h"),
            round(sum(col("value")).over(w), 6).as("sum_1h"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |  count(*) OVER w AS n_1h,
             |  round(sum(value) OVER w, 6) AS sum_1h
             |FROM (SELECT user_id, event_id, value,
             |        CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
             |      FROM events WHERE value IS NOT NULL)
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
             |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),

    Q("win_rolling_stats",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(-4, 0)
        Tables.events(s, dir).na.drop(Seq("value"))
          .select(col("user_id"), col("event_id"),
            round(avg(col("value")).over(w), 6).as("ma5"),
            round(min(col("value")).over(w), 6).as("min5"),
            round(max(col("value")).over(w), 6).as("max5"),
            count(lit(1)).over(w).as("n5"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |  round(avg(value) OVER w, 6) AS ma5,
             |  round(min(value) OVER w, 6) AS min5,
             |  round(max(value) OVER w, 6) AS max5,
             |  count(*) OVER w AS n5
             |FROM events WHERE value IS NOT NULL
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),

    Q("win_lag_lead",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("event_id"))
        Tables.events(s, dir).na.drop(Seq("value"))
          .select(col("user_id"), col("event_id"),
            round(col("value") - lag(col("value"), 1).over(w), 6).as("delta_prev"),
            round(lead(col("value"), 1).over(w) - col("value"), 6).as("delta_next"),
            ntile(4).over(w).cast("long").as("quartile"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |  round(value - lag(value) OVER w, 6) AS delta_prev,
             |  round(lead(value) OVER w - value, 6) AS delta_next,
             |  ntile(4) OVER w AS quartile
             |FROM events WHERE value IS NOT NULL
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
             |ORDER BY user_id, event_id""".stripMargin)),

    // TPC-H Q6-shaped forecasting-revenue filter+agg: every predicate
    // reaches the parquet scan (PushedFilters), 4 columns read
    Q("q6_forecast_revenue",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount").between(0.03, 0.07)
          && col("l_quantity") < 24)
        .agg(sum2(money(col("l_extendedprice")) * factor(col("l_discount"))).as("revenue"),
          count(lit(1)).as("n")),
      Some("""SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))),2) AS DOUBLE) AS revenue,
             |       count(*) AS n
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // Two-phase salted aggregation (skew mitigation; identical result
    // to the plain GROUP BY, which is the oracle)
    Q("agg_salted_sum",
      (s, dir) => graft.ops.SkewOps.saltedSumCount(
          Tables.lineitem(s, dir), Seq("l_returnflag"),
          money(col("l_quantity")), col("l_orderkey"), 16)
        .select(col("l_returnflag"),
          round(col("sum_v"), 2).cast("double").as("sum_qty"), col("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_qty,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Global top-k on stored values (exact comparison, unique tiebreak)
    Q("topk_orders",
      (s, dir) => Tables.orders(s, dir)
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // Set ops: customers in BUILDING segment vs customers with open orders
    Q("set_ops_customers",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        val seg = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
        val open = o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("c_custkey")).distinct()
        val inter = seg.intersect(open).agg(count(lit(1)).as("n"))
          .select(lit("both").as("which"), col("n"))
        val exc = seg.except(open).agg(count(lit(1)).as("n"))
          .select(lit("seg_only").as("which"), col("n"))
        inter.unionAll(exc).orderBy("which")
      },
      Some("""SELECT 'both' AS which, count(*) AS n FROM (
             |  SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING'
             |  INTERSECT
             |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus='O')
             |UNION ALL
             |SELECT 'seg_only' AS which, count(*) AS n FROM (
             |  SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING'
             |  EXCEPT
             |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus='O')
             |ORDER BY which""".stripMargin)),

    // Market-basket affinity over lineitem baskets (round 10, [EXT]):
    // support/confidence/lift per co-purchased part pair, mega-basket
    // guard, top-100 under a total (lift desc, keys) order. One
    // basket-key shuffle; the pair table is the only quadratic object
    // and is bounded by Σ|basket|² under the guard.
    Q("join_basket_lift",
      (s, dir) => graft.ops.Basket.liftPairs(Tables.lineitem(s, dir),
          "l_orderkey", "l_partkey", 2)
        .orderBy(col("lift").desc, col("item_a"), col("item_b"))
        .limit(100),
      Some("""WITH p AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
             |          FROM lineitem
             |          WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
             |sz AS (SELECT b FROM p GROUP BY b HAVING count(*) <= 1000),
             |f AS (SELECT p.b, p.i FROM p JOIN sz USING (b)),
             |n AS (SELECT count(DISTINCT b) AS nb FROM f),
             |m AS (SELECT i, count(*) AS c FROM f GROUP BY i),
             |pr AS (SELECT x.i AS item_a, y.i AS item_b, count(*) AS n_ab
             |       FROM f x JOIN f y ON x.b = y.b AND x.i < y.i
             |       GROUP BY 1, 2 HAVING count(*) >= 2)
             |SELECT item_a, item_b, n_ab,
             |  floor(CAST(n_ab AS DOUBLE) * nb / (ma.c * mb.c) * 1e6 + 0.5)
             |    / 1e6 AS lift,
             |  floor(CAST(n_ab AS DOUBLE) / ma.c * 1e6 + 0.5) / 1e6 AS conf_a_b
             |FROM pr JOIN m ma ON ma.i = pr.item_a
             |  JOIN m mb ON mb.i = pr.item_b CROSS JOIN n
             |ORDER BY lift DESC, item_a, item_b LIMIT 100""".stripMargin)),

    // Blocked entity resolution over the part catalog (round 10,
    // [EXT]): candidates within (brand, size) blocks, match =
    // levenshtein(name) ≤ 2 with Spark's bounded early-exit,
    // transitive closure through the shared CC engine, canonical
    // entity = min member key, every row assigned (singletons label
    // themselves). The oracle closes the same match graph with a
    // recursive CTE — an independent closure implementation, so the
    // blocking, the distance predicate, and the closure are all
    // cross-checked, not just the group counts.
    Q("er_part_entities",
      (s, dir) => graft.ops.EntityRes.resolve(Tables.part(s, dir),
          "p_partkey", "p_name", Seq("p_brand", "p_size"), 2)
        .groupBy(col("entity_id"))
        .agg(count(lit(1)).as("n_members"),
          countDistinct(col("p_name")).as("n_names"),
          min_by(col("p_name"), col("p_partkey")).as("rep_name"))
        .withColumn("merged", col("n_members") >= 2)
        .orderBy("entity_id"),
      Some("""WITH RECURSIVE cand AS (
             |  SELECT a.p_partkey AS ida, b.p_partkey AS idb
             |  FROM part a JOIN part b
             |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
             |    AND a.p_partkey < b.p_partkey
             |    AND levenshtein(a.p_name, b.p_name) <= 2),
             |edges AS (SELECT ida AS a, idb AS b FROM cand
             |          UNION ALL SELECT idb, ida FROM cand),
             |reach AS (SELECT a AS id, b AS r FROM edges
             |          UNION
             |          SELECT rc.id, e.b FROM reach rc JOIN edges e ON rc.r = e.a),
             |lab AS (SELECT id, min(r) AS m FROM reach GROUP BY id),
             |asg AS (SELECT p.p_partkey, p.p_name,
             |          coalesce(least(l.m, l.id), p.p_partkey) AS entity_id
             |        FROM part p LEFT JOIN lab l ON l.id = p.p_partkey)
             |SELECT entity_id, count(*) AS n_members,
             |  count(DISTINCT p_name) AS n_names,
             |  arg_min(p_name, p_partkey) AS rep_name,
             |  count(*) >= 2 AS merged
             |FROM asg GROUP BY entity_id ORDER BY entity_id""".stripMargin))
  )
}
