package graft.operators

import graft.core.{Stab, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational / analytics core: the generic query-engine surface the
  * vector ops compose with, and the bench headliners.
  *
  * Scale notes (100 TB):
  *  - dims (`customer`, `nation`, `region`, `part`) are broadcast —
  *    the fact table never shuffles to meet them;
  *  - aggregations are partial-agg shapes (map-side combine);
  *  - the date/segment filters sit directly on the scans so Parquet
  *    sees them as `PushedFilters`.
  */
object Relational {

  /** TPC-H Q1-style pricing summary. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        Stab.e2(sum($"l_quantity")).as("sum_qty"),
        Stab.e2(sum($"l_extendedprice")).as("sum_base_price"),
        Stab.e2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_price"),
        Stab.e2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))).as("sum_charge"),
        Stab.e6(avg($"l_quantity")).as("avg_qty"),
        Stab.e6(avg($"l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Stab.sqlE2("sum(l_quantity)")} AS sum_qty,
       |  ${Stab.sqlE2("sum(l_extendedprice)")} AS sum_base_price,
       |  ${Stab.sqlE2("sum(l_extendedprice * (1.0 - l_discount))")} AS sum_disc_price,
       |  ${Stab.sqlE2("sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax))")} AS sum_charge,
       |  ${Stab.sqlE6("avg(l_quantity)")} AS avg_qty,
       |  ${Stab.sqlE6("avg(l_discount)")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: revenue of BUILDING-segment orders, top 10.
    * `customer` is the only broadcast side — `orders` is fact-sized
    * (scales with SF), so lineitem ⋈ orders is a shuffle join on the
    * order key; broadcasting it would OOM at 100 TB. Ordering happens
    * on the stabilized revenue so the top-10 cut is
    * engine-independent. */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" > lit("1996-01-01").cast("timestamp"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(Stab.e2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_e2"))
      .select($"o_orderkey", unix_timestamp($"o_orderdate").as("o_orderdate_epoch"),
        $"o_orderpriority", $"revenue_e2")
      .orderBy($"revenue_e2".desc, $"o_orderkey".asc)
      .limit(10)
  }

  val q3JoinSql: String =
    s"""SELECT o_orderkey, CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_epoch,
       |  o_orderpriority,
       |  ${Stab.sqlE2("sum(l_extendedprice * (1.0 - l_discount))")} AS revenue_e2
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate > TIMESTAMP '1996-01-01'
       |GROUP BY o_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue_e2 DESC, o_orderkey ASC
       |LIMIT 10""".stripMargin

  /** TPC-H Q5-style: revenue by nation for one region/date window,
    * 5-way star join. Only the true dims (customer/nation/region,
    * supplier) broadcast; lineitem ⋈ orders is a shuffle join on the
    * order key because both sides are fact-sized. */
  def q5Join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dims = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, dir).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey", $"c_nationkey", $"n_name")
    val sup = Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    Tables.lineitem(spark, dir)
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(dims), $"o_custkey" === $"c_custkey")
      .join(broadcast(sup),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .groupBy($"n_name")
      .agg(Stab.e2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_e2"))
      .orderBy($"revenue_e2".desc, $"n_name".asc)
  }

  val q5JoinSql: String =
    s"""SELECT n_name,
       |  ${Stab.sqlE2("sum(l_extendedprice * (1.0 - l_discount))")} AS revenue_e2
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name
       |ORDER BY revenue_e2 DESC, n_name ASC""".stripMargin

  /** Top-3 parts by retail price per brand. Spark ≥3.5 rewrites the
    * `row_number <= k` filter into a WindowGroupLimit so each
    * partition keeps only k rows before the shuffle. */
  def windowTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"p_brand")
      .orderBy($"p_retailprice".desc, $"p_partkey".asc)
    Tables.part(spark, dir)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"p_brand", $"rank", $"p_partkey", Stab.e2($"p_retailprice").as("price_e2"))
      .orderBy($"p_brand", $"rank")
  }

  val windowTopKSql: String =
    s"""SELECT p_brand, rank, p_partkey, ${Stab.sqlE2("p_retailprice")} AS price_e2
       |FROM (
       |  SELECT p_brand, p_partkey, p_retailprice,
       |    row_number() OVER (PARTITION BY p_brand
       |                       ORDER BY p_retailprice DESC, p_partkey ASC) AS rank
       |  FROM part) t
       |WHERE rank <= 3
       |ORDER BY p_brand, rank""".stripMargin

  /** TPC-H Q6-style forecasting-revenue filter: the pure
    * SCAN-PUSHDOWN showcase — a tight conjunctive predicate (date
    * range, discount band, quantity cap) reduced to one revenue
    * number with NO join and NO groupBy key. At 100 TB this query is
    * won or lost entirely at the parquet scan: every predicate must
    * reach `PushedFilters` (row-group pruning does the rest) and only
    * two columns may survive pruning into the product. The spec
    * asserts both plan properties; revenue follows q1's e2-stabilized
    * float-sum convention. */
  def q6Filter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-01-01").cast("timestamp") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
        $"l_quantity" < 24)
      .agg(Stab.e2(sum($"l_extendedprice" * $"l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q6FilterSql: String =
    s"""SELECT ${Stab.sqlE2("sum(l_extendedprice * l_discount)")} AS revenue,
       |  count(*) AS n_rows
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
       |  AND l_shipdate < TIMESTAMP '1996-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q7-style volume shipping: revenue flowing between two
    * nations per year, counted in BOTH directions (supplier in A →
    * customer in B, and the reverse). Exercises the dual-role dim
    * join — `nation` enters the plan twice under different keys —
    * plus a fact-fact shuffle join and a conditional pair filter.
    * Dims (supplier⋈nation, customer⋈nation) broadcast; lineitem ⋈
    * orders shuffles on the order key as in q3/q5 (both fact-sized —
    * broadcasting either would OOM at 100 TB). */
  def q7Join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (na, nb) = ("NATION_1", "NATION_2")
    val supp = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
      .filter($"supp_nation".isin(na, nb))
    val cust = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
      .filter($"cust_nation".isin(na, nb))
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
        $"l_shipdate" <= lit("1996-12-31").cast("timestamp"))
    li.join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .filter(($"supp_nation" === na && $"cust_nation" === nb) ||
        ($"supp_nation" === nb && $"cust_nation" === na))
      .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").cast("long").as("l_year"))
      .agg(Stab.e2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_e2"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  val q7JoinSql: String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |  ${Stab.sqlE2("sum(volume)")} AS revenue_e2
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
       |    l_extendedprice * (1.0 - l_discount) AS volume
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       |    AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
       |) shipping
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Tumbling 1-hour windowed aggregation over the event stream
    * (batch twin of streaming.EventStream — same logical op). */
  def eventsWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        Stab.e2(sum($"value")).as("sum_value_e2"),
        Stab.e6(avg($"value")).as("avg_value_e6"))
      .select(unix_timestamp($"hour").as("hour_epoch"), $"event_type",
        $"n_events", $"sum_value_e2", $"avg_value_e6")
      .orderBy($"hour_epoch", $"event_type")
  }

  val eventsWindowAggSql: String =
    s"""SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
       |  event_type, count(*) AS n_events,
       |  ${Stab.sqlE2("sum(value)")} AS sum_value_e2,
       |  ${Stab.sqlE6("avg(value)")} AS avg_value_e6
       |FROM events
       |GROUP BY date_trunc('hour', ts), event_type
       |ORDER BY hour_epoch, event_type""".stripMargin

  /** Gap-based sessionization (30-min inactivity closes a session):
    * lag → new-session flag → cumulative sum = session id, then one
    * row per session. Two window passes over the same
    * (user_id, ts) partitioning — a single shuffle, reused. */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800L, 1L).otherwise(0L))
      .withColumn("session_seq", sum($"new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_seq")
      .agg(min(unix_timestamp($"ts")).as("session_start_epoch"),
        max(unix_timestamp($"ts")).as("session_end_epoch"),
        count(lit(1)).as("n_events"),
        Stab.e2(sum($"value")).as("sum_value_e2"))
      .orderBy($"user_id", $"session_seq")
  }

  /** `events_funnel`: ordered-sequence funnel — per user, the
    * earliest time each stage of signup → view → click → purchase was
    * reached IN ORDER (stage k counts only events strictly after that
    * user's stage-k−1 time). One output row per (user, reached
    * stage).
    *
    * Scale shape: stage-by-stage, NOT a per-user event-sequence
    * window — each stage is one filtered scan of the stream
    * aggregated by user, semi-joined against the previous stage's
    * (user, t) frame (≤ one row per user, shrinking monotonically
    * down the funnel, checkpointed so stage k never re-runs stages
    * 0..k−1). No collect_list of per-user histories, no window over
    * the whole stream — the event scan stays map-side filtered and
    * the only shuffles are the per-stage user aggregations. */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val stages = Seq("signup", "view", "click", "purchase")
    var prev: DataFrame = null
    val perStage = stages.zipWithIndex.map { case (st, i) =>
      val reached =
        (if (i == 0)
          ev.filter($"event_type" === st).groupBy($"user_id").agg(min($"ts").as("t"))
        else
          ev.filter($"event_type" === st)
            .join(prev.select($"user_id", $"t".as("t_prev")), Seq("user_id"))
            .filter($"ts" > $"t_prev")
            .groupBy($"user_id").agg(min($"ts").as("t"))
        ).localCheckpoint(true)
      prev = reached
      reached.select($"user_id", lit(i.toLong).as("stage_idx"),
        lit(st).as("stage"), unix_timestamp($"t").as("t_epoch"))
    }
    perStage.reduce(_ unionByName _).orderBy($"stage_idx", $"user_id")
  }

  val eventsFunnelSql: String =
    """WITH s0 AS (SELECT user_id, min(ts) AS t FROM events
      |            WHERE event_type = 'signup' GROUP BY user_id),
      |s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |       JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.t
      |       WHERE e.event_type = 'view' GROUP BY e.user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
      |       WHERE e.event_type = 'click' GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
      |       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      |SELECT user_id, CAST(0 AS BIGINT) AS stage_idx, 'signup' AS stage,
      |  CAST(FLOOR(epoch(t)) AS BIGINT) AS t_epoch FROM s0
      |UNION ALL SELECT user_id, 1, 'view', CAST(FLOOR(epoch(t)) AS BIGINT) FROM s1
      |UNION ALL SELECT user_id, 2, 'click', CAST(FLOOR(epoch(t)) AS BIGINT) FROM s2
      |UNION ALL SELECT user_id, 3, 'purchase', CAST(FLOOR(epoch(t)) AS BIGINT) FROM s3
      |ORDER BY stage_idx, user_id""".stripMargin

  /** `events_retention`: cohort retention matrix — users grouped by
    * their signup day, counted as active for each later day they
    * produced ANY event (pre-signup activity excluded). Dates cross
    * the oracle boundary as `yyyy-MM-dd` strings so no timezone
    * convention can skew the hash.
    *
    * Scale shape: two user-keyed aggregations (first-signup, distinct
    * active days — both map-side partial) and one join on user_id;
    * the matrix aggregation keys on (cohort_day, offset) — tiny. No
    * window, no per-user history materialization. */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val cohort = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min(to_date($"ts")).as("cohort_day"))
    val active = ev.select($"user_id", to_date($"ts").as("day")).distinct()
    active.join(cohort, Seq("user_id"))
      .filter($"day" >= $"cohort_day")
      .groupBy($"cohort_day", datediff($"day", $"cohort_day").cast("long").as("day_offset"))
      .agg(countDistinct($"user_id").as("n_active"))
      .select(date_format($"cohort_day", "yyyy-MM-dd").as("cohort_day"),
        $"day_offset", $"n_active")
      .orderBy($"cohort_day", $"day_offset")
  }

  val eventsRetentionSql: String =
    """WITH cohort AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id
      |), active AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |)
      |SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
      |  CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
      |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
      |FROM active a JOIN cohort c ON a.user_id = c.user_id
      |WHERE a.day >= c.cohort_day
      |GROUP BY c.cohort_day, day_offset
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** `events_approx_users`: distinct-user counts per event type via
    * the HLL++ sketch (`approx_count_distinct`, rsd 2%) with an
    * IN-PLAN error attestation against the exact count — the sketch
    * is the 100 TB tool (mergeable, fixed memory, one pass, no
    * distinct shuffle); the exact count here exists to hold the
    * sketch accountable, and the oracle pins the exact value plus the
    * attestation flag, so a sketch drifting past ±5% flips the hash.
    * At scale the exact leg is dropped and the sketch stands alone —
    * this entry is the measured evidence it can. */
  def eventsApproxUsers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_users"),
        approx_count_distinct($"user_id", 0.02).as("approx_users"))
      .select($"event_type", $"exact_users",
        (abs($"approx_users" - $"exact_users") <=
          $"exact_users" * 0.05).as("sketch_within_5pct"))
      .orderBy($"event_type")
  }

  val eventsApproxUsersSql: String =
    """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  true AS sketch_within_5pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** `events_asof`: as-of join — each purchase event joined to the
    * same user's most recent view event AT OR BEFORE its timestamp
    * (left: purchases with no prior view keep nulls). The canonical
    * time-series operator Spark has no native join type for.
    *
    * Spark-first shape: NOT an inequality join (a range join explodes
    * to |views|×|purchases| per user before picking the max) and not
    * a per-key loop — both sides UNION into one stream, ONE shuffle
    * on user_id, and a single carry-forward window (`last` ignoring
    * nulls over rows-unbounded-preceding) attaches the latest view
    * struct to every purchase row in linear time. Views sort before
    * purchases at equal timestamps (side 0 < 1), giving exact
    * at-or-before semantics. At 100 TB: linear in events, partial
    * per-user state, the same single-shuffle shape as sessionize.
    *
    * The DuckDB oracle is the engine's NATIVE `ASOF LEFT JOIN` —
    * deterministic here because (user_id, ts) is unique in the
    * corpus (checked at all SFs), so two independent formulations of
    * the semantics hash-match. */
  def eventsAsof(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val vStructType = "struct<v_ts:timestamp,v_id:bigint>"
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts", lit(0L).as("side"), $"event_id",
        lit(null).cast("double").as("value"),
        struct($"ts".as("v_ts"), $"event_id".as("v_id")).as("v"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", lit(1L).as("side"), $"event_id",
        $"value", lit(null).cast(vStructType).as("v"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"side".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(purchases)
      .withColumn("lastv", last($"v", ignoreNulls = true).over(w))
      .filter($"side" === 1L)
      .select($"event_id", $"user_id",
        unix_timestamp($"ts").as("purchase_epoch"),
        Stab.e2($"value").as("value_e2"),
        $"lastv.v_id".as("view_event_id"),
        unix_timestamp($"lastv.v_ts").as("view_epoch"),
        (unix_timestamp($"ts") - unix_timestamp($"lastv.v_ts")).as("gap_s"))
      .orderBy($"event_id")
  }

  val eventsAsofSql: String =
    s"""WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
       |v AS (SELECT * FROM events WHERE event_type = 'view')
       |SELECT p.event_id, p.user_id,
       |  CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
       |  ${Stab.sqlE2("p.value")} AS value_e2,
       |  v.event_id AS view_event_id,
       |  CAST(FLOOR(epoch(v.ts)) AS BIGINT) AS view_epoch,
       |  CAST(FLOOR(epoch(p.ts)) AS BIGINT) - CAST(FLOOR(epoch(v.ts)) AS BIGINT) AS gap_s
       |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
       |ORDER BY p.event_id""".stripMargin

  /** `events_anomaly`: daily-volume outlier detection — per
    * (event_type, day) count z-scored against that type's cross-day
    * distribution, flagged at |z| ≥ 2. The ops-analytics screen every
    * event pipeline keeps (ingestion spikes, drops, broken trackers).
    *
    * Cross-engine determinism: mean and variance come from INTEGER
    * aggregates only — n, Σc, Σc² (exact longs, order-free) — through
    * one fixed expression tree (`var = (Q − S²/n)/(n−1)`), so no
    * float aggregation order can differ; z is one division,
    * e6-stabilized, and the flag compares the e6 integer.
    *
    * Scale shape: two tiny partial-agged shuffles (day×type, then
    * type) and a broadcast join back — the corpus is scanned once. */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("c"))
    val stats = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"), sum($"c" * $"c").as("q"))
    val mean = $"s".cast("double") / $"n"
    val variance = ($"q".cast("double") - $"s".cast("double") * $"s" / $"n") / ($"n" - 1)
    daily.join(broadcast(stats), Seq("event_type"))
      .select($"event_type", $"day", $"c",
        Stab.e6(when($"n" > 1 && variance > 0,
          ($"c".cast("double") - mean) / sqrt(variance)).otherwise(0.0)).as("z_e6"))
      .withColumn("anomaly", abs($"z_e6") >= 2000000L)
      .orderBy($"event_type", $"day")
  }

  val eventsAnomalySql: String = {
    val mean = "CAST(s AS DOUBLE) / n"
    val variance = s"(CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)"
    s"""WITH daily AS (
       |  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2
       |), stats AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
       |  FROM daily GROUP BY event_type
       |)
       |SELECT d.event_type, d.day, d.c,
       |  ${Stab.sqlE6(s"CASE WHEN n > 1 AND $variance > 0 THEN (CAST(c AS DOUBLE) - $mean) / sqrt($variance) ELSE 0.0 END")} AS z_e6,
       |  abs(${Stab.sqlE6(s"CASE WHEN n > 1 AND $variance > 0 THEN (CAST(c AS DOUBLE) - $mean) / sqrt($variance) ELSE 0.0 END")}) >= 2000000 AS anomaly
       |FROM daily d JOIN stats USING (event_type)
       |ORDER BY event_type, day""".stripMargin
  }

  val eventsSessionizeSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, event_id, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR CAST(FLOOR(epoch(ts)) AS BIGINT)
       |              - CAST(FLOOR(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
       |), sessions AS (
       |  SELECT user_id, ts, value,
       |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
       |  FROM flagged
       |)
       |SELECT user_id, session_seq,
       |  min(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS session_start_epoch,
       |  max(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS session_end_epoch,
       |  count(*) AS n_events,
       |  ${Stab.sqlE2("sum(value)")} AS sum_value_e2
       |FROM sessions
       |GROUP BY user_id, session_seq
       |ORDER BY user_id, session_seq""".stripMargin

  /** TPC-H Q8-style market share: NATION_3 suppliers' share of PROMO
    * part revenue sold to EUROPE customers, per order year. The share
    * is computed from the two already-stabilized long sums by integer
    * floor division (share_e6 = num_e2·1e6 // den_e2) — no float
    * division crosses the oracle boundary.
    *
    * Scale shape: three broadcast dims (filtered part list, EUROPE
    * customer keys, supplier→nation map) reach the fact scan without
    * shuffling it; lineitem ⋈ orders is the one fact-fact shuffle
    * (both unboundable at 100 TB, as in q3/q5/q7); the conditional
    * share numerator is a map-side `when` inside the same partial
    * agg, not a second pass. Year-cardinality output. */
  def q8Mktshare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val promo = Tables.part(spark, dir)
      .filter($"p_type" === "PROMO").select($"p_partkey")
    val custEur = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, dir).filter($"r_name" === "EUROPE"),
        $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey")
    val suppNat = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey",
        year($"o_orderdate").cast("long").as("o_year"))
    val vol = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    Tables.lineitem(spark, dir)
      .join(broadcast(promo), $"l_partkey" === $"p_partkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(custEur), $"o_custkey" === $"c_custkey")
      .join(broadcast(suppNat), $"l_suppkey" === $"s_suppkey")
      .groupBy($"o_year")
      .agg(
        Stab.e2(sum(when($"supp_nation" === "NATION_3", vol)
          .otherwise(lit(0.0)))).as("nation_volume_e2"),
        Stab.e2(sum(vol)).as("total_volume_e2"))
      .select($"o_year", $"nation_volume_e2", $"total_volume_e2",
        // `div`, not `/`: long / long routes through DOUBLE and loses
        // integer precision once num_e2·1e6 passes 2^53 (sf ≳ 1)
        expr("nation_volume_e2 * 1000000L div total_volume_e2")
          .as("share_e6"))
      .orderBy($"o_year")
  }

  val q8MktshareSql: String =
    s"""WITH vols AS (
       |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       |    ${Stab.sqlE2("sum(CASE WHEN n.n_name = 'NATION_3' " +
         "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)")}
       |      AS nation_volume_e2,
       |    ${Stab.sqlE2("sum(l_extendedprice * (1.0 - l_discount))")}
       |      AS total_volume_e2
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN region ON cn.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n ON s_nationkey = n.n_nationkey
       |  WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
       |    AND o_orderdate >= TIMESTAMP '1995-01-01'
       |    AND o_orderdate < TIMESTAMP '1998-01-01'
       |  GROUP BY 1)
       |SELECT o_year, nation_volume_e2, total_volume_e2,
       |  nation_volume_e2 * 1000000 // total_volume_e2 AS share_e6
       |FROM vols ORDER BY o_year""".stripMargin

  /** TPC-H Q10-style returned-item report: the top-20 customers by
    * revenue lost to returns (`l_returnflag = 'R'`) for orders placed
    * in one quarter — the classic "who should account management call"
    * query. Returns ⋈ quarter-filtered orders is the fact-fact
    * shuffle; customer⋈nation broadcasts; the top-20 cut is a global
    * `orderBy · limit` with a deterministic (revenue, custkey)
    * tie-break — TakeOrderedAndProject, per-partition top-k then a
    * driver merge of 20-row heads, never a full sort at 100 TB. */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"n_name")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(Stab.e2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")))
        .as("lost_revenue_e2"))
      .orderBy($"lost_revenue_e2".desc, $"c_custkey".asc)
      .limit(20)
  }

  val q10ReturnsSql: String =
    s"""SELECT c_custkey, c_name, n_name,
       |  ${Stab.sqlE2("sum(l_extendedprice * (1.0 - l_discount))")}
       |    AS lost_revenue_e2
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1996-04-01'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY lost_revenue_e2 DESC, c_custkey ASC
       |LIMIT 20""".stripMargin

  /** TPC-H Q13-style customer order-count distribution: how many
    * customers placed exactly N non-urgent orders, including the
    * zero-order bucket — the classic outer-join + double-aggregation
    * shape. The join is customer LEFT OUTER orders on the customer
    * key with the priority exclusion in the join condition (NOT the
    * WHERE — a WHERE would turn the outer join inner and drop the
    * zero bucket). At 100 TB both sides are fact-sized so this is a
    * shuffle join on `custkey`; the first aggregation collapses to
    * customer cardinality and the second to distinct-count
    * cardinality, both partial-agged map-side. */
  def q13Custdist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .select($"o_custkey", $"o_orderkey")
    Tables.customer(spark, dir).select($"c_custkey")
      .join(ord, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q13CustdistSql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q18-style large-volume orders: the top-20 orders whose
    * total line quantity exceeds 250 units, with their customer — a
    * HAVING-filtered aggregation joined back to its dimensions. The
    * quantity rollup is ONE partial-agged shuffle on the order key;
    * the `> 250` cut happens before any join so only qualifying
    * orders (~1% of the table) meet `orders` ⋈ `customer`, and at
    * that cardinality the qualifying side broadcasts to the orders
    * scan rather than shuffling it. Top-20 is a deterministic
    * (quantity, orderkey) TakeOrderedAndProject. */
  def q18Bigorders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bigOrders = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(Stab.e2(sum($"l_quantity")).as("total_qty_e2"))
      .filter($"total_qty_e2" > 250L * 100L)
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val cust = Tables.customer(spark, dir).select($"c_custkey", $"c_name")
    bigOrders
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_custkey", $"c_name", $"o_orderdate",
        $"total_qty_e2")
      .orderBy($"total_qty_e2".desc, $"o_orderkey".asc)
      .limit(20)
  }

  val q18BigordersSql: String =
    s"""SELECT o_orderkey, c_custkey, c_name, o_orderdate, total_qty_e2
       |FROM (
       |  SELECT l_orderkey,
       |    ${Stab.sqlE2("sum(l_quantity)")} AS total_qty_e2
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING ${Stab.sqlE2("sum(l_quantity)")} > 25000)
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY total_qty_e2 DESC, o_orderkey ASC
       |LIMIT 20""".stripMargin

  /** TPC-H Q4-style order-priority check: orders from one half-year
    * with at least one returned line, counted per priority — the
    * canonical EXISTS shape, planned as a LEFT SEMI join so each
    * order matches AT MOST once (an inner join would double-count
    * multi-return orders, and at 100 TB would inflate the probe side
    * before the aggregation). The date filter reaches the orders scan
    * (PushedFilters) and the returnflag filter the lineitem scan, so
    * the semi-join meets two pre-shrunk sides on the order key. */
  def q4Priority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val returned = Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R").select($"l_orderkey")
    Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-07-01").cast("timestamp"))
      .join(returned, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q4PrioritySql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q22-style dormant high-balance customers: per market
    * segment, customers whose balance beats the positive-balance
    * average but who placed NO order in 1996 — the canonical
    * NOT-EXISTS (LEFT ANTI join) + scalar-aggregate-threshold shape.
    * The average is computed in CENTS as integer floor-division of
    * two exact longs (a float average differs between engines in
    * ulps, and a boundary balance would flip the cut), broadcast as
    * a one-row frame into the customer scan; the anti join's right
    * side is the date-pruned orders key set. Balance sums stay
    * integer cents end-to-end. */
  def q22Dormant(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment",
        Stab.e2($"c_acctbal").as("bal_e2"))
    val thresh = cust.filter($"bal_e2" > 0L)
      .agg(expr("sum(bal_e2) div count(1)").as("avg_bal_e2"))
    val ordered96 = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .select($"o_custkey")
    cust.crossJoin(broadcast(thresh))
      .filter($"bal_e2" > $"avg_bal_e2")
      .join(ordered96, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_custs"), sum($"bal_e2").as("total_bal_e2"))
      .orderBy($"c_mktsegment")
  }

  val q22DormantSql: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_mktsegment,
      |    CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS bal_e2
      |  FROM customer),
      |thresh AS (
      |  SELECT CAST(sum(bal_e2) AS BIGINT) // count(*) AS avg_bal_e2
      |  FROM cust WHERE bal_e2 > 0)
      |SELECT c_mktsegment, count(*) AS n_custs,
      |  CAST(sum(bal_e2) AS BIGINT) AS total_bal_e2
      |FROM cust CROSS JOIN thresh
      |WHERE bal_e2 > avg_bal_e2
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |                    AND o_orderdate < TIMESTAMP '1997-01-01')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** TPC-H Q14-style promo revenue share per ship month: the
    * conditional-aggregate ratio where numerator and denominator ride
    * the SAME partial-agged shuffle (a map-side `when` splits them —
    * two scans or two shuffles would double the cost at 100 TB).
    * `part` is the only broadcast side; the share is derived from the
    * two stabilized long sums by integer division (`div`, never
    * long/long through DOUBLE — q8's convention). */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir).select($"p_partkey", $"p_type")
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .groupBy(date_format($"l_shipdate", "yyyy-MM").as("ship_month"))
      .agg(
        Stab.e2(sum(when($"p_type" === "PROMO",
          $"l_extendedprice" * (lit(1.0) - $"l_discount")).otherwise(lit(0.0))))
          .as("promo_rev_e2"),
        Stab.e2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")))
          .as("total_rev_e2"))
      .select($"ship_month", $"promo_rev_e2", $"total_rev_e2",
        // decimal(38,0) before the ×1e6: LongType would silently wrap
        // past ~9.2e12 revenue cents while DuckDB promotes — the
        // dsir_importance overflow convention (share stays exact at
        // the 100 TB revenue volume this claims to serve)
        expr("cast(cast(promo_rev_e2 as decimal(38,0)) * 1000000" +
          " div total_rev_e2 as long)").as("promo_share_e6"))
      .orderBy($"ship_month")
  }

  val q14PromoSql: String =
    s"""SELECT ship_month, promo_rev_e2, total_rev_e2,
       |  CAST(CAST(promo_rev_e2 AS HUGEINT) * 1000000 // total_rev_e2 AS BIGINT) AS promo_share_e6
       |FROM (
       |  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       |    ${Stab.sqlE2("sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)")} AS promo_rev_e2,
       |    ${Stab.sqlE2("sum(l_extendedprice * (1.0 - l_discount))")} AS total_rev_e2
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1997-01-01'
       |  GROUP BY 1)
       |ORDER BY ship_month""".stripMargin

  /** TPC-H Q15-style top supplier: quarterly revenue per supplier,
    * then the supplier(s) achieving the MAXIMUM — the scalar-subquery
    * shape. The per-supplier rollup is one partial-agged shuffle onto
    * supplier cardinality; the max collapses that |supplier| frame to
    * ONE broadcast row joined back (never a global sort, never a
    * second lineitem scan); `supplier` broadcasts for the name. Ties
    * on the max all surface, ordered by key — deterministic without a
    * tie-break cut. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(Stab.e2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")))
        .as("total_revenue_e2"))
    val mx = rev.agg(max($"total_revenue_e2").as("max_revenue_e2"))
    val sup = Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")
    rev.crossJoin(broadcast(mx))
      .filter($"total_revenue_e2" === $"max_revenue_e2")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue_e2")
      .orderBy($"s_suppkey")
  }

  val q15TopSupplierSql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |    ${Stab.sqlE2("sum(l_extendedprice * (1.0 - l_discount))")} AS total_revenue_e2
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue_e2
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_revenue_e2 = (SELECT max(total_revenue_e2) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17-style small-quantity revenue: lineitems of one brand's
    * parts whose quantity is under 20% of that PART's average — the
    * correlated-aggregate-threshold shape. The correlation never
    * re-scans: the brand's part keys broadcast into the lineitem scan
    * (the scan shrinks ~1/|brands| BEFORE any aggregation), the
    * per-part average is a |brand parts|-sized rollup broadcast back,
    * and the 20% cut is exact integer cross-multiplication
    * (`qty_e2 * 5 < avg_qty_e2` — a float threshold would flip
    * boundary rows between engines). Averages floor-divide exact
    * longs, q22's convention. */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val brandParts = Tables.part(spark, dir)
      .filter($"p_brand" === "Brand#23").select($"p_partkey")
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(brandParts), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", Stab.e2($"l_quantity").as("qty_e2"),
        $"l_extendedprice")
    val avgQ = li.groupBy($"l_partkey")
      .agg(expr("sum(qty_e2) div count(1)").as("avg_qty_e2"))
    li.join(broadcast(avgQ), Seq("l_partkey"))
      .filter($"qty_e2" * lit(5L) < $"avg_qty_e2")
      .agg(count(lit(1)).as("n_small_lines"),
        Stab.e2(sum($"l_extendedprice")).as("total_price_e2"))
      .select($"n_small_lines", $"total_price_e2",
        expr("total_price_e2 div 7").as("avg_yearly_e2"))
  }

  val q17SmallQtySql: String =
    s"""WITH li AS (
       |  SELECT l_partkey,
       |    CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) AS qty_e2,
       |    l_extendedprice
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_brand = 'Brand#23'),
       |avgq AS (
       |  SELECT l_partkey, CAST(sum(qty_e2) AS BIGINT) // count(*) AS avg_qty_e2
       |  FROM li GROUP BY l_partkey)
       |SELECT count(*) AS n_small_lines,
       |  ${Stab.sqlE2("sum(l_extendedprice)")} AS total_price_e2,
       |  ${Stab.sqlE2("sum(l_extendedprice)")} // 7 AS avg_yearly_e2
       |FROM li JOIN avgq USING (l_partkey)
       |WHERE qty_e2 * 5 < avg_qty_e2""".stripMargin

  /** TPC-H Q19-style disjunctive-predicate revenue: three
    * (type, size-band, quantity-band) conjunctions OR'd inside the
    * part⋈lineitem broadcast join. The disjunction evaluates
    * map-side in the scan's codegen stage — rows failing all three
    * arms die before any shuffle, and the common `l_partkey =
    * p_partkey` conjunct still drives the hash join (an OR across
    * JOIN KEYS would degrade to a nested loop; an OR across FILTERS
    * does not). Quantities in the synthetic corpus are integral, so
    * the band bounds compare exactly in both engines. */
  def q19Disjunct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir).select($"p_partkey", $"p_type", $"p_size")
    Tables.lineitem(spark, dir)
      .join(broadcast(p), $"l_partkey" === $"p_partkey" && (
        ($"p_type" === "PROMO" && $"p_size".between(1, 15) &&
          $"l_quantity".between(1.0, 15.0)) ||
        ($"p_type" === "STANDARD" && $"p_size".between(10, 30) &&
          $"l_quantity".between(10.0, 30.0)) ||
        ($"p_type" === "LARGE" && $"p_size".between(20, 50) &&
          $"l_quantity".between(20.0, 50.0))))
      .agg(count(lit(1)).as("n_lines"),
        Stab.e2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")))
          .as("revenue_e2"))
  }

  val q19DisjunctSql: String =
    s"""SELECT count(*) AS n_lines,
       |  ${Stab.sqlE2("sum(l_extendedprice * (1.0 - l_discount))")} AS revenue_e2
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_type = 'PROMO' AND p_size BETWEEN 1 AND 15
       |        AND l_quantity BETWEEN 1 AND 15)
       |   OR (p_type = 'STANDARD' AND p_size BETWEEN 10 AND 30
       |        AND l_quantity BETWEEN 10 AND 30)
       |   OR (p_type = 'LARGE' AND p_size BETWEEN 20 AND 50
       |        AND l_quantity BETWEEN 20 AND 50)""".stripMargin
}
