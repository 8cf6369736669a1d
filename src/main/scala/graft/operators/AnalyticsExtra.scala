package graft.operators

import graft.core.{Stab, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Three analytics plan shapes the relational core didn't exercise
  * yet: a RANGE-frame sliding window (`events_rolling`), grouping
  * sets via ROLLUP (`q1_rollup`), and a fixed-column PIVOT
  * (`pivot_lang`). Each is a capability checkbox a user of a general
  * query engine expects, each oracled hash-exact.
  */
object AnalyticsExtra {

  /** `events_rolling`: 7-day moving event volume per type — the
    * RANGE window frame (value-based, not row-based: a missing day
    * must NOT stretch the window to 7 observed rows). Daily counts
    * first (one partial-agged shuffle onto the tiny type×day frame),
    * then the window runs over that aggregated frame — never over
    * raw events; the moving average is exact integer sum·1e6 `div`
    * row-count (both sums bounded by the frame, no overflow
    * exposure). Day index = epoch-days of the UTC-truncated
    * timestamp, integer in both engines. */
  def eventsRolling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .withColumn("epoch_s", unix_timestamp(date_trunc("day", $"ts")))
      .select($"event_type", expr("epoch_s div 86400").as("day_idx"))
      .groupBy($"event_type", $"day_idx")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"day_idx")
      .rangeBetween(-6, 0)
    daily
      .withColumn("roll_n", sum($"n").over(w))
      .withColumn("roll_days", count(lit(1)).over(w))
      .select($"event_type", $"day_idx", $"n", $"roll_n", $"roll_days",
        expr("roll_n * 1000000 div roll_days").as("roll_avg_e6"))
      .orderBy($"event_type", $"day_idx")
  }

  val eventsRollingSql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day_idx,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day_idx, n,
      |  CAST(sum(n) OVER w AS BIGINT) AS roll_n,
      |  CAST(count(*) OVER w AS BIGINT) AS roll_days,
      |  CAST((CAST(sum(n) OVER w AS BIGINT) * 1000000)
      |    // (CAST(count(*) OVER w AS BIGINT)) AS BIGINT) AS roll_avg_e6
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
      |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, day_idx""".stripMargin

  /** `q1_rollup`: the Q1 aggregate re-grouped through
    * `ROLLUP(returnflag, linestatus)` — per-pair, per-flag subtotal,
    * and grand total in ONE pass (Spark expands grouping sets inside
    * a single partial-agged aggregation; three separate GROUP BYs
    * would scan three times). `grouping_id()` disambiguates the
    * levels with the same bit encoding both engines use (rightmost
    * column = LSB); NULL group keys surface as the '(all)' sentinel
    * so the oracle never compares NULL orderings. */
  def q1Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        Stab.e2(sum($"l_quantity")).as("sum_qty_e2"),
        grouping_id().cast(LongType).as("gid"))
      .select(
        coalesce($"l_returnflag", lit("(all)")).as("returnflag"),
        coalesce($"l_linestatus", lit("(all)")).as("linestatus"),
        $"gid", $"n", $"sum_qty_e2")
      .orderBy($"gid", $"returnflag", $"linestatus")
  }

  val q1RollupSql: String =
    s"""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
       |  coalesce(l_linestatus, '(all)') AS linestatus,
       |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       |  count(*) AS n,
       |  ${Stab.sqlE2("sum(l_quantity)")} AS sum_qty_e2
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY gid, returnflag, linestatus""".stripMargin

  /** The corpus language codes, pinned (an inferred pivot would run a
    * distinct-scan job just to learn column names, and a new language
    * appearing at a bigger SF would silently change the SCHEMA —
    * pinned columns keep the contract stable and the plan one pass). */
  private val langs = Seq("de", "en", "es", "fr", "zh")

  /** `pivot_lang`: documents cross-tabulated source × language — the
    * PIVOT surface, planned as one partial-agged aggregation with
    * map-side conditional counting (each `n_<lang>` is a `when`
    * inside the same shuffle; missing cells coalesce to 0). */
  def pivotLang(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counted = Tables.documents(spark, dir)
      .groupBy($"source").pivot("lang", langs).count()
    val cols = Seq($"source") ++
      langs.map(l => coalesce(col(l), lit(0L)).as(s"n_$l"))
    counted.select(cols: _*)
      .withColumn("n_total", langs.map(l => col(s"n_$l")).reduce(_ + _))
      .orderBy($"source")
  }

  val pivotLangSql: String = {
    val cells = langs.map(l =>
      s"count(*) FILTER (lang = '$l') AS n_$l").mkString(",\n  ")
    // n_total = the pinned cells' sum in BOTH engines (a count(*)
    // would silently diverge if an unpinned language ever appears)
    val names = langs.map(l => s"n_$l").mkString(", ")
    val total = langs.map(l => s"n_$l").mkString(" + ")
    s"""SELECT source, $names, $total AS n_total
       |FROM (SELECT source,
       |  $cells
       |FROM documents GROUP BY source)
       |ORDER BY source""".stripMargin
  }
}
