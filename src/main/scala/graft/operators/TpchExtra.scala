package graft.operators

import graft.core.{Stab, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The remaining TPC-H plan shapes, adapted to the driver's schema
  * (TESTDATA.md has no `partsupp` table and `lineitem` carries no
  * shipmode/commitdate/receiptdate), completing the relational suite
  * started in [[Relational]]: Q2 (correlated per-group MIN joined
  * back), Q9 (multi-dim star with a computed profit measure rolled to
  * nation×year), Q11 (HAVING over a global scalar subquery), Q16
  * (count-distinct with a NOT-IN anti join), Q20 (nested dominance
  * semi-rollup) and Q21 (semi + anti SELF-join on the fact table).
  * Where the original predicate column is missing the adaptation
  * keeps the PLAN shape and swaps the predicate: `ps_supplycost` →
  * the observed min unit price from lineitem, `l_receiptdate >
  * l_commitdate` → `l_returnflag = 'R'`, `s_comment LIKE
  * '%Complaints%'` → `s_acctbal < 0`.
  *
  * Scale notes (100 TB) follow [[Relational]]'s conventions: true
  * dims broadcast, fact⋈fact shuffles ride the order key, measures
  * stabilize to integers before any cross-engine compare, and every
  * share/threshold compares by integer cross-multiplication (never
  * long/long through DOUBLE).
  */
object TpchExtra {

  /** TPC-H Q9-style profit by nation and year for one part family.
    * No `ps_supplycost` exists, so unit cost is proxied as 40% of
    * `p_retailprice` — the measure stays a per-row double expression
    * evaluated identically in both engines, then e2-stabilized after
    * the sum. Plan shape: the part filter broadcasts FIRST (the scan
    * shrinks to the 'red%' family before anything else), supplier ⋈
    * nation broadcasts for the grouping dim, and the only shuffle
    * join is lineitem ⋈ orders on the order key (both fact-sized; a
    * broadcast would OOM at 100 TB), feeding one partial-agged rollup
    * onto |nation|×|year| groups. */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir).filter($"p_name".like("red%"))
      .select($"p_partkey", $"p_retailprice")
    val supNation = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name")
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate")
    Tables.lineitem(spark, dir)
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(supNation), $"l_suppkey" === $"s_suppkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name", year($"o_orderdate").cast(LongType).as("o_year"))
      .agg(Stab.e2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") -
        $"l_quantity" * $"p_retailprice" * lit(0.4))).as("profit_e2"))
      .orderBy($"n_name", $"o_year".desc)
  }

  val q9ProfitSql: String =
    s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  ${Stab.sqlE2("sum(l_extendedprice * (1.0 - l_discount) - l_quantity * p_retailprice * 0.4)")} AS profit_e2
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_name LIKE 'red%'
       |GROUP BY n_name, o_year
       |ORDER BY n_name, o_year DESC""".stripMargin

  /** TPC-H Q11-style important-value parts: per-part revenue from ONE
    * region's suppliers (region, not nation: the sf0.001 corpus has
    * 10 suppliers over 25 nations, so a single-nation slice can be
    * EMPTY — a region covers ~1/5 of suppliers at every SF), kept
    * only where it exceeds 0.1% of that slice's total — the
    * HAVING-over-global-scalar shape. The rollup
    * is one partial-agged shuffle onto part cardinality; the total
    * COLLAPSES that frame to a single broadcast row (never a second
    * scan); the 0.1% cut cross-multiplies in decimal(38,0) (value_e2
    * × 1000 would wrap a long at ~9.2e15 revenue cents — real at
    * 100 TB — while DuckDB promotes; q14's overflow convention). The
    * total is an INTEGER sum of already-stabilized longs, so it is
    * exact in both engines by construction. */
  def q11Important(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sup = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), $"s_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, dir).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey")
    val value = Tables.lineitem(spark, dir)
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey".as("p_key"))
      .agg(Stab.e2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")))
        .as("value_e2"))
    val tot = value.agg(sum($"value_e2").as("total_e2"))
    value.crossJoin(broadcast(tot))
      .filter(expr("cast(value_e2 as decimal(38,0)) * 1000 > total_e2"))
      .select($"p_key", $"value_e2")
      .orderBy($"value_e2".desc, $"p_key")
  }

  val q11ImportantSql: String =
    s"""WITH val AS (
       |  SELECT l_partkey AS p_key,
       |    ${Stab.sqlE2("sum(l_extendedprice * (1.0 - l_discount))")} AS value_e2
       |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = 'ASIA'
       |  GROUP BY l_partkey),
       |tot AS (SELECT CAST(sum(value_e2) AS BIGINT) AS total_e2 FROM val)
       |SELECT p_key, value_e2 FROM val CROSS JOIN tot
       |WHERE CAST(value_e2 AS HUGEINT) * 1000 > total_e2
       |ORDER BY value_e2 DESC, p_key""".stripMargin

  /** TPC-H Q16-style supplier count per part descriptor: how many
    * distinct non-complaint suppliers ship each (type, size) family,
    * with `partsupp` reconstructed as the DISTINCT (partkey, suppkey)
    * pairs observed in lineitem and the comment-pattern complaint
    * filter proxied by a negative account balance. Plan shape: the
    * pair-distinct is the one fact-sized shuffle (two key columns
    * only — the projection prunes before it); the complaint set is a
    * tiny broadcast ANTI join (NOT IN with a non-nullable key); part
    * is the broadcast dim; the count-distinct rides a partial-agged
    * two-stage rollup onto the small descriptor space. */
  def q16SuppCnt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct()
    val p = Tables.part(spark, dir)
      .filter($"p_type" =!= "PROMO" &&
        $"p_size".isin(5, 15, 25, 35, 45))
      .select($"p_partkey", $"p_type", $"p_size")
    val complaints = Tables.supplier(spark, dir)
      .filter($"s_acctbal" < 0.0).select($"s_suppkey")
    pairs
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(complaints), $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_type", $"p_size".cast(LongType).as("p_size"))
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_type", $"p_size")
  }

  val q16SuppCntSql: String =
    """SELECT p_type, CAST(p_size AS BIGINT) AS p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_type <> 'PROMO' AND p_size IN (5, 15, 25, 35, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_type, p_size
      |ORDER BY supplier_cnt DESC, p_type, p_size""".stripMargin

  /** TPC-H Q21-style suppliers who kept orders waiting: in finished
    * ('F') multi-supplier orders, the supplier whose line came back
    * returned while NO other supplier's did — sole blame. The missing
    * receipt/commit dates are proxied by `l_returnflag = 'R'`. This
    * is the canonical EXISTS + NOT-EXISTS SELF-join on the fact
    * table: both probes shuffle key-pruned (orderkey, suppkey)
    * projections of lineitem on the order key — never the full row,
    * never a broadcast (the probe sides are fact-sized at 100 TB).
    * Counting stays per blamed LINE (TPC-H semantics: a supplier with
    * two returned lines in one order scores twice). */
  def q21Waiting(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
    val fOrders = Tables.orders(spark, dir)
      .filter($"o_orderstatus" === "F").select($"o_orderkey")
    val l1 = li.filter($"l_returnflag" === "R")
      .join(fOrders, $"l_orderkey" === $"o_orderkey", "left_semi")
      .select($"l_orderkey", $"l_suppkey")
    val others = li.select($"l_orderkey".as("lo2"), $"l_suppkey".as("ls2"))
    val otherReturned = li.filter($"l_returnflag" === "R")
      .select($"l_orderkey".as("lo3"), $"l_suppkey".as("ls3"))
    val sup = Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")
    l1
      .join(others, $"l_orderkey" === $"lo2" && $"l_suppkey" =!= $"ls2",
        "left_semi")
      .join(otherReturned,
        $"l_orderkey" === $"lo3" && $"l_suppkey" =!= $"ls3", "left_anti")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(10)
  }

  val q21WaitingSql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON l1.l_orderkey = o_orderkey
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 10""".stripMargin

  /** TPC-H Q2-style min-cost supplier per part: for each size-15 part,
    * the EUROPE supplier with the lowest observed unit price — the
    * correlated-MIN-joined-back shape. `ps_supplycost` is proxied by
    * `min(l_extendedprice / l_quantity)` observed in lineitem; the
    * per-row division happens in doubles identically in both engines
    * and e6-stabilizes BEFORE the min, so the argmin is an integer
    * comparison. Plan shape: both predicates broadcast into the
    * lineitem scan (it shrinks to size-15 × EUROPE rows before the
    * rollup), the (part, supplier) rollup is one partial-agged
    * shuffle, and the per-part argmin is a window over that already
    * tiny aggregated frame — never over the fact table. Ties break on
    * the lowest supplier key, making the cut deterministic. */
  def q2MinCost(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir).filter($"p_size" === 15)
      .select($"p_partkey", $"p_name")
    val sups = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), $"s_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, dir).filter($"r_name" === "EUROPE"),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"n_name")
    val cost = Tables.lineitem(spark, dir)
      .join(broadcast(parts.select($"p_partkey")),
        $"l_partkey" === $"p_partkey")
      .join(broadcast(sups.select($"s_suppkey")),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"p_partkey", $"l_suppkey")
      .agg(min(Stab.e6($"l_extendedprice" / $"l_quantity")).as("cost_e6"))
    val w = Window.partitionBy($"p_partkey")
      .orderBy($"cost_e6".asc, $"l_suppkey".asc)
    cost.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .join(broadcast(parts), Seq("p_partkey"))
      .join(broadcast(sups), $"l_suppkey" === $"s_suppkey")
      .select($"p_partkey", $"p_name", $"s_suppkey", $"s_name", $"n_name",
        $"cost_e6")
      .orderBy($"cost_e6".desc, $"p_partkey")
      .limit(20)
  }

  val q2MinCostSql: String =
    s"""WITH cost AS (
       |  SELECT p_partkey AS pk, l_suppkey,
       |    min(${Stab.sqlE6("l_extendedprice / l_quantity")}) AS cost_e6
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE p_size = 15 AND r_name = 'EUROPE'
       |  GROUP BY pk, l_suppkey),
       |best AS (
       |  SELECT *, row_number() OVER (PARTITION BY pk
       |    ORDER BY cost_e6 ASC, l_suppkey ASC) AS rn
       |  FROM cost)
       |SELECT pk AS p_partkey, p_name, s_suppkey, s_name, n_name, cost_e6
       |FROM best
       |JOIN part ON pk = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE rn = 1
       |ORDER BY cost_e6 DESC, p_partkey
       |LIMIT 20""".stripMargin

  /** TPC-H Q20-style dominant suppliers of a part family: suppliers
    * who shipped more than 1/8 of some 'bolt' part's total volume —
    * the nested-rollup dominance shape standing in for the availqty
    * threshold (no `partsupp` exists). Quantities stabilize e2
    * PER ROW (they are integral in the corpus; the floor(+0.5) form
    * keeps the contract exact even if they weren't), so both rollups
    * are integer sums and the dominance cut is an exact integer
    * cross-multiply. Plan shape: the part-family filter broadcasts
    * into the scan; the (part, supplier) rollup is the one fact-sized
    * shuffle; the per-part total re-aggregates that ALREADY-small
    * frame (never a second scan); supplier broadcasts for names. */
  def q20Excess(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bolts = Tables.part(spark, dir).filter($"p_name".like("%bolt%"))
      .select($"p_partkey")
    val sq = Tables.lineitem(spark, dir)
      .join(broadcast(bolts), $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum(Stab.e2($"l_quantity")).as("supp_qty_e2"))
    val pt = sq.groupBy($"l_partkey")
      .agg(sum($"supp_qty_e2").as("part_qty_e2"))
    val sup = Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")
    sq.join(pt, Seq("l_partkey"))
      .filter(lit(8L) * $"supp_qty_e2" > $"part_qty_e2")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_suppkey", $"s_name")
      .agg(count(lit(1)).as("n_parts_dominated"))
      .orderBy($"n_parts_dominated".desc, $"s_suppkey")
  }

  val q20ExcessSql: String =
    s"""WITH sq AS (
       |  SELECT l_partkey, l_suppkey,
       |    CAST(sum(${Stab.sqlE2("l_quantity")}) AS BIGINT) AS supp_qty_e2
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_name LIKE '%bolt%'
       |  GROUP BY l_partkey, l_suppkey),
       |pt AS (
       |  SELECT l_partkey, CAST(sum(supp_qty_e2) AS BIGINT) AS part_qty_e2
       |  FROM sq GROUP BY l_partkey)
       |SELECT s_suppkey, s_name, count(*) AS n_parts_dominated
       |FROM sq JOIN pt USING (l_partkey)
       |JOIN supplier ON l_suppkey = s_suppkey
       |WHERE 8 * supp_qty_e2 > part_qty_e2
       |GROUP BY s_suppkey, s_name
       |ORDER BY n_parts_dominated DESC, s_suppkey""".stripMargin

  /** TPC-H Q12-style late-shipment priority split — the LAST missing
    * shape: fact⋈fact join whose FILTER spans both sides' date
    * columns (l_shipdate vs o_orderdate + 60 days), conditional
    * counting split by a CASE over the dim from the OTHER side of
    * the join. Schema adaptation: `l_shipmode IN ('MAIL','SHIP')` →
    * `l_returnflag IN ('A','R')`, the commit/receipt lateness chain
    * → shipped more than 60 days after the order date. Plan shape
    * (the 100 TB contract): the returnflag+year predicate prunes the
    * lineitem SCAN (PushedFilters), the join is a key-pruned shuffle
    * on the order key (both sides fact — never broadcast), and the
    * CASE counts ride ONE partial-agged shuffle onto a 2-row group
    * frame. Counts are exact longs — no stabilization needed. */
  def q12Shipmode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val hi = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter($"l_returnflag".isin("A", "R") &&
        $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_returnflag", $"l_shipdate")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
      .groupBy($"l_returnflag")
      .agg(
        sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy($"l_returnflag")
  }

  val q12ShipmodeSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_returnflag IN ('A','R')
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin
}
