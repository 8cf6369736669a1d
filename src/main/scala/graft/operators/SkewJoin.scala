package graft.operators

import graft.core.{Stab, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split isn't available (e.g. the skew is in a broadcast-
  * ineligible aggregation input, or a static plan is required).
  *
  * A hot key concentrates its rows in one shuffle partition; one
  * straggler task then dominates the stage. Salting splits each hot
  * key into `buckets` sub-keys: the big side appends a DETERMINISTIC
  * salt (hash of the whole row, not rand() — retries and both
  * engines of an oracle pair must agree), the small side is exploded
  * once per salt value, and the join key becomes (key, salt). Row
  * multiplication is only `buckets` × |small side|.
  */
object SkewJoin {

  /** Inner-join `big ⋈ small` on `key`, salting the big side into
    * `buckets` sub-keys per key value. `bigSaltSource` must be a
    * deterministic per-row column (e.g. a row id). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      bigSaltSource: Column, buckets: Int): DataFrame = {
    // a fixed temp name would silently overwrite (and then drop) a
    // caller's column of the same name — pick one that collides with
    // neither input
    val salt = Iterator.from(0).map(i => s"_salt$i")
      .find(n => !big.columns.contains(n) && !small.columns.contains(n)).get
    val salted = big.withColumn(salt, pmod(hash(bigSaltSource), lit(buckets)))
    val exploded = small.withColumn(salt,
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, salt)).drop(salt)
  }

  /** Salt sub-keys for [[joinSalted]] — enough to split a hot key
    * across every core of a 32-way stage without multiplying the
    * small side past broadcast range (8 × |dims|). */
  val saltBuckets = 8

  /** `join_salted`: the salted rewrite SERVED as an oracled query —
    * events (5 hot keys carry the whole table: the worst shuffle
    * skew shape, one straggler task per key) joined to a per-type
    * weight dim through [[saltedJoin]], then rolled up. The DuckDB
    * oracle computes the PLAIN join: salting is semantics-preserving
    * by construction, so the hash-exact compare certifies the
    * rewrite is an identity — the property a skew mitigation must
    * prove before anyone trusts it at 100 TB. The salt is a
    * deterministic per-row hash (event_id), never rand(): task
    * retries and both engines must agree.
    *
    * Scale shape: each hot key splits into [[saltBuckets]] shuffle
    * sub-partitions (the straggler becomes 8 parallel tasks); the
    * dim side multiplies only 8×|types| rows; the rollup re-merges
    * sub-keys in the same partial-agged shuffle. Weighted measure
    * stabilizes per-row (e6 · integer weight) so the sum is exact
    * cross-engine in any order. */
  def joinSalted(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("weight", length(col("event_type")).cast("long"))
    saltedJoin(ev, dim, "event_type", col("event_id"), saltBuckets)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(Stab.e6(col("value")) * col("weight")).as("weighted_e6"))
      .orderBy(col("event_type"))
  }

  val joinSaltedSql: String =
    s"""WITH dim AS (
       |  SELECT DISTINCT event_type,
       |    CAST(len(event_type) AS BIGINT) AS weight
       |  FROM events)
       |SELECT e.event_type, count(*) AS n,
       |  CAST(sum(${Stab.sqlE6("e.value")} * weight) AS BIGINT) AS weighted_e6
       |FROM events e JOIN dim USING (event_type)
       |GROUP BY e.event_type
       |ORDER BY e.event_type""".stripMargin
}
