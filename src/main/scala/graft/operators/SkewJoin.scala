package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
