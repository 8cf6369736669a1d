package graft.core

import org.apache.spark.sql.SparkSession

/** Parse helpers for the library's `spark.graft.*` tuning confs.
  *
  * A malformed override (`spark.graft.ivf.k=abc`) must fail NAMING the
  * key — a bare NumberFormatException from somewhere inside a plan
  * build is undebuggable in a session that sets several knobs.
  */
object Knobs {

  /** The integer conf at `key`, or None when unset. Malformed values
    * fail fast with the key name and the offending text. */
  def confInt(spark: SparkSession, key: String): Option[Int] =
    spark.conf.getOption(key).map { v =>
      try v.trim.toInt
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"conf $key must be an integer, got '$v'")
      }
    }

  /** The double conf at `key`, or None when unset; same fail-fast
    * naming discipline as [[confInt]]. */
  def confDouble(spark: SparkSession, key: String): Option[Double] =
    spark.conf.getOption(key).map { v =>
      try v.trim.toDouble
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"conf $key must be a number, got '$v'")
      }
    }
}
