package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static guard over every DuckDB oracle in [[SparkEntry.oracleSql]]:
  * `sum()` over integers returns HUGEINT in DuckDB, and the driver's
  * result hasher is TYPE-sensitive — a HUGEINT column hashes
  * differently from the BIGINT Spark writes even when every value is
  * equal (this shipped five red CORRECTNESS rows in round 7:
  * text_bm25, text_unigram_ll, dsir_importance, mixture_plan,
  * q22_dormant). The repo convention is therefore: every SQL `sum(`
  * is wrapped in an explicit CAST (`CAST(sum(..) AS BIGINT)` or the
  * Stab.sqlE2/sqlE6 forms, which expand to `CAST(FLOOR(..) AS
  * BIGINT)`). This spec enforces the convention statically so the
  * class of bug cannot ship again; tools/compare.py additionally
  * rejects any oracle whose *projection* types include
  * HUGEINT/DECIMAL at runtime (the exact driver-parity check).
  */
class OracleTypeGuardSpec extends AnyFunSuite {

  // `sum(` not part of a longer identifier (list_sum, checksum, ...)
  private val sumCall = "(?i)(?<![a-z_])sum\\s*\\(".r

  test("every oracle SQL sum() is CAST-wrapped (HUGEINT guard)") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        sumCall.findAllMatchIn(sql).flatMap { m =>
          val back = sql.substring(math.max(0, m.start - 60), m.start)
          if (back.toUpperCase.contains("CAST(")) None
          else Some(s"$name @${m.start}: ...${back.takeRight(40)}sum(...")
        }
    }
    assert(offenders.isEmpty,
      s"\nbare sum() in oracle SQL (DuckDB returns HUGEINT; the driver " +
        s"hasher is type-sensitive — wrap in CAST):\n  " +
        offenders.mkString("\n  "))
  }

  test("explicit HUGEINT intermediates are re-cast to BIGINT") {
    // `//` keeps HUGEINT alive once introduced; with every sum cast
    // (test above) BIGINT `//` BIGINT stays BIGINT, so `//` needs no
    // cast of its own. Deliberate `CAST(x AS HUGEINT)` widening (the
    // overflow-exact ratio convention, e.g. q14's promo share) is
    // allowed ONLY when the same oracle narrows back with an
    // `AS BIGINT` — the projection itself must never stay wide
    // (tools/compare.py enforces the projection types at runtime).
    val wide = "(?i)hugeint|int128".r
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if wide.findFirstIn(sql).isDefined &&
        !sql.toUpperCase.contains("AS BIGINT") => name
    }
    assert(offenders.isEmpty,
      s"HUGEINT minted without a BIGINT re-cast: $offenders")
  }
}
