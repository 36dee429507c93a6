package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the round-1 HUGEINT defect: DuckDB `sum()` /
  * `list_sum()` over integers returns HUGEINT (INT128), which the driver's
  * dtype-sensitive hash-compare serializes differently from Spark's BIGINT
  * even when the values are numerically identical (10/37 oracles failed for
  * exactly this in round 1).
  *
  * Rule enforced here: every `sum(` / `list_sum(` occurrence in every
  * oracle SQL must be directly consumed by one of
  *   - `CAST( ... )`  (integer sums -> BIGINT),
  *   - `round( ... )` (double sums, cents trick -> then CAST),
  *   - `sqrt( ... )`  (double sums inside norms -> double),
  * i.e. immediately preceded (ignoring whitespace) by `CAST(`, `ROUND(` or
  * `SQRT(`. Double sums are safe (DuckDB sum(double)=double); the
  * round/sqrt consumers are how every double sum appears in this repo.
  */
class OracleLintSpec extends AnyFunSuite {

  private val sumRe = """(?i)\b(list_sum|sum)\s*\(""".r
  private val okPrefixes = Seq("cast(", "round(", "sqrt(")

  test("every oracle sum()/list_sum() is wrapped in CAST/round/sqrt") {
    val bad = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      m <- sumRe.findAllMatchIn(sql)
      prefix = sql.substring(0, m.start).reverse.dropWhile(_.isWhitespace)
        .reverse.toLowerCase
      if !okPrefixes.exists(prefix.endsWith)
    } yield s"$name: uncast `${m.matched.trim}` at char ${m.start}"
    assert(bad.isEmpty,
      s"\nHUGEINT trap — wrap these in CAST(... AS BIGINT):\n${bad.mkString("\n")}")
  }

  test("no accumulation-order-sensitive aggregates in oracle SQL") {
    // avg/stddev/var over doubles accumulate in engine-specific order —
    // their low bits differ between Spark and DuckDB, so they can never
    // appear in an oracle (use the cents trick / exact-int forms instead)
    val banned = """(?i)\b(avg|stddev|stddev_samp|stddev_pop|var_samp|var_pop|variance|corr|covar_samp|covar_pop)\s*\(""".r
    val bad = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      m <- banned.findAllMatchIn(sql)
    } yield s"$name: `${m.matched.trim}`"
    assert(bad.isEmpty,
      s"\norder-sensitive aggregate in oracle SQL:\n${bad.mkString("\n")}")
  }

  test("every query name in oracleSql exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
