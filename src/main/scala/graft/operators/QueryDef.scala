package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-facing query: Spark implementation + optional DuckDB oracle
  * SQL over the same parquet tables (driver contract — Verify.scala).
  * Oracle-less queries get the driver's weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object T {
  /** Load one driver testdata table (TESTDATA.md). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
