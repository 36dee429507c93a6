package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2 + the training-data
  * pipeline ops); each oracle-backed entry has column-name- and
  * value-aligned ANSI SQL for the driver's DuckDB compare.
  */
object SparkEntry {

  private val all: Seq[QueryDef] =
    Relational.defs ++ Dedup.defs ++ TextOps.defs ++ Similarity.defs ++
      SpadlQueries.defs

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The
    * reference's own flagship report: player VAEP index
    * (/root/reference/inst/examples/ex_opta.R:14-16) over the converted +
    * valued fixture corpus.
    */
  def entry(spark: SparkSession): DataFrame =
    SpadlQueries.defs.find(_.name == "spadl_player_index").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (engine-internal hashing / the SPADL token pipeline) -> rows-only.
    */
  def oracleSql: Map[String, String] =
    all.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
