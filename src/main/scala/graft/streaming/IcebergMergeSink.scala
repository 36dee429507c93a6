package graft.streaming

import org.apache.spark.sql.DataFrame

/** The cluster-grade exactly-once sink: Iceberg `MERGE INTO` keyed
  * (game_id, action_idx) inside `foreachBatch` — the same protocol as
  * [[ExactlyOnceSink]] (the local parquet + marker-ledger stand-in), with
  * the key-level idempotency delegated to the table format's ACID commit.
  * Reference analogue: the composite-`_id` Mongo insert of
  * /root/reference/inst/scripts/prepare_training_data_db.R:35-64.
  *
  * This compiles against plain Spark (the statement is ANSI MERGE, parsed
  * by Spark's SQL parser; execution requires an Iceberg catalog on the
  * cluster — the runtime jar is not available in this sandbox, so `write`
  * refuses unless the target catalog is configured, and the SQL generation
  * itself is unit-tested).
  */
final class IcebergMergeSink(table: String) extends Serializable {

  /** The MERGE statement for one micro-batch staged as `sourceView`.
    * WHEN NOT MATCHED only: re-delivered rows are byte-identical (the
    * pipeline is deterministic), so matches are silently kept — the
    * insert is idempotent per (game_id, action_idx).
    */
  def mergeSql(sourceView: String): String =
    s"""MERGE INTO $table t
       |USING $sourceView s
       |ON t.game_id = s.game_id AND t.action_idx = s.action_idx
       |WHEN NOT MATCHED THEN INSERT *""".stripMargin

  /** foreachBatch body for a cluster with an Iceberg catalog. */
  def write(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val catalog = table.split('.').head
    require(
      spark.conf.getOption(s"spark.sql.catalog.$catalog").isDefined,
      s"catalog '$catalog' is not configured — on this sandbox use " +
        "ExactlyOnceSink (parquet + commit markers); on a cluster set " +
        s"spark.sql.catalog.$catalog to the Iceberg catalog impl")
    val view = s"graft_merge_src_$batchId"
    batch.dropDuplicates("game_id", "action_idx").createOrReplaceTempView(view)
    try spark.sql(mergeSql(view))
    finally spark.catalog.dropTempView(view)
  }
}
