package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Exactly-once sink keyed (doc_id/game_id, action_idx) — the engine
  * analogue of the reference's composite-`_id` idempotent Mongo insert
  * (/root/reference/inst/scripts/prepare_training_data_db.R:35-64) and the
  * local stand-in for an Iceberg `MERGE INTO` (SURVEY.md §7.4: the Iceberg
  * runtime jar is not available offline; on a cluster the same trait is
  * `MERGE INTO t USING s ON t.doc_id = s.doc_id AND t.action_idx =
  * s.action_idx WHEN NOT MATCHED THEN INSERT *` in the same foreachBatch).
  *
  * Protocol: each micro-batch writes to its own `batch_id=<id>` partition
  * directory with Overwrite (a re-delivered batch after restart rewrites
  * the SAME directory — byte-idempotent), then appends the id to a commit
  * ledger. Readers take only committed partitions, so a crash between
  * write and commit is invisible. Rows carry `spark_partition_id` as
  * per-partition lineage.
  */
final class ExactlyOnceSink(outDir: String) extends Serializable {

  private def ledger = Paths.get(outDir, "_committed")

  def committedBatchIds(): Set[Long] =
    if (Files.exists(ledger))
      scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(ledger)).asScala
        .filter(_.nonEmpty).map(_.toLong).toSet
    else Set.empty

  /** foreachBatch body. */
  def write(batch: DataFrame, batchId: Long): Unit = {
    if (committedBatchIds().contains(batchId)) return // re-delivery: skip
    val withLineage = batch
      .withColumn("_lineage_partition", spark_partition_id())
      .withColumn("_batch_id", lit(batchId))
      // key-level guard inside the batch (state emits each key once, but
      // the sink contract is (doc_id, action_idx) uniqueness regardless)
      .dropDuplicates("game_id", "action_idx")
    withLineage.write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/batch_id=$batchId")
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(ledger, s"$batchId\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Committed view of the sink (what a downstream reader consumes). */
  def read(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val ids = committedBatchIds()
    val dirs = ids.toSeq.sorted.map(id => s"$outDir/batch_id=$id")
      .filter(d => Files.exists(Paths.get(d)))
    if (dirs.isEmpty)
      spark.emptyDataFrame
    else
      spark.read.parquet(dirs: _*)
  }
}
