package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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
  * the SAME directory — byte-idempotent), then drops an empty marker file
  * `_commits/<id>`. Readers take only committed partitions, so a crash
  * between write and commit is invisible. Rows carry `spark_partition_id`
  * as per-partition lineage.
  *
  * The commit ledger goes through the Hadoop FileSystem API resolved from
  * `outDir`, so the sink works on file://, hdfs:// and s3a:// alike; the
  * one-empty-file-per-batch layout needs neither append (absent on S3A)
  * nor rename, making each commit a single idempotent PUT.
  */
final class ExactlyOnceSink(outDir: String,
    verifyCoLocation: Boolean = false) extends Serializable {

  private def hadoopConf: Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def commitsDir = new Path(outDir, "_commits")

  def committedBatchIds(): Set[Long] = {
    val fs = commitsDir.getFileSystem(hadoopConf)
    if (!fs.exists(commitsDir)) Set.empty
    else fs.listStatus(commitsDir).toSet[org.apache.hadoop.fs.FileStatus]
      .map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong)
  }

  /** foreachBatch body. */
  def write(batch: DataFrame, batchId: Long): Unit = {
    if (committedBatchIds().contains(batchId)) return // re-delivery: skip
    val withLineage = batch
      .withColumn("_lineage_partition", spark_partition_id())
      .withColumn("_batch_id", lit(batchId))
    // key-level guard inside the batch, PARTITION-LOCAL: the stateful
    // operator emits each (game_id, action_idx) at most once and its keyed
    // output co-locates a game's rows in one partition, so a local seen-set
    // gives the same guarantee as dropDuplicates WITHOUT re-shuffling the
    // whole wide output per micro-batch (the former dropDuplicates exchange
    // was ~30% of the emission batch's wall at 10M rows). Cross-batch
    // exactly-once remains the ledger's job, not this guard's.
    val schema = withLineage.schema
    val gi = schema.fieldIndex("game_id")
    val ai = schema.fieldIndex("action_idx")
    val deduped = withLineage.mapPartitions { it =>
      val seen = new java.util.HashSet[Long]()
      it.filter(r => seen.add((r.getInt(gi).toLong << 32) |
        (r.getInt(ai).toLong & 0xffffffffL)))
    }(org.apache.spark.sql.Encoders.row(schema))
    deduped.write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/batch_id=$batchId")
    // the partition-local guard's CONTRACT is that upstream co-locates
    // each key in one partition (the stateful operator's keyed output
    // does). A refactor that slips a repartition in front of the sink
    // would silently re-admit in-batch duplicates — with
    // `verifyCoLocation` the violation fails LOUDLY *before* the commit
    // marker lands, so the bad batch stays invisible to readers. This is
    // a validation mode (tests / canary deployments): it re-reads the
    // written batch, which the production hot path must not pay per
    // micro-batch.
    if (verifyCoLocation) {
      val spark = batch.sparkSession
      val written = spark.read.parquet(s"$outDir/batch_id=$batchId")
      val n = written.count()
      val nKeys = written.select("game_id", "action_idx").distinct().count()
      if (n != nKeys) throw new IllegalStateException(
        s"ExactlyOnceSink co-location contract violated in batch $batchId: " +
          s"$n rows but $nKeys distinct (game_id, action_idx) keys — an " +
          "upstream repartition split duplicate keys across partitions; " +
          "batch left uncommitted")
    }
    val fs = commitsDir.getFileSystem(hadoopConf)
    fs.mkdirs(commitsDir)
    fs.create(new Path(commitsDir, batchId.toString), true).close()
  }

  /** Committed view of the sink (what a downstream reader consumes). */
  def read(spark: SparkSession): DataFrame = {
    val fs = commitsDir.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = committedBatchIds().toSeq.sorted
      .map(id => new Path(outDir, s"batch_id=$id"))
      .filter(fs.exists).map(_.toString)
    if (dirs.isEmpty)
      spark.emptyDataFrame
    else
      spark.read.parquet(dirs: _*)
  }
}
