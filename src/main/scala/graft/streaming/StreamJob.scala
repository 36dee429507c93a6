package graft.streaming

import graft.model.ValuedAction
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

/** End-to-end streaming job wiring: salted repartition -> state ->
  * exactly-once sink + checkpoint + emitted-row metrics.
  */
object StreamJob {

  /** Per-round metrics listener: rows/sec, state size, emitted counts —
    * the "per-partition lineage + emitted-row metrics" of the north rule
    * (lineage columns land in the sink; aggregate progress logs here).
    */
  final class EmitMetricsListener extends StreamingQueryListener {
    @volatile var totalInputRows = 0L
    @volatile var totalStateRows = 0L
    @volatile var batches = 0L
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      batches += 1
      totalInputRows += e.progress.numInputRows
      val so = e.progress.stateOperators
      if (so.nonEmpty) totalStateRows = so.map(_.numRowsTotal).sum
    }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  /** Salted repartition of the stateless stage (SURVEY.md §4): hot
    * `source`/hot-team skew is defused by spreading rows over
    * hash(doc_id, seq) — a pure-function spread that keeps NO affinity
    * requirement, because the stateful stage re-keys by doc_id itself
    * (groupByKey performs the correctness-critical hash by key).
    */
  def saltedSpread(events: Dataset[SpadlStream.StreamEvent], parts: Int)
      : Dataset[SpadlStream.StreamEvent] =
    events.repartition(parts, pmod(hash(col("doc_id"), col("seq")), lit(parts)))

  /** Start the full job: events stream -> valued actions -> exactly-once
    * sink, resumable from `checkpointDir`. An `outDir` of the form
    * `iceberg:<catalog.db.table>` routes each micro-batch through
    * [[IcebergMergeSink]] (cluster path, requires a configured Iceberg
    * catalog); any filesystem URI uses [[ExactlyOnceSink]] (parquet +
    * commit markers over the Hadoop FileSystem).
    */
  def start(spark: SparkSession, events: Dataset[SpadlStream.StreamEvent],
      outDir: String, checkpointDir: String,
      keypass: Option[org.apache.spark.sql.DataFrame] = None,
      watermarkDelay: String = "10 seconds",
      sessionGap: String = "10 minutes",
      trigger: Trigger = Trigger.AvailableNow(),
      saltParts: Option[Int] = None): StreamingQuery = {
    val sinkWrite: (org.apache.spark.sql.DataFrame, Long) => Unit =
      if (outDir.startsWith("iceberg:")) {
        val merge = new IcebergMergeSink(outDir.stripPrefix("iceberg:"))
        merge.write
      } else {
        val sink = new ExactlyOnceSink(outDir)
        sink.write
      }
    // optional salted spread of the STATELESS stage for hot-source input
    // skew; the stateful stage re-keys by doc_id, so correctness is
    // unaffected (asserted by the slicing-equivalence tests)
    val spread = saltParts.map(saltedSpread(events, _)).getOrElse(events)
    val valued: Dataset[ValuedAction] =
      SpadlStream.valuedActions(spark, spread, keypass, watermarkDelay,
        sessionGap)
    valued.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((batch: Dataset[ValuedAction], batchId: Long) =>
        sinkWrite(batch.toDF(), batchId))
      .start()
  }
}
