package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store provider selection for the streaming state layer.
  *
  * The default HDFS-backed provider keeps every key's state on the JVM
  * heap — fine for tests, fatal at the 10^12-sequence design scale
  * (BASELINE.json), where in-flight per-game state must spill to local
  * disk. RocksDB is the spill answer (SURVEY.md §4): state lives
  * off-heap in a local RocksDB instance per state partition, keys are
  * evicted to SST files under memory pressure, and checkpoints ship the
  * RocksDB snapshot/changelog instead of heap-object deltas. The flat
  * primitive-array [[SpadlStream.GameBuf]] encoding matters twice here:
  * besides being the fast path for the Catalyst encoder, it serializes
  * to a single compact byte blob per key, which is exactly the shape a
  * RocksDB value wants (one get/put per key per batch, no per-element
  * codec work).
  *
  * Selection knob: `GRAFT_STATE=rocksdb` (benches, RunStream) or an
  * explicit conf. The provider is a per-QUERY setting read at stream
  * start from the session conf, so it composes with an existing
  * SparkSession via `spark.conf.set` — no context restart needed.
  */
object StateStores {
  val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** confs selected by the GRAFT_STATE env knob ("rocksdb" or unset/hdfs). */
  def envConfs: Map[String, String] =
    sys.env.get("GRAFT_STATE") match {
      case Some("rocksdb") => Map(ProviderConf -> RocksDBProvider)
      case _ => Map.empty
    }

  /** human-readable name of the provider a session would use now. */
  def active(spark: SparkSession): String =
    if (spark.conf.getOption(ProviderConf).contains(RocksDBProvider)) "rocksdb"
    else "hdfs-heap"

  def applyEnv(spark: SparkSession): SparkSession = {
    envConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    spark
  }
}
