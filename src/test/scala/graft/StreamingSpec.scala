package graft

import graft.convert.SpadlPipeline
import graft.fixtures.FixtureGen
import graft.model._
import graft.streaming.{ExactlyOnceSink, SpadlStream, StreamJob}
import graft.vaep.ValuationCore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming semantics (SURVEY.md §5.3-5.4): batch/streaming equivalence
  * under arbitrary micro-batch slicing, watermark late-drop, duplicate
  * delivery, exactly-once sink idempotency, checkpoint resume.
  *
  * Abstract so the whole contract runs once per state-store provider:
  * [[StreamingSpec]] on the default heap-backed HDFS provider and
  * [[RocksDBStreamingSpec]] on RocksDB — the provider the design scale
  * requires (state must spill off-heap at 10^12 sequences), whose
  * serialization path the flat-array GameBuf encoder has to survive
  * byte-for-byte. Each suite gets its own `newSession()` so the
  * provider conf (a per-query setting read at stream start) cannot
  * leak across suites running in the same JVM.
  */
abstract class StreamingContractSpec extends AnyFunSuite {

  /** extra session confs — the state-store provider selector. */
  protected def sessionConfs: Map[String, String] = Map.empty

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
      .newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    sessionConfs.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  private val Base = 1704067200000L
  private def sentinel(i: Int, plusDays: Int): SpadlStream.StreamEvent =
    SpadlStream.StreamEvent(s"99$i", "opta", 0, 10, i,
      new Timestamp(Base + plusDays * 86400000L), Array(1, 1, 3, 0, 0, 1, 10,
        1, 5000, 5000, 0), None) // period 3: filtered by P1, emits nothing

  /** Batch truth: convert+value via the pure cores. */
  private def batchTruth(games: Seq[FixtureGen.Game]): Seq[ValuedAction] =
    games.flatMap { g =>
      val kps = g.keypasses.map(k =>
        SpadlPipeline.Kp(k.event_id, k.pass_type))
      ValuationCore.value(
        SpadlPipeline.convertDoc(g.doc.doc_id, g.doc.tokens, kps))
    }

  private def key(v: ValuedAction) = (v.game_id, v.action_idx)

  private def runStream(games: Seq[FixtureGen.Game], slices: Int,
      withKeypass: Boolean = false,
      lostUpgrades: Option[org.apache.spark.util.LongAccumulator] = None)
      : Seq[ValuedAction] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val all = games.flatMap(g => SpadlStream.toStreamEvents(g.doc, Base))
      .sortBy(e => (e.event_time.getTime, e.doc_id, e.seq))
    val mem = MemoryStream[SpadlStream.StreamEvent]
    val kpMem = MemoryStream[(String, Int, String, Timestamp)]
    val kpDf = kpMem.toDS().toDF("doc_id", "event_id", "pass_type",
      "event_time")
    val out = SpadlStream.valuedActions(spark, mem.toDS(),
      if (withKeypass) Some(kpDf) else None,
      watermarkDelay = "10 seconds", sessionGap = "10 minutes",
      lostUpgrades = lostUpgrades)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stream_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      if (withKeypass) {
        // keypass rows go in first so the left join matches within bounds
        games.flatMap(_.keypasses).foreach { k =>
          kpMem.addData((k.doc_id, k.event_id, k.pass_type,
            new Timestamp(Base + (k.event_time_sec * 1000).toLong)))
        }
      }
      val chunkSize = math.max(1, all.size / slices)
      all.grouped(chunkSize).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
      // far-future sentinels: 1st advances max event time, 2nd's batch sees
      // the advanced watermark (and flushes any outer-join holds), 3rd's
      // batch fires the session timeouts for keys whose data arrived in 2nd
      // the global watermark is the MIN across both inputs: sentinels must
      // advance the keypass stream too when it participates
      def kpSentinel(d: Int): (String, Int, String, Timestamp) =
        ("998", -1, "none", new Timestamp(Base + d * 86400000L))
      for (d <- 30 to 32) {
        mem.addData(sentinel(d - 29, d))
        if (withKeypass) kpMem.addData(kpSentinel(d))
        q.processAllAvailable()
      }
      spark.table("stream_out").as[ValuedAction].collect().toSeq
    } finally q.stop()
  }

  test("streaming == batch for any micro-batch slicing (opta + instat)") {
    val games = FixtureGen.corpus(6, 80)
    val truth = batchTruth(games.map(g => g.copy(keypasses = Nil)))
      .sortBy(key)
    for (slices <- Seq(1, 7, 29)) {
      val got = runStream(games, slices).sortBy(key)
      val missing = truth.map(key).toSet -- got.map(key).toSet
      val extra = got.map(key).toSet -- truth.map(key).toSet
      assert(got.size == truth.size,
        s"slices=$slices row count; missing=$missing extra=$extra")
      got.zip(truth).foreach { case (a, b) =>
        assert(a == b, s"slices=$slices mismatch at ${key(a)}")
      }
    }
  }

  test("stream-stream keypass join sets assist/keypass flags like batch") {
    val games = FixtureGen.corpus(4, 100).filter(_.doc.source == "opta")
    assert(games.exists(_.keypasses.nonEmpty), "fixture has keypasses")
    val lost = spark.sparkContext.longAccumulator("lost_kp_upgrades")
    val truth = batchTruth(games).sortBy(key)
    val got = runStream(games, 5, withKeypass = true,
      lostUpgrades = Some(lost)).sortBy(key)
    assert(got.size == truth.size)
    got.zip(truth).foreach { case (a, b) => assert(a == b, s"${key(a)}") }
    assert(got.exists(_.keypass) || got.exists(_.assist))
    // every keypass upgrade must land while its event is still buffered —
    // a nonzero count means the emission lag no longer covers the join's
    // release bound (silent parity loss made observable, round-2 ADVICE)
    assert(lost.value == 0L, s"lost keypass upgrades: ${lost.value}")
  }

  test("duplicate deliveries are idempotent; late rows are dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val games = FixtureGen.corpus(2, 60).filter(_.doc.source == "opta")
    val all = games.flatMap(g => SpadlStream.toStreamEvents(g.doc, Base))
      .sortBy(e => (e.event_time.getTime, e.doc_id, e.seq))
    val truth = batchTruth(games.map(_.copy(keypasses = Nil))).sortBy(key)
    val mem = MemoryStream[SpadlStream.StreamEvent]
    val out = SpadlStream.valuedActions(spark, mem.toDS(), None,
      "10 seconds", "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stream_dup").start()
    try {
      val (h, t) = all.splitAt(all.size / 2)
      mem.addData(h); q.processAllAvailable()
      mem.addData(h.take(10)) // duplicate re-delivery of old seqs
      q.processAllAvailable()
      mem.addData(t); q.processAllAvailable()
      // a LATE fabricated event: far below watermark, would corrupt game 0
      // if accepted (same doc, unseen seq, early timestamp)
      val lateEv = all.head.copy(seq = 9999,
        event_time = new Timestamp(Base + 1000L))
      mem.addData(sentinel(1, 30)); q.processAllAvailable()
      mem.addData(lateEv); q.processAllAvailable()
      mem.addData(sentinel(2, 31)); q.processAllAvailable()
      val got = spark.table("stream_dup").as[ValuedAction]
        .collect().toSeq.sortBy(key)
      assert(got.size == truth.size)
      got.zip(truth).foreach { case (a, b) => assert(a == b) }
    } finally q.stop()
  }

  test("exactly-once sink: re-delivered batch is a no-op; reader sees one copy") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val sink = new ExactlyOnceSink(dir)
    val games = FixtureGen.corpus(2, 60)
    val rows = batchTruth(games.map(_.copy(keypasses = Nil)))
    val df = spark.createDataset(rows).toDF()
    sink.write(df, 0L)
    sink.write(df, 0L) // re-delivery
    val read = sink.read(spark)
    assert(read.count() == rows.size)
    assert(read.select("game_id", "action_idx").distinct().count() ==
      rows.size)
    // lineage columns present
    assert(read.columns.contains("_lineage_partition"))
    assert(read.columns.contains("_batch_id"))
  }

  test("sink: uncommitted batch dir (crash window) is invisible to readers") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink2").toString
    val sink = new ExactlyOnceSink(dir)
    val games = FixtureGen.corpus(2, 60)
    val rows = batchTruth(games.map(_.copy(keypasses = Nil)))
    val df = spark.createDataset(rows).toDF()
    sink.write(df, 0L)
    // simulate a crash BETWEEN parquet write and marker commit: data dir
    // exists, marker doesn't
    import org.apache.spark.sql.functions.lit
    df.withColumn("_lineage_partition", lit(0))
      .withColumn("_batch_id", lit(1L))
      .write.mode("overwrite").parquet(s"$dir/batch_id=1")
    assert(sink.committedBatchIds() == Set(0L))
    assert(sink.read(spark).count() == rows.size,
      "reader must ignore the uncommitted batch dir")
    // the re-delivered batch 1 rewrites the SAME dir and commits it
    sink.write(df.limit(5), 1L)
    assert(sink.committedBatchIds() == Set(0L, 1L))
    assert(sink.read(spark).count() == rows.size + 5)
  }

  test("jittered delivery within the watermark slack == batch truth") {
    // events arrive OUT OF ORDER but each within the 10s allowed lateness:
    // arrival order = sort by (event_time + U[0,8s)) — by the time any
    // event arrives, the watermark (max seen - 10s) is still below its
    // own timestamp, so nothing may be dropped and the output must equal
    // the batch truth exactly.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val games = FixtureGen.corpus(4, 80)
    val truth = batchTruth(games.map(_.copy(keypasses = Nil))).sortBy(key)
    val rnd = new scala.util.Random(7L)
    val all = games.flatMap(g => SpadlStream.toStreamEvents(g.doc, Base))
      .map(e => (e.event_time.getTime + rnd.nextInt(8000), e))
      .sortBy { case (arrival, e) => (arrival, e.doc_id, e.seq) }
      .map(_._2)
    val mem = MemoryStream[SpadlStream.StreamEvent]
    val out = SpadlStream.valuedActions(spark, mem.toDS(), None,
      "10 seconds", "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stream_jitter").start()
    try {
      all.grouped(math.max(1, all.size / 9)).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
      for (d <- 30 to 32) {
        mem.addData(sentinel(d - 29, d)); q.processAllAvailable()
      }
      val got = spark.table("stream_jitter").as[ValuedAction]
        .collect().toSeq.sortBy(key)
      assert(got.size == truth.size,
        s"jitter run rows got=${got.size} want=${truth.size}")
      got.zip(truth).foreach { case (a, b) => assert(a == b, s"${key(a)}") }
    } finally q.stop()
  }

  test("streaming session-window possessions == batch session_window") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    val games = FixtureGen.corpus(3, 80)
    val all = games.flatMap(g => SpadlStream.toStreamEvents(g.doc, Base))
      .sortBy(e => (e.event_time.getTime, e.doc_id, e.seq))
    val mem = MemoryStream[SpadlStream.StreamEvent]
    val q = SpadlStream.possessions(spark, mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("poss_out").start()
    try {
      all.grouped(all.size / 5 + 1).foreach { c =>
        mem.addData(c); q.processAllAvailable()
      }
      (30 to 32).foreach { d =>
        mem.addData(sentinel(d - 29, d)); q.processAllAvailable()
      }
      val got = spark.table("poss_out")
        .filter(!col("doc_id").startsWith("99"))
        .select("doc_id", "team_id", "possession_start", "n_events")
        .collect().map(_.toSeq).toSet
      // batch oracle: the same session_window aggregation, non-streaming
      val teamCol = when(col("provider") === 0, element_at(col("group"), 7))
        .otherwise(element_at(col("group"), 4))
      val batch = spark.createDataset(all).toDF()
        .withColumn("team_id", teamCol)
        .groupBy(col("doc_id"), col("team_id"),
          session_window(col("event_time"), "10 seconds"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("doc_id"), col("team_id"),
          col("session_window.start").as("possession_start"), col("n_events"))
        .collect().map(_.toSeq).toSet
      assert(got.nonEmpty && got == batch)
    } finally q.stop()
  }

  test("sink crash between write and ledger commit: reader blind until re-delivery") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink2").toString
    val sink = new ExactlyOnceSink(dir)
    val rows = batchTruth(FixtureGen.corpus(1, 60).map(_.copy(keypasses = Nil)))
    val df = spark.createDataset(rows).toDF()
    // simulate a crash AFTER the parquet write but BEFORE the ledger append:
    // write the batch dir directly, no commit record
    df.write.mode("overwrite").parquet(s"$dir/batch_id=7")
    assert(sink.read(spark).isEmpty, "uncommitted batch must be invisible")
    // recovery: the batch is re-delivered with the same id -> overwrite+commit
    sink.write(df, 7L)
    assert(sink.read(spark).count() == rows.size)
    assert(sink.read(spark).select("game_id", "action_idx")
      .distinct().count() == rows.size)
  }

  test("checkpoint resume: kill between micro-batches, restart, exactly-once output") {
    import spark.implicits._
    val games = FixtureGen.corpus(3, 60)
    val truth = batchTruth(games.map(_.copy(keypasses = Nil))).sortBy(key)
    val all = games.flatMap(g => SpadlStream.toStreamEvents(g.doc, Base))
      .sortBy(e => (e.event_time.getTime, e.doc_id, e.seq))
    val tmp = java.nio.file.Files.createTempDirectory("graft_resume")
    val srcDir = s"$tmp/src"
    val outDir = s"$tmp/out"
    val ckDir = s"$tmp/ck"
    val (h, t) = all.splitAt(all.size / 2)
    spark.createDataset(h).repartition(1).write.parquet(s"$srcDir/p1")
    def stream = spark.readStream
      .schema(spark.createDataset(all).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/*")
      .as[SpadlStream.StreamEvent]
    // phase 1: process first half, then "crash" (stop) — with the salted
    // spread of the stateless stage enabled (output must be unaffected)
    val q1 = StreamJob.start(spark, stream, outDir, ckDir,
      trigger = Trigger.AvailableNow(), saltParts = Some(5))
    q1.awaitTermination(120000)
    q1.stop()
    // phase 2: second half + sentinels land, restart from checkpoint
    spark.createDataset(t).repartition(1).write.parquet(s"$srcDir/p2")
    spark.createDataset(Seq(sentinel(1, 30))).write.parquet(s"$srcDir/p3")
    spark.createDataset(Seq(sentinel(2, 31))).write.parquet(s"$srcDir/p4")
    spark.createDataset(Seq(sentinel(3, 32))).write.parquet(s"$srcDir/p5")
    val q2 = StreamJob.start(spark, stream, outDir, ckDir,
      trigger = Trigger.AvailableNow(), saltParts = Some(5))
    q2.awaitTermination(180000)
    q2.stop()
    val sink = new ExactlyOnceSink(outDir)
    val got = sink.read(spark)
      .drop("_lineage_partition", "_batch_id")
      .as[ValuedAction].collect().toSeq.sortBy(key)
    assert(got.size == truth.size,
      s"resume row count got=${got.size} want=${truth.size}")
    got.zip(truth).foreach { case (a, b) => assert(a == b) }
  }

  test("mid-flight kill: stop a RUNNING query, restart from checkpoint, " +
      "exactly-once content + per-partition lineage metrics") {
    // VERDICT r2 #5: unlike the phase-complete resume test above, this one
    // kills the query while it is LIVE on a continuous trigger (between /
    // inside micro-batches, wherever stop() lands), restarts from the same
    // checkpoint, and asserts the SURVEY §5.4 observables: exactly-once
    // sink content, the commit ledger growing monotonically across the
    // kill, per-partition lineage on every sink row, and emitted-row
    // metrics from the restarted run.
    import spark.implicits._
    val games = FixtureGen.corpus(8, 80)
    val truth = batchTruth(games.map(_.copy(keypasses = Nil))).sortBy(key)
    val all = games.flatMap(g => SpadlStream.toStreamEvents(g.doc, Base))
      .sortBy(e => (e.event_time.getTime, e.doc_id, e.seq))
    val tmp = java.nio.file.Files.createTempDirectory("graft_kill")
    val srcDir = s"$tmp/src"
    val outDir = s"$tmp/out"
    val ckDir = s"$tmp/ck"
    val chunk = math.max(1, all.size / 8)
    all.grouped(chunk).zipWithIndex.foreach { case (c, i) =>
      spark.createDataset(c).repartition(1).write.parquet(f"$srcDir/p$i%02d")
    }
    def stream = spark.readStream
      .schema(spark.createDataset(Seq(sentinel(1, 0))).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/*")
      .as[SpadlStream.StreamEvent]
    // phase 1: live continuous trigger; kill after >= 2 batches progressed
    val q1 = StreamJob.start(spark, stream, outDir, ckDir,
      trigger = Trigger.ProcessingTime(50))
    val deadline = System.currentTimeMillis() + 120000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    q1.stop() // mid-flight kill; any uncommitted batch is lost
    val sink = new ExactlyOnceSink(outDir)
    val committedAtKill = sink.committedBatchIds()
    assert(committedAtKill.nonEmpty, "kill landed before any batch committed")
    assert(sink.read(spark).count() < truth.size,
      "kill landed after the stream already finished — nothing to resume")
    // phase 2: sentinels land, restart from the SAME checkpoint and drain
    Seq(30, 31, 32).zipWithIndex.foreach { case (d, i) =>
      spark.createDataset(Seq(sentinel(i + 1, d))).write.parquet(s"$srcDir/zz$i")
    }
    val metrics = new StreamJob.EmitMetricsListener
    spark.streams.addListener(metrics)
    val q2 = StreamJob.start(spark, stream, outDir, ckDir,
      trigger = Trigger.AvailableNow(), metrics = Some(metrics))
    q2.awaitTermination(180000)
    q2.stop()
    spark.streams.removeListener(metrics)
    val raw = sink.read(spark)
    // exactly-once content: bitwise equal to batch truth, unique keys
    val got = raw.drop("_lineage_partition", "_batch_id")
      .as[ValuedAction].collect().toSeq.sortBy(key)
    assert(got.size == truth.size,
      s"post-restart rows got=${got.size} want=${truth.size}")
    got.zip(truth).foreach { case (a, b) => assert(a == b) }
    assert(raw.select("game_id", "action_idx").distinct().count() ==
      truth.size, "duplicate (game_id, action_idx) keys after restart")
    // the restart RESUMED: ledger grew, never rewound
    val committedAfter = sink.committedBatchIds()
    assert(committedAtKill.subsetOf(committedAfter),
      s"ledger rewound: $committedAtKill not in $committedAfter")
    assert(committedAfter.size > committedAtKill.size,
      "restarted run committed no new batches")
    // per-partition lineage on every row, spread over several partitions
    import org.apache.spark.sql.functions.col
    val lineage = raw.groupBy(col("_lineage_partition")).count().collect()
    assert(lineage.forall(!_.isNullAt(0)), "null _lineage_partition")
    assert(lineage.length >= 2,
      s"expected multi-partition lineage, got ${lineage.length}")
    // emitted-row metrics observed during the restarted run
    assert(metrics.batches > 0 && metrics.totalInputRows > 0,
      s"no metrics from restarted run: ${metrics.batches}/${metrics.totalInputRows}")
    // the telemetry counters are wired through and report a healthy run
    assert(metrics.lateRows == 0 && metrics.lostUpgrades == 0,
      s"healthy run reported late=${metrics.lateRows} lost=${metrics.lostUpgrades}")
  }

  test("IcebergMergeSink: MERGE statement parses; write refuses w/o catalog") {
    val sink = new graft.streaming.IcebergMergeSink("lake.graft.spadl")
    val sql = sink.mergeSql("src_view")
    // the statement must be valid Spark SQL (parser-level check — no
    // Iceberg runtime in this sandbox, execution is cluster-only)
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    assert(plan.toString.toLowerCase.contains("merge"))
    assert(sql.contains("t.game_id = s.game_id") &&
      sql.contains("t.action_idx = s.action_idx") &&
      sql.contains("WHEN MATCHED THEN UPDATE SET *") &&
      sql.contains("WHEN NOT MATCHED THEN INSERT *"))
    import spark.implicits._
    val df = spark.createDataset(batchTruth(
      FixtureGen.corpus(1, 40).map(_.copy(keypasses = Nil)))).toDF()
    val err = intercept[IllegalArgumentException](sink.write(df, 0L))
    assert(err.getMessage.contains("catalog 'lake' is not configured"))
    // a 2-part session-catalog name must fail FAST with a clear error,
    // not a confusing spark.sql.catalog.<db> lookup (round-2 ADVICE)
    val twoPart = new graft.streaming.IcebergMergeSink("graft.spadl")
    val err2 = intercept[IllegalArgumentException](twoPart.write(df, 0L))
    assert(err2.getMessage.contains("3-part"))
  }

  test("spadl_stream_actions driver query == spadl_valued (full pipeline)") {
    // the driver-facing streaming query must reproduce the batch valuation
    // row-for-row over the full fixture corpus (round-2 VERDICT next-#3)
    val cols = graft.SparkEntry.queries("spadl_valued")(spark, "")
      .columns.sorted.toSeq
    val stream = graft.SparkEntry.queries("spadl_stream_actions")(spark, "")
      .select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSeq
    val batch = graft.SparkEntry.queries("spadl_valued")(spark, "")
      .select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSeq
    assert(stream.size == batch.size && stream.nonEmpty)
    stream.zip(batch).foreach { case (a, b) => assert(a == b) }
  }

  test("stream multi-keypass rows: winner independent of delivery order") {
    // one event with BOTH 'key' and 'assisst' outcome rows: the stream-
    // stream join delivers two match rows; KpWinner precedence (not
    // delivery order) must decide, and the result must equal the batch
    // path, which dedups the collect_list the same way.
    val g0 = FixtureGen.corpus(4, 100)
      .find(x => x.doc.source == "opta" && x.keypasses.nonEmpty).get
    val k0 = g0.keypasses.head
    val extra = k0.copy(
      pass_type = if (k0.pass_type == "key") "assisst" else "key")
    val gA = g0.copy(keypasses = g0.keypasses :+ extra)
    val gB = g0.copy(keypasses = extra +: g0.keypasses)
    val truth = batchTruth(Seq(gA)).sortBy(key)
    assert(truth == batchTruth(Seq(gB)).sortBy(key),
      "batch winner must be order-independent")
    val gotA = runStream(Seq(gA), 5, withKeypass = true).sortBy(key)
    val gotB = runStream(Seq(gB), 5, withKeypass = true).sortBy(key)
    assert(gotA == truth, "stream (order A) != batch truth")
    assert(gotB == truth, "stream (order B) != batch truth")
  }

  test("InStat state is bounded by game size and closes on timeout") {
    // InStat emits only on session close (quirk Q4 forces whole-frame
    // result attribution), so its state is O(game) per key — this pins the
    // bound: buffered rows never exceed the game's event count, duplicate
    // deliveries don't grow it, and the event-time timeout flushes the
    // full valued game and REMOVES the state.
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val g = FixtureGen.corpus(24, 200).find(_.doc.source == "instat").get
    val events = SpadlStream.toStreamEvents(g.doc, Base)
    val n = events.size
    val fn = SpadlStream.stateFn(600000L, 0L, None) _

    var stateOpt: Option[SpadlStream.GameBuf] = None
    var wm = 0L
    val slices = events.grouped(math.max(1, n / 4)).toSeq
    slices.foreach { slice =>
      val st = TestGroupState.create[SpadlStream.GameBuf](
        stateOpt.map(Optional.of[SpadlStream.GameBuf])
          .getOrElse(Optional.empty[SpadlStream.GameBuf]()),
        GroupStateTimeout.EventTimeTimeout, 0L,
        Optional.of(wm), false)
      val out = fn(g.doc.doc_id, slice.iterator, st).toVector
      assert(out.isEmpty, "instat must not emit before session close")
      assert(st.exists, "state must persist between batches")
      val buf = st.get
      assert(buf.size <= n, s"state ${buf.size} exceeds game size $n")
      assert(st.getTimeoutTimestampMs.isPresent, "timeout must be set")
      stateOpt = Some(buf)
      wm = slice.map(_.event_time.getTime).max
    }
    assert(stateOpt.get.size == n) // all events buffered, none beyond

    // duplicate redelivery of a full slice: state must NOT grow
    val stDup = TestGroupState.create[SpadlStream.GameBuf](
      Optional.of(stateOpt.get), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(wm), false)
    assert(fn(g.doc.doc_id, slices.head.iterator, stDup).isEmpty)
    assert(stDup.get.size == n, "duplicate delivery grew the state")

    // timeout: full valued game flushes, state removed
    val stTo = TestGroupState.create[SpadlStream.GameBuf](
      Optional.of(stDup.get), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(wm + 600001L), true)
    val flushed = fn(g.doc.doc_id, Iterator.empty, stTo).toVector
    assert(stTo.isRemoved, "state must be removed on session close")
    val truth = batchTruth(Seq(g))
    assert(flushed.sortBy(key) == truth.sortBy(key),
      s"timeout flush ${flushed.size} rows != batch truth ${truth.size}")
  }

  test("undersized emission lag: a lost keypass upgrade increments the " +
      "accumulator through the real query") {
    // The production emission lag (40s) exceeds the stream-stream join's
    // release bound, so upgrades always land while their event is still
    // buffered — the keypass-join test asserts the counter stays 0. In
    // fact Spark itself already delays the post-join operator's watermark
    // by the join bound (getCurrentWatermarkMs = global wm - 30s - 1ms
    // here), so even a ZERO lag cannot lose an in-window upgrade; the
    // 40s lag is a second, engine-owned margin on top. To prove the
    // margin break is OBSERVABLE (round-3 VERDICT #8), this test sets a
    // NEGATIVE override — emitting ahead of the safe frontier the same
    // way a mis-sized production lag would — and delivers a keypass at
    // the join-window edge one batch after its event's region was
    // emitted: the parity loss must land in the lostUpgrades
    // accumulator, through the real streaming machinery (MemoryStream ->
    // join -> watermark -> state), not a TestGroupState harness.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val g = FixtureGen.corpus(4, 100).find(_.doc.source == "opta").get
    val raw = SpadlStream.toStreamEvents(g.doc, Base)
    // retime: event i at t = 5i seconds into period 1, preserving order
    val events = raw.zipWithIndex.map { case (e, i) =>
      val grp = e.group.clone()
      grp(2) = 1; grp(3) = (5 * i) / 60; grp(4) = (5 * i) % 60
      e.copy(group = grp, event_time = new Timestamp(Base + 5000L * i))
    }
    val eIdx = 10 // target event E at t = 50s
    val tE = 5L * eIdx
    val targetEventId = events(eIdx).group(0)
    val mem = MemoryStream[SpadlStream.StreamEvent]
    val kpMem = MemoryStream[(String, Int, String, Timestamp)]
    val kpDf = kpMem.toDS().toDF("doc_id", "event_id", "pass_type",
      "event_time")
    val lost = spark.sparkContext.longAccumulator("lost_upgrades_margin")
    val out = SpadlStream.valuedActions(spark, mem.toDS(), Some(kpDf),
      watermarkDelay = "60 seconds", sessionGap = "10 minutes",
      lostUpgrades = Some(lost), emissionLagOverride = Some(-20000L))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stream_lost_upg").start()
    try {
      if (sys.env.contains("GRAFT_TEST_DEBUG")) {
        spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
          override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
            println(s"[lostupg] batch=${e.progress.batchId} rows=${e.progress.numInputRows} wm=${e.progress.eventTime.get("watermark")} sources=${e.progress.sources.map(s => s.description.take(20) + ":" + s.numInputRows).mkString(" ")}")
          override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        })
      }
      // batch 1: events up to t=135 plus a non-matching keypass row at
      // t=135 — the GLOBAL watermark is the min over both inputs, so the
      // kp side must advance too. Watermark after: 135 - 60 = 75s.
      mem.addData(events.take(28))
      kpMem.addData(("998", -1, "none", new Timestamp(Base + 135 * 1000L)))
      q.processAllAvailable()
      // batch 2: a duplicate re-delivery (idempotent, no wm change): the
      // join releases the early region to the state operator, whose own
      // watermark is the global 75s minus the 30s join bound; with the
      // -20s lag it stores frontier = 75 - 30 + 20 = 65s > tE and emits
      // E's region ahead of the safe bound.
      mem.addData(Seq(events(27))); q.processAllAvailable()
      assert(lost.value == 0L)
      // batch 3: the upgrade at t = 77s — above the 75s global watermark
      // (passes the late filter), inside E's join window (|77-50| <= 30),
      // but BELOW the stored 65s emission frontier -> a lost upgrade
      kpMem.addData((g.doc.doc_id, targetEventId, "key",
        new Timestamp(Base + (tE + 27) * 1000L)))
      q.processAllAvailable()
      assert(lost.value >= 1L,
        "below-frontier keypass upgrade was not counted")
    } finally q.stop()
  }

  test("sink co-location check: scattered duplicate keys fail loudly and " +
      "the batch stays uncommitted") {
    // ExactlyOnceSink's in-batch dedup guard is partition-local; its
    // contract is that upstream co-locates each (game_id, action_idx) in
    // one partition (the stateful operator's keyed output does). If a
    // refactor slipped a repartition in front of the sink, duplicates
    // could span partitions and slip through silently. verifyCoLocation
    // makes that loud: the violating batch fails BEFORE its commit
    // marker lands, so readers never see it (round-3 VERDICT #6).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_coloc").toString
    val strict = new ExactlyOnceSink(dir, verifyCoLocation = true)
    val rows = batchTruth(FixtureGen.corpus(1, 60).map(_.copy(keypasses = Nil)))
    val df = spark.createDataset(rows).toDF()
    // healthy batch (unique keys) passes under any partitioning
    strict.write(df, 0L)
    assert(strict.committedBatchIds() == Set(0L))
    // a duplicated batch whose copies live in DIFFERENT partitions (one
    // copy per input partition — what a repartition before the sink can
    // produce): the partition-local guard cannot dedup across them.
    // Built at the RDD level so no optimizer rule can re-collapse the
    // two partitions.
    val scattered = spark.createDataFrame(
      df.rdd.coalesce(1).union(df.rdd.coalesce(1)), df.schema)
    val err = intercept[IllegalStateException](strict.write(scattered, 1L))
    assert(err.getMessage.contains("co-location"))
    assert(strict.committedBatchIds() == Set(0L),
      "violating batch must stay uncommitted")
    assert(strict.read(spark).count() == rows.size)
    // the same scattered batch with the check DISABLED documents why it
    // exists: cross-partition duplicates survive the partition-local
    // guard alone (the check is on by default since round 5 — it became
    // a one-pass accumulator intersection, cheap enough for production)
    val lax = new ExactlyOnceSink(s"$dir/lax", verifyCoLocation = false)
    lax.write(scattered, 0L)
    assert(lax.read(spark).count() == 2L * rows.size)
  }
}

/** The streaming contract on the default heap-backed HDFS state store. */
class StreamingSpec extends StreamingContractSpec

/** The identical contract on the RocksDB state-store provider — the
  * off-heap spill path the 10^12-sequence design scale requires
  * (round-3 VERDICT #1). Every parity, watermark, sink and
  * kill/restart test re-runs here, so the GameBuf flat-array encoding
  * is validated against RocksDB's byte-blob value codec and the
  * checkpoint-restore path, not just the heap provider's object map.
  */
class RocksDBStreamingSpec extends StreamingContractSpec {
  // the PRODUCTION-TUNED RocksDB configuration (changelog checkpointing +
  // no row tracking) — the same confs the benches run, so the contract
  // (incl. checkpoint-restore, which changelog checkpointing reshapes)
  // is validated on the configuration we'd actually deploy
  override protected def sessionConfs: Map[String, String] =
    graft.streaming.StateStores.RocksDBConfs

  test("suite session really selects the RocksDB provider") {
    assert(graft.streaming.StateStores.active(spark) == "rocksdb")
  }
}
