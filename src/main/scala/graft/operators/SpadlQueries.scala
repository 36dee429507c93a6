package graft.operators

import graft.convert.SpadlPipeline
import SpadlPipeline.{Kp}
import graft.features.Features
import graft.fixtures.FixtureGen
import graft.vaep.Valuation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SPADL engine surfaced as driver queries. Inputs are the
  * deterministic fixture corpus (seeded, FIXTURES.md §5) — the engine's
  * token table isn't part of the driver's TPC-H testdata, so these are
  * rows-only checks; their real correctness gate is the golden/unit suite
  * (`sbt -batch test`).
  */
object SpadlQueries {

  val NGames = 24
  val EventsPerGame = 200

  def corpus(spark: SparkSession): (DataFrame, DataFrame) = {
    import spark.implicits._
    val games = FixtureGen.corpus(NGames, EventsPerGame)
    (games.map(_.doc).toDF(), games.flatMap(_.keypasses).toDF())
  }

  def actions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val (docs, kp) = corpus(spark)
    SpadlPipeline.convert(spark, docs.as[graft.model.TokenDoc],
      Some(kp.as[graft.model.KeypassRow])).toDF()
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("spadl_actions",
      (s, _) => actions(s).orderBy(col("game_id"), col("action_idx")), None),
    QueryDef("spadl_valued",
      (s, _) => Valuation.value(actions(s))
        .orderBy(col("game_id"), col("action_idx")), None),
    QueryDef("spadl_training_frame",
      (s, _) => Features.trainingFrame(actions(s))
        .orderBy(col("game_id"), col("action_idx")), None),
    // get_model_data(add_predictions = TRUE) analogue: feature frame with
    // scores/concedes replaced by the committed model's probabilities
    // (R/spadl.R:72-145)
    QueryDef("spadl_model_data",
      (s, _) => Features.modelData(actions(s))
        .orderBy(col("game_id"), col("action_idx")), None),
    QueryDef("spadl_player_index",
      (s, _) => Valuation.value(actions(s))
        .groupBy(col("player_id"))
        .agg(sum(col("vaep_value")).as("index"))
        .orderBy(col("index").desc, col("player_id"))
        .limit(25), None),
    // the same conversion as spadl_actions, but via the PURE-Catalyst
    // declarative path (OptaConvertBatch) — property-tested equal to the
    // typed core; exposed so the driver exercises both plans
    QueryDef("spadl_actions_catalyst",
      (s, _) => {
        import s.implicits._
        val (docs, kp) = corpus(s)
        graft.convert.OptaConvertBatch.toSpadl(
          SpadlPipeline.decodeOptaEvents(s,
            docs.as[graft.model.TokenDoc],
            Some(kp.as[graft.model.KeypassRow])).toDF())
          .orderBy(col("game_id"), col("action_idx"))
      }, None),
    // the InStat twin of spadl_actions_catalyst: declarative Catalyst
    // conversion (InstatConvertBatch) property-tested equal to the typed
    // core InstatGameConverter
    QueryDef("spadl_actions_catalyst_instat",
      (s, _) => {
        import s.implicits._
        val (docs, _) = corpus(s)
        graft.convert.InstatConvertBatch.toSpadl(
          SpadlPipeline.decodeInstatEvents(s,
            docs.as[graft.model.TokenDoc]).toDF())
          .orderBy(col("game_id"), col("action_idx"))
      }, None),
    QueryDef("spadl_atomic",
      (s, _) => graft.convert.AtomicConvert.toAtomic(actions(s))
        .orderBy(col("game_id"), col("atomic_idx")), None),
    // .get_vaep_values(type = "atomic") analogue (R/model_data.R:26-32):
    // atomic conversion + the atomic committed-model valuation
    QueryDef("spadl_atomic_valued",
      (s, _) => graft.vaep.AtomicValuation.value(
        graft.convert.AtomicConvert.toAtomic(actions(s)))
        .orderBy(col("game_id"), col("atomic_idx")), None),
    // W10 possession sessionization via the built-in session_window (10 s
    // gap per doc+team) — batch form of the streaming possessions query
    QueryDef("spadl_possessions",
      (s, _) => {
        val a = actions(s)
        val ts = to_timestamp(lit("2024-01-01 00:00:00"))
          .cast("long") + ((col("period_id") - 1) * 3600 +
            col("time_seconds")).cast("long")
        a.withColumn("ts", ts.cast("timestamp"))
          .groupBy(col("game_id"), col("team_id"),
            session_window(col("ts"), "10 seconds"))
          .agg(count(lit(1)).as("n_actions"),
            sum(col("time_seconds")).as("sum_t"))
          .select(col("game_id"), col("team_id"),
            col("session_window.start").as("possession_start"),
            col("n_actions"), col("sum_t"))
          .orderBy(col("game_id"), col("team_id"), col("possession_start"))
      }, None)
  )
}
