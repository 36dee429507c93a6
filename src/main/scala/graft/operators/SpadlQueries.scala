package graft.operators

import graft.convert.SpadlPipeline
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
    QueryDef("spadl_player_index",
      (s, _) => Valuation.value(actions(s))
        .groupBy(col("player_id"))
        .agg(sum(col("vaep_value")).as("index"))
        .orderBy(col("index").desc, col("player_id"))
        .limit(25), None)
  )
}
