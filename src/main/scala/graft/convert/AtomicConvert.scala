package graft.convert

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Standard SPADL -> atomic SPADL (SURVEY.md §2.9; delegated in the
  * reference to `socceraction.atomic.spadl.convert_to_atomic`,
  * /root/reference/R/model_data.R:34-36 — semantics are the published
  * socceraction ones: positions become (x, y, dx, dy) deltas, `result_*`
  * disappears and is REIFIED as follow-up atomic events).
  *
  * Reification rules (each base action may emit ONE extra atomic):
  *  - successful pass-like -> `receival` at the end point, attributed to
  *    the NEXT action's player when the next action is by the same team;
  *  - failed pass-like -> `interception` by the next player when the next
  *    action is by the OTHER team, else `out` at the end point;
  *  - offside pass-like -> `offside`;
  *  - successful shot-like -> `goal`; owngoal -> `owngoal`;
  *  - yellow_card / red_card results -> card atomics.
  *
  * Implementation is fully declarative: one lead() window + an exploded
  * struct array — the generator-shaped operator (UDTF analogue) expressed
  * in Catalyst so it whole-stage-compiles and needs no custom plan node.
  */
object AtomicConvert {

  /** atomic vocabulary = standard 23 types + reified events */
  val atomicTypes: Seq[(Int, String)] =
    graft.model.SpadlConfig.actiontypes ++ Seq(
      23 -> "receival", 24 -> "out", 25 -> "offside", 26 -> "goal",
      27 -> "owngoal", 28 -> "yellow_card", 29 -> "red_card")
  val atomicIdByName: Map[String, Int] =
    atomicTypes.map { case (i, n) => n -> i }.toMap

  private val passLike = Seq("pass", "cross", "throw_in", "freekick_crossed",
    "freekick_short", "corner_crossed", "corner_short", "goalkick")
  private val shotLike = Seq("shot", "shot_penalty", "shot_freekick")

  def toAtomic(actions: DataFrame): DataFrame = {
    val w = Window.partitionBy("game_id").orderBy("action_idx")
    val nextPlayer = lead(col("player_id"), 1).over(w)
    val nextTeam = lead(col("team_id"), 1).over(w)

    def atom(typeName: Column, typeId: Column, player: Column, team: Column,
        x: Column, y: Column, dx: Column, dy: Column, sub: Int) =
      struct(typeName.as("type_name"), typeId.as("type_id"),
        player.as("player_id"), team.as("team_id"), x.as("x"), y.as("y"),
        dx.as("dx"), dy.as("dy"), lit(sub).as("sub_idx"))

    def id(n: String): Column = lit(atomicIdByName(n))

    val base = atom(col("type_name"), col("type_id"), col("player_id"),
      col("team_id"), col("start_x"), col("start_y"),
      col("end_x") - col("start_x"), col("end_y") - col("start_y"), 0)

    val isPass = col("type_name").isin(passLike: _*)
    val isShot = col("type_name").isin(shotLike: _*)
    val zero = lit(0.0)
    val extra =
      when(isPass && col("result_name") === "success" &&
          nextTeam === col("team_id"),
        atom(lit("receival"), id("receival"), nextPlayer, col("team_id"),
          col("end_x"), col("end_y"), zero, zero, 1))
      .when(isPass && col("result_name") === "fail" &&
          nextTeam.isNotNull && nextTeam =!= col("team_id"),
        atom(lit("interception"), id("interception"), nextPlayer, nextTeam,
          col("end_x"), col("end_y"), zero, zero, 1))
      .when(isPass && col("result_name") === "fail",
        atom(lit("out"), id("out"), col("player_id"), col("team_id"),
          col("end_x"), col("end_y"), zero, zero, 1))
      .when(isPass && col("result_name") === "offside",
        atom(lit("offside"), id("offside"), col("player_id"), col("team_id"),
          col("end_x"), col("end_y"), zero, zero, 1))
      .when(isShot && col("result_name") === "success",
        atom(lit("goal"), id("goal"), col("player_id"), col("team_id"),
          col("end_x"), col("end_y"), zero, zero, 1))
      .when(isShot && col("result_name") === "owngoal",
        atom(lit("owngoal"), id("owngoal"), col("player_id"), col("team_id"),
          col("end_x"), col("end_y"), zero, zero, 1))
      .when(col("result_name") === "yellow_card",
        atom(lit("yellow_card"), id("yellow_card"), col("player_id"),
          col("team_id"), col("end_x"), col("end_y"), zero, zero, 1))
      .when(col("result_name") === "red_card",
        atom(lit("red_card"), id("red_card"), col("player_id"),
          col("team_id"), col("end_x"), col("end_y"), zero, zero, 1))
      .otherwise(lit(null))

    val exploded = actions
      .withColumn("_atoms", array_compact(array(base, extra)))
      .select(col("game_id"), col("event_id"), col("action_idx"),
        col("period_id"), col("time_seconds"), col("home_team_id"),
        col("bodypart_id"), col("bodypart_name"),
        explode(col("_atoms")).as("a"))
      .select(col("game_id"), col("event_id"), col("action_idx"),
        col("period_id"), col("time_seconds"), col("home_team_id"),
        col("a.type_id"), col("a.type_name"), col("a.player_id"),
        col("a.team_id"), col("a.x"), col("a.y"), col("a.dx"), col("a.dy"),
        col("a.sub_idx"), col("bodypart_id"), col("bodypart_name"))

    val wa = Window.partitionBy("game_id")
      .orderBy(col("action_idx"), col("sub_idx"))
    exploded
      .withColumn("atomic_idx", row_number().over(wa))
      .drop("sub_idx")
  }
}
