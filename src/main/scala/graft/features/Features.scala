package graft.features

import graft.model.SpadlConfig
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lag-window ML features + lead-window labels over SPADL actions — pure
  * Catalyst window expressions (one shuffle by game_id, then everything
  * stays inside whole-stage codegen).
  *
  * The exact feature set is fixed by the reference's in-repo builder
  * /root/reference/R/features_old.R:7-119 (SURVEY.md §2.5 W7, §2.7 F13-F15),
  * with its quirks replicated verbatim:
  *  - Q5: `bodypart_id_*` and `result_id_*` lag features are computed from
  *    `type_id` (features_old.R:29-33).
  *  - Q6: goal angles use atan(dy/dx) with absolute distances — NaN on the
  *    goal spot, pi/2 on the goal line (features_old.R:207,226).
  *  - the feature frame re-flips coordinates for `team_id != home_team_id`
  *    (features_old.R:153-169) even though conversion already normalized
  *    direction-of-play: replicated.
  *  - `time_seconds` features use `minute*60 + second`, NOT the SPADL
  *    `time_seconds` column (features_old.R:258,332) — they differ on
  *    synthesized dribbles, whose minute/second are copied from the next
  *    action while time_seconds is the pair midpoint (R/opta_spadl.R:170).
  *
  * Labels (lead windows, k=9 -> 10 actions incl. current) follow
  * /root/reference/R/labels_old.R:18-51 with SQL ternary-logic OR matching
  * R's `|` NA semantics exactly, so `na.drop` removes the same rows.
  */
object Features {

  private val w = Window.partitionBy("game_id").orderBy("action_idx")

  /** a0/a1/a2 lag triple of an expression. */
  private def lag3(c: Column, name: String): Seq[(String, Column)] = Seq(
    s"${name}_a0" -> c,
    s"${name}_a1" -> lag(c, 1).over(w),
    s"${name}_a2" -> lag(c, 2).over(w)
  )

  /** Feature-frame coordinates: re-flip for team != home
    * (features_old.R:153-169).
    */
  def featCoord(xy: Column, fieldDim: Double, isAway: Column): Column =
    when(isAway, lit(fieldDim) - xy).otherwise(xy)

  /** Adds the full feature+label frame. Input: SPADL action columns.
    * Output columns are all cast to double like the reference's
    * `dt[, lapply(.SD, as.numeric)]` (R/spadl.R:97), keyed by
    * (game_id, event_id, action_idx).
    */
  def trainingFrame(actions: DataFrame, withLabels: Boolean = true): DataFrame = {
    val flip = col("team_id") =!= col("home_team_id")
    val sx = featCoord(col("start_x"), SpadlConfig.FieldLength, flip)
    val sy = featCoord(col("start_y"), SpadlConfig.FieldWidth, flip)
    val ex = featCoord(col("end_x"), SpadlConfig.FieldLength, flip)
    val ey = featCoord(col("end_y"), SpadlConfig.FieldWidth, flip)

    def distX(x: Column) = abs(lit(SpadlConfig.GoalX) - x)
    def distY(y: Column) = abs(lit(SpadlConfig.GoalY) - y)
    def dist(x: Column, y: Column) =
      sqrt(distX(x) * distX(x) + distY(y) * distY(y))
    // Q6: R computes atan(dy/dx); dx=0 -> atan(Inf)=pi/2, 0/0 -> NaN.
    // Guarded explicitly so ANSI mode (Spark 4 default) can't throw.
    def angle(x: Column, y: Column) =
      when(distX(x) === 0.0 && distY(y) === 0.0, lit(Double.NaN))
        .when(distX(x) === 0.0, lit(math.Pi / 2))
        .otherwise(atan(distY(y) / distX(x)))

    val timeSec = col("minute") * 60 + col("second") // NOT time_seconds
    val timeOverall = (col("period_id") - 1) * 2700 + timeSec

    val isGoal = col("type_name").contains("shot") &&
      col("result_name") === "success"
    val isOwngoal = col("type_name").contains("shot") &&
      col("result_name") === "owngoal"
    val teamA = first(col("team_id")).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val teamIsA = col("team_id") === teamA
    val goalsA = (isGoal && teamIsA) || (isOwngoal && !teamIsA)
    val goalsB = (isGoal && !teamIsA) || (isOwngoal && teamIsA)
    def cumBefore(c: Column) = coalesce(
      sum(c.cast("int")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0))
    val gsA = cumBefore(goalsA)
    val gsB = cumBefore(goalsB)
    val gsTeam = when(teamIsA, gsA).otherwise(gsB)
    val gsOpp = when(teamIsA, gsB).otherwise(gsA)

    val cols = scala.collection.mutable.ArrayBuffer.empty[(String, Column)]
    cols ++= lag3(col("type_id"), "type_id")
    cols ++= lag3(col("type_id"), "bodypart_id") // Q5
    cols ++= lag3(col("type_id"), "result_id") // Q5
    cols ++= lag3(sx, "start_x")
    cols ++= lag3(sy, "start_y")
    cols ++= lag3(ex, "end_x")
    cols ++= lag3(ey, "end_y")
    SpadlConfig.actiontypes.map(_._2).distinct.foreach { n =>
      cols ++= lag3(col("type_name") === n, s"type_$n")
    }
    SpadlConfig.bodyparts.map(_._2).foreach { n =>
      cols ++= lag3(col("bodypart_name") === n, s"bodypart_$n")
    }
    SpadlConfig.results.map(_._2).foreach { n =>
      cols ++= lag3(col("result_name") === n, s"result_$n")
    }
    cols ++= lag3(dist(sx, sy), "start_dist_to_goal")
    cols ++= lag3(angle(sx, sy), "start_angle_to_goal")
    cols ++= lag3(dist(ex, ey), "end_dist_to_goal")
    cols ++= lag3(angle(ex, ey), "end_angle_to_goal")
    cols += "team_1" -> (col("team_id") === lag(col("team_id"), 1).over(w))
    cols += "team_2" -> (col("team_id") === lag(col("team_id"), 2).over(w))
    cols ++= lag3(ex - sx, "dx")
    cols ++= lag3(ey - sy, "dy")
    cols ++= lag3(sqrt((ex - sx) * (ex - sx) + (ey - sy) * (ey - sy)), "movement")
    cols += "time_delta_1" -> (timeSec - lag(timeSec, 1).over(w))
    cols += "time_delta_2" -> (timeSec - lag(timeSec, 2).over(w))
    // space deltas: previous end - current start (features_old.R:272-303)
    cols += "dx_a01" -> (lag(ex, 1).over(w) - sx)
    cols += "dy_a01" -> (lag(ey, 1).over(w) - sy)
    cols += "dx_a02" -> (lag(ex, 2).over(w) - sx)
    cols += "dy_a02" -> (lag(ey, 2).over(w) - sy)
    cols += "mov_a01" -> sqrt(
      (lag(ex, 1).over(w) - sx) * (lag(ex, 1).over(w) - sx) +
        (lag(ey, 1).over(w) - sy) * (lag(ey, 1).over(w) - sy))
    cols += "mov_a02" -> sqrt(
      (lag(ex, 2).over(w) - sx) * (lag(ex, 2).over(w) - sx) +
        (lag(ey, 2).over(w) - sy) * (lag(ey, 2).over(w) - sy))
    cols += "goalscore_team" -> gsTeam
    cols += "goalscore_opponent" -> gsOpp
    cols += "goalscore_diff" -> (gsTeam - gsOpp)
    cols ++= lag3(col("period_id"), "period_id")
    cols ++= lag3(timeSec, "time_seconds")
    cols ++= lag3(timeOverall, "time_seconds_overall")

    if (withLabels) {
      // labels_old.R:18-51 — SQL OR's ternary logic == R's `|` NA logic
      val scores = (1 to 9).foldLeft(isGoal: Column) { (acc, k) =>
        acc ||
          (lag(isGoal, -k).over(w) &&
            (lag(col("team_id"), -k).over(w) === col("team_id"))) ||
          (lag(isOwngoal, -k).over(w) &&
            (lag(col("team_id"), -k).over(w) =!= col("team_id")))
      }
      val concedes = (1 to 9).foldLeft(isOwngoal: Column) { (acc, k) =>
        acc || lag(isOwngoal, -k).over(w)
      }
      cols += "scores" -> scores
      cols += "concedes" -> concedes
    }

    // ONE projection (a withColumn loop would stack ~165 Projects and make
    // analysis quadratic); every feature cast to double like the reference's
    // all-numeric coercion. na.drop treats NaN as missing, matching R's
    // is.na(NaN) == TRUE (model_data.R:23).
    val keyed = Seq("game_id", "event_id", "action_idx").map(col) ++
      cols.map { case (n, c) => c.cast("double").as(n) }
    actions.select(keyed: _*).na.drop()
  }

  /** SPADL columns excluded from the numeric cast / NA-drop key set. */
  private val keyCols: Set[String] = Set(
    "game_id", "event_id", "action_idx", "period_id", "minute", "second",
    "time_seconds", "player_id", "team_id", "home_team_id", "side",
    "start_x", "start_y", "end_x", "end_y", "type_id", "type_name",
    "result_id", "result_name", "bodypart_id", "bodypart_name",
    "assist", "keypass")
}
