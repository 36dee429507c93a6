package graft.convert

import graft.model.{OptaConfig, SpadlConfig}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Opta events -> SPADL conversion as PURE Catalyst expressions — the
  * declarative twin of [[OptaGameConverter]] (property-tested bitwise-equal
  * in BatchEquivalenceSpec). Every reference rule becomes a window/`when`
  * expression, so the whole plan is one exchange by game + window passes
  * inside whole-stage codegen; the reference's O(n^2) recursive next-event
  * parse (R/opta_spadl.R:132-135) is a lead() here.
  *
  * Rule map (SURVEY.md §2): W1 sort = window order; P1 period filter; J2
  * type_table = literal map lookup; F1 scale; F7 bodypart via map_keys
  * overlap; F8/F9 classification `when` chains (priority order preserved);
  * F3 owngoal flip; F2 away flip; W2 clearance end := lead(start); P2
  * non-action filter; W4 dribble synthesis = lead-pair condition + exploded
  * struct pair; stable rbind+re-sort = order by (period, time, is_dribble,
  * original position).
  */
object OptaConvertBatch {

  private val typeNameByIdExpr: Column =
    typedLit(OptaConfig.typeTable)

  private val actionIdByNameExpr: Column =
    typedLit(SpadlConfig.actionIdByName)

  private val resultIdByNameExpr: Column =
    typedLit(SpadlConfig.resultIdByName)

  /** raw Opta event rows (SpadlPipeline.decodeOptaEvents) -> SPADL rows. */
  def toSpadl(raw: DataFrame): DataFrame = {
    val L = SpadlConfig.FieldLength
    val W = SpadlConfig.FieldWidth

    // J2: event name from the literal type table ("unknown" when absent)
    val eventName = coalesce(
      element_at(typeNameByIdExpr, col("type_id")), lit("unknown"))

    val qualKeys = map_keys(col("qualifiers"))
    def hasQ(k: String): Column = array_contains(qualKeys, k)

    // F8 action-type chain (R/opta_spadl.R:229-283) — order-sensitive
    val typeName = {
      when(eventName.isin(OptaConfig.actionTypes.toSeq: _*),
        element_at(typedLit(OptaConfig.directTypeMap), eventName))
        .when(eventName.isin(OptaConfig.actionPass.toSeq: _*),
          when(hasQ(OptaConfig.QThrowIn), "throw_in")
            .when(hasQ(OptaConfig.QCorner) && hasQ(OptaConfig.QCross),
              "corner_crossed")
            .when(hasQ(OptaConfig.QFreekick) && hasQ(OptaConfig.QCross),
              "freekick_crossed")
            .when(hasQ(OptaConfig.QCross), "cross")
            .when(hasQ(OptaConfig.QFreekick), "freekick_short")
            .when(hasQ(OptaConfig.QCorner), "corner_short")
            .otherwise("pass"))
        .when(eventName.isin(OptaConfig.actionShots.toSeq: _*),
          when(hasQ(OptaConfig.QShotPenalty), "shot_penalty")
            .when(hasQ(OptaConfig.QShotFreekick), "shot_freekick")
            .otherwise("shot"))
        .when(eventName.isin(OptaConfig.actionTouch.toSeq: _*) &&
          !col("outcome"), "bad_touch")
        .when(eventName.isin(OptaConfig.actionFoul.toSeq: _*) &&
          !col("outcome"), "foul")
        .otherwise("non_action")
    }

    // F9 result chain (R/opta_spadl.R:297-319; Q1 goal => always success)
    val resultName =
      when(eventName === "offside pass", "offside")
        .when(eventName === "foul", "fail")
        .when(eventName.isin("attempt saved", "miss", "post"), "fail")
        .when(eventName === "goal", "success")
        .when(eventName === "ball touch", "fail")
        .when(col("outcome"), "success")
        .otherwise("fail")

    // F1 scale -> F3 owngoal flip -> F2 away flip (exact reference order)
    val sx0 = col("start_x") / 100 * L
    val sy0 = col("start_y") / 100 * W
    val ex0 = col("end_x") / 100 * L
    val ey0 = col("end_y") / 100 * W
    val og = col("result_name") === "owngoal"
    val ex1 = when(og, lit(L) - ex0).otherwise(ex0)
    val ey1 = when(og, lit(W) - ey0).otherwise(ey0)
    val away = col("side") === "away"
    def flipX(c: Column) = when(away, lit(L) - c).otherwise(c)
    def flipY(c: Column) = when(away, lit(W) - c).otherwise(c)

    // F7 bodypart
    val bodypartId =
      when(arrays_overlap(qualKeys,
        typedLit(OptaConfig.QHead.toSeq)), 1)
        .when(array_contains(qualKeys, OptaConfig.QOther), 2)
        .otherwise(0)

    val annotated = raw
      .filter(col("period_id").isin(1, 2)) // P1
      .withColumn("type_name", typeName)
      .withColumn("result_name", resultName)
      .withColumn("result_id", element_at(resultIdByNameExpr, col("result_name")))
      .withColumn("bodypart_id", bodypartId)
      .withColumn("bodypart_name",
        element_at(typedLit(SpadlConfig.bodypartNameById), col("bodypart_id")))
      .withColumn("time_seconds", lit(60.0) * col("minute") + col("second"))
      .select(col("*"),
        flipX(sx0).as("sxa"), flipY(sy0).as("sya"),
        flipX(ex1).as("exa"), flipY(ey1).as("eya"))

    // W1 total order (stable via seq) + W2 clearance end := lead(start)
    val w = Window.partitionBy("game_id")
      .orderBy("period_id", "minute", "second", "seq")
    val cleared = annotated
      .withColumn("exb",
        when(col("type_name") === "clearance" &&
          lead(col("sxa"), 1).over(w).isNotNull,
          lead(col("sxa"), 1).over(w)).otherwise(col("exa")))
      .withColumn("eyb",
        when(col("type_name") === "clearance" &&
          lead(col("sya"), 1).over(w).isNotNull,
          lead(col("sya"), 1).over(w)).otherwise(col("eya")))
      .filter(col("type_name") =!= "non_action") // P2

    // W4 dribble synthesis over the filtered sequence
    val wf = Window.partitionBy("game_id")
      .orderBy("period_id", "minute", "second", "seq")
    val pos = row_number().over(wf)
    val base = cleared
      .withColumn("orig_pos", pos)
      .withColumn("prev_team", lag(col("team_id"), 1).over(wf))
      .withColumn("prev_ex", lag(col("exb"), 1).over(wf))
      .withColumn("prev_ey", lag(col("eyb"), 1).over(wf))
      .withColumn("prev_ts", lag(col("time_seconds"), 1).over(wf))

    val dxp = col("prev_ex") - col("sxa")
    val dyp = col("prev_ey") - col("sya")
    val d2 = dxp * dxp + dyp * dyp
    val isDribblePair = col("prev_team") === col("team_id") &&
      d2 >= lit(SpadlConfig.MinDribbleLength * SpadlConfig.MinDribbleLength) &&
      d2 <= lit(SpadlConfig.MaxDribbleLength * SpadlConfig.MaxDribbleLength) &&
      (col("time_seconds") - col("prev_ts")) < lit(SpadlConfig.MaxDribbleDuration)

    def actStruct(timeS: Column, sx: Column, sy: Column, ex: Column,
        ey: Column, tn: Column, rn: Column, rid: Column, bp: Column,
        bpn: Column, drib: Int) =
      struct(col("event_id"), col("period_id"), col("minute"), col("second"),
        timeS.as("time_seconds"), col("player_id"), col("team_id"),
        col("side"), sx.as("sxa"), sy.as("sya"), ex.as("exb"),
        ey.as("eyb"), tn.as("type_name"), rn.as("result_name"),
        rid.as("result_id"), bp.as("bodypart_id"), bpn.as("bodypart_name"),
        col("assist"), col("keypass"), lit(drib).as("is_dribble"),
        col("orig_pos"))

    val mainStruct = actStruct(col("time_seconds"), col("sxa"), col("sya"),
      col("exb"), col("eyb"), col("type_name"), col("result_name"),
      col("result_id"), col("bodypart_id"), col("bodypart_name"), 0)
    // dribble = copy of the NEXT action (this row) with midpoint time,
    // prev-end start, own-start end (R/opta_spadl.R:167-187)
    val dribbleStruct = when(isDribblePair,
      actStruct(lit(0.5) * (col("prev_ts") + col("time_seconds")),
        col("prev_ex"), col("prev_ey"), col("sxa"), col("sya"),
        lit("dribble"), lit("success"),
        lit(SpadlConfig.resultIdByName("success")), lit(0), lit("foot"), 1))
      .otherwise(lit(null))

    val exploded = base
      .select(col("game_id"), col("home_team_id"),
        explode(array_compact(array(dribbleStruct, mainStruct))).as("a"))
      .select(col("game_id"), col("home_team_id"), col("a.*"))

    // stable rbind + re-sort (R/opta_spadl.R:189-190): originals before
    // dribbles at equal (period, time); both sides in original pair order
    val wOut = Window.partitionBy("game_id")
      .orderBy(col("period_id"), col("time_seconds"), col("is_dribble"),
        col("orig_pos"))
    exploded
      .withColumn("action_idx", row_number().over(wOut))
      .select(col("game_id"), col("event_id"), col("action_idx"),
        col("period_id"), col("minute"), col("second"), col("time_seconds"),
        col("player_id"), col("team_id"), col("home_team_id"), col("side"),
        col("sxa").as("start_x"), col("sya").as("start_y"),
        col("exb").as("end_x"), col("eyb").as("end_y"),
        element_at(actionIdByNameExpr, col("type_name")).as("type_id"),
        col("type_name"), col("result_id"), col("result_name"),
        col("bodypart_id"), col("bodypart_name"), col("assist"),
        col("keypass"))
  }
}
