package graft.convert

import graft.model.{InstatConfig => IC, SpadlConfig => SC}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The InStat events -> SPADL conversion as PURE Catalyst expressions — the
  * declarative twin of [[InstatGameConverter]] (property-tested bitwise-
  * equal in BatchEquivalenceSpec), mirroring what [[OptaConvertBatch]] is
  * to [[OptaGameConverter]]. Reference: /root/reference/R/instat_spadl.R:39-510.
  *
  * Shape: the reference's 14 extractor passes become ONE per-row tag-array
  * (each event emits 0..n `(rank, type_name)` structs; rank = the rbind
  * position of the extractor, so `ORDER BY (time, rank, seq)` reproduces
  * the stable sort of the concatenated frames exactly), exploded once.
  * All lookaheads are window leads; every window partitions by game_id, so
  * the whole plan is ONE exchange + stacked window passes in codegen.
  *
  * The quirks survive the translation:
  *  - Q3 (action 21000 in both take_on and dribble extractors): two array
  *    slots with ranks 9 and 10.
  *  - Q4 (`events[-nrow]` / `events[-2]` result frames): `pos < m` drop +
  *    a pos==1 self-compare branch in the offside rule.
  *  - freekick misaligned-predecessor filter (R/instat_spadl.R:237-245):
  *    candidate c_t emits iff the row before candidate c_{t+shift} is not
  *    ball-out/match-status, where shift = 2 when the game's first
  *    candidate sits at row 0 (R drops the 0 index) else 1. The
  *    "predecessor-ok of the next candidate" is a conditional
  *    first-over-following window, stacked twice for shift 2 — no join,
  *    no second exchange.
  */
object InstatConvertBatch {

  private val actionIdByNameExpr: Column = typedLit(SC.actionIdByName)
  private val resultIdByNameExpr: Column = typedLit(SC.resultIdByName)
  private val bodypartByIdExpr: Column = typedLit(IC.bodypartByBodyId)

  /** raw InStat event rows (SpadlPipeline.decodeInstatEvents) -> SPADL. */
  def toSpadl(raw: DataFrame): DataFrame = {
    val L = SC.FieldLength
    val Wd = SC.FieldWidth

    val wSeq = Window.partitionBy("game_id").orderBy("seq")
    val wGame = Window.partitionBy("game_id")
    val wFollow = wSeq.rowsBetween(1, Window.unboundedFollowing)

    // ---- full-frame neighbours (original document order) ----
    val isFkCand = (col("standart_id") === IC.StdDirectFreekick ||
      col("standart_id") === IC.StdIndirectFreekick) &&
      col("attack_status_id") === 1
    val prevGat = lag(col("generic_action_type_id"), 1).over(wSeq)
    val step1 = raw
      .withColumn("is_fk_cand", isFkCand)
      // pred_ok(c): the row before candidate c is not ball-out/match-status
      .withColumn("pred_ok", prevGat.isNotNull &&
        prevGat =!= IC.GatBallOut && prevGat =!= IC.GatMatchStatus)
      .withColumn("next_name1",
        coalesce(lead(col("action_name"), 1).over(wSeq), lit("")))
      .withColumn("next_name2",
        coalesce(lead(col("action_name"), 2).over(wSeq), lit("")))
    // nc1 at candidate c_t = pred_ok(c_{t+1}); nc2 = pred_ok(c_{t+2})
    val step2 = step1.withColumn("nc1",
      first(when(col("is_fk_cand"), col("pred_ok")), ignoreNulls = true)
        .over(wFollow))
    val step3 = step2
      .withColumn("nc2",
        first(when(col("is_fk_cand"), col("nc1")), ignoreNulls = true)
          .over(wFollow))
      .withColumn("first_cand_seq",
        min(when(col("is_fk_cand"), col("seq"))).over(wGame))

    val fkEmit = col("is_fk_cand") && coalesce(
      when(col("first_cand_seq") === 0, col("nc2")).otherwise(col("nc1")),
      lit(false))
    val fkType =
      when(col("generic_action_type_id") === IC.GatShot, "shot_freekick")
        .when(col("next_name1").contains("cross") ||
          col("next_name2").contains("cross"), "freekick_crossed")
        .otherwise("freekick_short")

    // ---- extractor tags (ranks = rbind order, R/instat_spadl.R:44-63) ----
    val isFkShotExcl = col("standart_id") === IC.StdDirectFreekick
    val isCorner = col("standart_id") === IC.StdCorner
    val isPenalty = col("standart_id") === IC.StdPenalty
    val isShot = col("generic_action_type_id") === IC.GatShot
    val isGoal = col("action_id") === IC.AGoal
    def tag(rank: Int, tn: Column): Column =
      struct(lit(rank).as("rank"), tn.as("type_name"))
    val tags = array(
      when(!isFkShotExcl && !isCorner && !isPenalty && (isShot || isGoal),
        tag(1, lit("shot"))),
      when(isPenalty && (isShot || isGoal), tag(2, lit("shot_penalty"))),
      when(fkEmit, tag(3, fkType)),
      when(isCorner && col("attack_status_id") === 1,
        tag(4, when(col("next_name1").contains("cross"), "corner_crossed")
          .otherwise("corner_short"))),
      when(col("action_id").isin(IC.ATackle1, IC.ATackle2),
        tag(5, lit("tackle"))),
      when(col("standart_id") === IC.StdThrowIn, tag(6, lit("throw_in"))),
      when(col("action_id") === IC.AInterception, tag(7, lit("interception"))),
      when(col("standart_id") === IC.StdOpenPlay &&
        col("generic_action_type_id") === IC.GatPass, tag(8, lit("pass"))),
      when(col("action_id") === IC.ADribble, tag(9, lit("take_on"))), // Q3
      when(col("action_id") === IC.ADribble, tag(10, lit("dribble"))), // Q3
      when(col("action_id").isin(IC.AKeeperSave1, IC.AKeeperSave2),
        tag(11, lit("keeper_save"))),
      when(col("action_id") === IC.AKeeperPickUp &&
        col("position_id") === IC.GkPositionId, tag(12, lit("keeper_pick_up"))),
      when(col("action_id") === IC.AClearance, tag(13, lit("clearance"))),
      when(col("action_id") === IC.ABadTouch, tag(14, lit("bad_touch"))))
    val tagsC = array_compact(tags)
    // rbind(non_action_events, spadl_events): unclaimed rows -> rank 0
    val tagsFinal = when(size(tagsC) === 0,
      array(tag(0, lit("non_action")))).otherwise(tagsC)

    val tis = when(col("half") === 2, col("second") + 2700.0)
      .otherwise(col("second"))
    val sideC = when(col("team_id") === col("home_team_id"), "home")
      .otherwise("away")

    val tagged = step3
      .withColumn("tis", tis)
      .withColumn("side", sideC)
      .select(col("*"), explode(tagsFinal).as("tg"))
      .withColumn("tag_rank", col("tg.rank"))
      .withColumn("type_name", col("tg.type_name"))
      .drop("tg")

    // ---- stable sort + Q4 result attribution (R/instat_spadl.R:432-489)
    val wSort = Window.partitionBy("game_id")
      .orderBy(col("tis"), col("tag_rank"), col("seq"))
    val sortedF = tagged
      .withColumn("pos", row_number().over(wSort))
      .withColumn("m", count(lit(1)).over(wGame))
      .withColumn("nxt_player", lead(col("player_id"), 1).over(wSort))
      .withColumn("nxt_action", lead(col("action_id"), 1).over(wSort))
      .withColumn("nxt_second", lead(col("second"), 1).over(wSort))

    // assignments run yellow -> red -> offside -> goal -> owngoal ->
    // success-override with later-wins; a reversed when-chain is equivalent
    val samePlayerNext = col("nxt_player") === col("player_id")
    val resultName =
      when(!col("type_name").isin("shot", "foul", "offside") &&
        col("outcome"), "success")
        .when(col("action_id") === IC.AOwngoal, "owngoal")
        .when(col("action_id") === IC.AGoal, "success")
        .when(when(col("pos") === 1, col("action_id") === IC.AOffside)
          .otherwise(col("nxt_action") === IC.AOffside &&
            (col("nxt_second") - col("second")) < 10), "offside")
        .when(samePlayerNext && col("nxt_action") === IC.ARedCard, "red_card")
        .when(samePlayerNext && col("nxt_action") === IC.AYellowCard,
          "yellow_card")
        .otherwise("fail")

    val kept = sortedF
      .withColumn("result_name", resultName)
      .filter(col("pos") < col("m")) // Q4: last sorted row dropped
      .filter(col("type_name") =!= "non_action")

    // ---- away flip (F2) on raw metre coordinates ----
    val away = col("side") === "away"
    val f1 = kept
      .withColumn("fsx", when(away, lit(L) - col("pos_x")).otherwise(col("pos_x")))
      .withColumn("fsy", when(away, lit(Wd) - col("pos_y")).otherwise(col("pos_y")))
      .withColumn("fex", when(away, lit(L) - col("pos_dest_x")).otherwise(col("pos_dest_x")))
      .withColumn("fey", when(away, lit(Wd) - col("pos_dest_y")).otherwise(col("pos_dest_y")))

    // ---- W2 clearance end := next (filtered) row's start ----
    val wF = Window.partitionBy("game_id").orderBy("pos")
    val f2 = f1
      .withColumn("cex", when(col("type_name") === "clearance",
        lead(col("fsx"), 1).over(wF)).otherwise(col("fex")))
      .withColumn("cey", when(col("type_name") === "clearance",
        lead(col("fsy"), 1).over(wF)).otherwise(col("fey")))

    // ---- W3 end-position fill (R/instat_spadl.R:84-112) ----
    val bothNa = col("cex").isNull && col("cey").isNull
    val sameStart = col("type_name").isin("tackle", "interception",
      "bad_touch", "take_on", "keeper_pick_up", "keeper_save")
    val nextStart = col("type_name").isin("dribble", "clearance",
      "freekick_short", "throw_in", "corner_short")
    val nsx = lead(col("fsx"), 1).over(wF)
    val nsy = lead(col("fsy"), 1).over(wF)
    val isLastRow = nsx.isNull // starts are never null
    def fill(start: Column, next: Column, cur: Column): Column =
      when(bothNa && sameStart, start)
        .when(bothNa && nextStart && !isLastRow, next)
        .when(bothNa && isLastRow, start) // final-row fill
        .otherwise(cur)

    val minuteOut = (col("tis") / 60).cast("int")
    val secondOut = (col("tis") % 60).cast("int")
    val bp = element_at(bodypartByIdExpr, col("body_id"))

    f2.withColumn("action_idx", row_number().over(wF))
      .select(col("game_id"), col("id").cast("double").as("event_id"),
        col("action_idx"),
        col("half").as("period_id"), minuteOut.as("minute"),
        secondOut.as("second"), col("tis").as("time_seconds"),
        col("player_id"), col("team_id"), col("home_team_id"), col("side"),
        col("fsx").as("start_x"), col("fsy").as("start_y"),
        coalesce(fill(col("fsx"), nsx, col("cex")), lit(Double.NaN)).as("end_x"),
        coalesce(fill(col("fsy"), nsy, col("cey")), lit(Double.NaN)).as("end_y"),
        element_at(actionIdByNameExpr, col("type_name")).as("type_id"),
        col("type_name"),
        element_at(resultIdByNameExpr, col("result_name")).as("result_id"),
        col("result_name"),
        coalesce(bp.getField("_1"), lit(0)).as("bodypart_id"),
        coalesce(bp.getField("_2"), lit("foot")).as("bodypart_name"),
        lit(false).as("assist"), lit(false).as("keypass"))
  }
}
