package graft.convert

import graft.model._
import scala.collection.mutable.ArrayBuffer

/** Per-game InStat events -> SPADL conversion core (pure Scala, no Spark).
  *
  * Replicates /root/reference/R/instat_spadl.R:39-510 rule-for-rule,
  * including the quirks pinned in SURVEY.md §7.5:
  *  - Q3: action_id == 21000 is matched by BOTH the take_on and dribble
  *    extractors (R/instat_spadl.R:273-282,374-384) => the event is emitted
  *    twice with two type_names.
  *  - Q4: `.result_type_name` returns `events[-nrow(events),]` => the last
  *    event of every game (in sorted order) is dropped; its "second next"
  *    frame is `events[-2,]` (row-2 DELETION, not a shift), so the offside
  *    check compares row i against row i+1 for i >= 2 and row 1 against
  *    itself (R/instat_spadl.R:434-436,462-467).
  *  - The freekick extractor's misaligned predecessor test
  *    (R/instat_spadl.R:237-245): freekick j (of the 1..n-1 first raw
  *    freekicks) is kept iff the event preceding freekick j+1 is not
  *    ball-out(27)/match-status(18); a freekick at row 1 shifts the
  *    alignment further (R zero-index drop). The last raw freekick is never
  *    emitted.
  *
  * The direction flip (R/instat_spadl.R:492-499) and clearance fix (502-510)
  * reference `start_x`/`end_x` columns that only exist *after* the later
  * rename (R/instat_spadl.R:140-151); we implement the documented intent
  * (SURVEY.md §2 F2/W2): flip `pos_*` for away rows, then clearance end :=
  * next row's (flipped) start.
  */
object InstatGameConverter {
  import SpadlConfig._
  import InstatConfig._

  /** One working row: the raw event + extractor tag + mutable result. */
  private final case class Tagged(
      ev: InstatRawEvent,
      origIdx: Int, // 0-based position in the ORIGINAL document order
      time_in_seconds: Double,
      side: String,
      type_name: String,
      result_name: String)

  def convert(gameId: Int, homeTeamId: Int,
      events: Seq[InstatRawEvent]): Vector[SpadlAction] = {
    if (events.isEmpty) return Vector.empty
    val evs = events.toVector
    val n = evs.length

    def tis(e: InstatRawEvent): Double =
      if (e.half == 2) e.second + 2700.0 else e.second
    def side(e: InstatRawEvent): String =
      if (e.team_id == homeTeamId) "home" else "away"
    def mk(i: Int, tn: String): Tagged =
      Tagged(evs(i), i, tis(evs(i)), side(evs(i)), tn, "fail")

    // ---- extractors (R/instat_spadl.R:161-429), rbind order preserved ----
    val tagged = ArrayBuffer.empty[Tagged]

    // .get_shots: non-set-piece shots/goals, then penalty shots appended
    val isFk = evs.map(e => e.standart_id == StdDirectFreekick)
    val isCorner = evs.map(e => e.standart_id == StdCorner)
    val isPenalty = evs.map(e => e.standart_id == StdPenalty)
    val isShot = evs.map(e => e.generic_action_type_id == GatShot)
    val isGoal = evs.map(e => e.action_id == AGoal)
    for (i <- 0 until n
         if !isFk(i) && !isCorner(i) && !isPenalty(i) && (isShot(i) || isGoal(i)))
      tagged += mk(i, "shot")
    for (i <- 0 until n if isPenalty(i) && (isShot(i) || isGoal(i)))
      tagged += mk(i, "shot_penalty")

    // .get_freekick — misaligned predecessor filter, replicated verbatim
    val fkIdx: Vector[Int] = (0 until n).filter { i =>
      val s = evs(i).standart_id
      (s == StdDirectFreekick || s == StdIndirectFreekick) &&
        evs(i).attack_status_id == 1
    }.toVector
    // events[freekick_idx - 1, ]: R silently drops a 0 index
    val prevList: Vector[Int] = fkIdx.map(_ - 1).filter(_ >= 0)
    val prevDropFirst = prevList.drop(1)
    val keptFkPositions: Vector[Int] = prevDropFirst.zipWithIndex.collect {
      case (p, j) if {
        val g = evs(p).generic_action_type_id
        g != GatBallOut && g != GatMatchStatus
      } => j
    }.toVector
    // raw_freekick_events[is_real_freekick_idx] — positions index fkIdx
    val fkRows: Vector[Int] =
      keptFkPositions.collect { case j if j < fkIdx.length => fkIdx(j) }
    for (i <- fkRows) {
      // type refinement: crossed via next / 2nd-next in ORIGINAL order
      // (rownames-based lookahead, R/instat_spadl.R:253-268)
      def nameAt(k: Int): String =
        if (k >= 0 && k < n) evs(k).action_name else ""
      val crossed = nameAt(i + 1).contains("cross") || nameAt(i + 2).contains("cross")
      val tn =
        if (evs(i).generic_action_type_id == GatShot) "shot_freekick"
        else if (crossed) "freekick_crossed"
        else "freekick_short"
      tagged += mk(i, tn)
    }

    // .get_corners
    for (i <- 0 until n
         if evs(i).standart_id == StdCorner && evs(i).attack_status_id == 1) {
      val crossed =
        i + 1 < n && evs(i + 1).action_name.contains("cross")
      tagged += mk(i, if (crossed) "corner_crossed" else "corner_short")
    }

    // .get_tackles
    for (i <- 0 until n
         if evs(i).action_id == ATackle1 || evs(i).action_id == ATackle2)
      tagged += mk(i, "tackle")
    // .get_throw_in
    for (i <- 0 until n if evs(i).standart_id == StdThrowIn)
      tagged += mk(i, "throw_in")
    // .get_interceptions
    for (i <- 0 until n if evs(i).action_id == AInterception)
      tagged += mk(i, "interception")
    // .get_pass
    for (i <- 0 until n
         if evs(i).standart_id == StdOpenPlay &&
           evs(i).generic_action_type_id == GatPass)
      tagged += mk(i, "pass")
    // .get_take_on then .get_dribbles — Q3: both match 21000
    for (i <- 0 until n if evs(i).action_id == ADribble)
      tagged += mk(i, "take_on")
    for (i <- 0 until n if evs(i).action_id == ADribble)
      tagged += mk(i, "dribble")
    // .get_keeper_save
    for (i <- 0 until n
         if evs(i).action_id == AKeeperSave1 || evs(i).action_id == AKeeperSave2)
      tagged += mk(i, "keeper_save")
    // .get_keeper_pick_up
    for (i <- 0 until n
         if evs(i).action_id == AKeeperPickUp && evs(i).position_id == GkPositionId)
      tagged += mk(i, "keeper_pick_up")
    // .get_clearance
    for (i <- 0 until n if evs(i).action_id == AClearance)
      tagged += mk(i, "clearance")
    // .get_bad_touch
    for (i <- 0 until n if evs(i).action_id == ABadTouch)
      tagged += mk(i, "bad_touch")

    // rbind(non_action_events, spadl_events) (R/instat_spadl.R:66-70)
    val claimedIds = tagged.map(_.ev.id).toSet
    val nonAction = (0 until n).filterNot(i => claimedIds.contains(evs(i).id))
      .map(i => mk(i, "non_action"))
    val combined: Vector[Tagged] = (nonAction ++ tagged).toVector

    // stable sort by time_in_seconds (R/instat_spadl.R:73)
    val sorted = combined.sortBy(_.time_in_seconds)
    val m = sorted.length
    if (m == 0) return Vector.empty

    // ---- .result_type_name (R/instat_spadl.R:432-489, Q4) ----
    // actions_ = sorted[0 .. m-2]; assignments applied IN ORDER (later wins)
    val res = Array.fill(m - 1)("fail")
    for (i <- 0 until m - 1) {
      val cur = sorted(i); val nxt = sorted(i + 1)
      val samePlayer = cur.ev.player_id == nxt.ev.player_id
      if (samePlayer && nxt.ev.action_id == AYellowCard) res(i) = "yellow_card"
    }
    for (i <- 0 until m - 1) {
      val cur = sorted(i); val nxt = sorted(i + 1)
      val samePlayer = cur.ev.player_id == nxt.ev.player_id
      if (samePlayer && nxt.ev.action_id == ARedCard) res(i) = "red_card"
    }
    // second_next_actions_ = events[-2,]: row i (1-based) maps to row 1 for
    // i=1 and row i+1 for i>=2
    for (i <- 0 until m - 1) {
      val snd = if (i == 0) sorted(0) else sorted(i + 1)
      if (snd.ev.action_id == AOffside &&
          snd.ev.second - sorted(i).ev.second < 10) res(i) = "offside"
    }
    // goal/owngoal indices computed on the FULL frame, applied to the n-1
    // frame; an index == m-1 would extend the R frame — fixtures never
    // place goals at the last sorted row, so we guard instead.
    for (i <- 0 until m if sorted(i).ev.action_id == AGoal && i < m - 1)
      res(i) = "success"
    for (i <- 0 until m if sorted(i).ev.action_id == AOwngoal && i < m - 1)
      res(i) = "owngoal"
    // success override runs LAST (R/instat_spadl.R:481-486)
    for (i <- 0 until m - 1) {
      val tn = sorted(i).type_name
      if (!(tn == "shot" || tn == "foul" || tn == "offside") &&
          sorted(i).ev.outcome) res(i) = "success"
    }
    // Q4: last sorted row dropped
    val withRes: Vector[Tagged] = (0 until m - 1).map { i =>
      sorted(i).copy(result_name = res(i))
    }.toVector

    // filter non_action (R/instat_spadl.R:75)
    val acts0 = withRes.filter(_.type_name != "non_action")
    if (acts0.isEmpty) return Vector.empty

    // direction flip for away rows (intent of R/instat_spadl.R:492-499)
    final case class Pos(sx: Double, sy: Double,
        ex: Option[Double], ey: Option[Double])
    val flipped: Vector[(Tagged, Pos)] = acts0.map { t =>
      val e = t.ev
      if (t.side == "away")
        (t, Pos(FieldLength - e.pos_x, FieldWidth - e.pos_y,
          e.pos_dest_x.map(FieldLength - _), e.pos_dest_y.map(FieldWidth - _)))
      else (t, Pos(e.pos_x, e.pos_y, e.pos_dest_x, e.pos_dest_y))
    }

    // clearance end := next row's start (intent of R/instat_spadl.R:502-510)
    val cleared: Vector[(Tagged, Pos)] = flipped.zipWithIndex.map {
      case ((t, p), i) =>
        if (t.type_name == "clearance") {
          val nxt = if (i + 1 < flipped.length) Some(flipped(i + 1)._2) else None
          (t, p.copy(ex = nxt.map(_.sx), ey = nxt.map(_.sy)))
        } else (t, p)
    }

    // .fix_end_action_position (R/instat_spadl.R:84-112)
    val sameStartSet = Set("tackle", "interception", "bad_touch", "take_on",
      "keeper_pick_up", "keeper_save")
    val nextStartSet = Set("dribble", "clearance", "freekick_short",
      "throw_in", "corner_short")
    val k = cleared.length
    val fixed: Vector[(Tagged, Pos)] = cleared.zipWithIndex.map {
      case ((t, p), i) =>
        val bothNa = p.ex.isEmpty && p.ey.isEmpty
        val p2 =
          if (bothNa && sameStartSet.contains(t.type_name))
            p.copy(ex = Some(p.sx), ey = Some(p.sy))
          else if (bothNa && nextStartSet.contains(t.type_name) && i + 1 < k)
            p.copy(ex = Some(cleared(i + 1)._2.sx), ey = Some(cleared(i + 1)._2.sy))
          else p
        (t, p2)
    }
    val lastFixed =
      if (fixed.nonEmpty && fixed.last._2.ex.isEmpty && fixed.last._2.ey.isEmpty) {
        val (t, p) = fixed.last
        fixed.init :+ (t, p.copy(ex = Some(p.sx), ey = Some(p.sy)))
      } else fixed

    // .instat_to_spadl_columns + final schema
    lastFixed.zipWithIndex.map { case ((t, p), i) =>
      val e = t.ev
      val seconds = (t.time_in_seconds % 60).toInt
      val minutes = (t.time_in_seconds / 60).toInt
      val (bpId, bpName) =
        bodypartByBodyId.getOrElse(e.body_id, (0, "foot"))
      SpadlAction(
        game_id = gameId, event_id = e.id.toDouble, action_idx = i + 1,
        period_id = e.half, minute = minutes, second = seconds,
        time_seconds = t.time_in_seconds,
        player_id = e.player_id, team_id = e.team_id,
        home_team_id = homeTeamId, side = t.side,
        start_x = p.sx, start_y = p.sy,
        end_x = p.ex.getOrElse(Double.NaN), end_y = p.ey.getOrElse(Double.NaN),
        type_id = actionIdByName(t.type_name), type_name = t.type_name,
        result_id = resultIdByName(t.result_name), result_name = t.result_name,
        bodypart_id = bpId, bodypart_name = bpName,
        assist = false, keypass = false)
    }
  }
}
