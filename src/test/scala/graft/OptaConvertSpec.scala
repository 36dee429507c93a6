package graft

import graft.convert.OptaGameConverter
import graft.model.OptaRawEvent
import org.scalatest.funsuite.AnyFunSuite

/** Per-operator rule tests for the Opta conversion (SURVEY.md §5.2). */
class OptaConvertSpec extends AnyFunSuite {

  val Home = 10
  val Away = 20

  def ev(eventId: Int, typeId: Int, team: Int = Home, minute: Int = 0,
      second: Int = 0, period: Int = 1, outcome: Boolean = true,
      x: Double = 50.0, y: Double = 50.0, ex: Double = 60.0, ey: Double = 60.0,
      quals: Map[String, String] = Map.empty): OptaRawEvent =
    OptaRawEvent(1, eventId.toDouble, typeId, period, minute, second, team * 100,
      team, outcome, x, y, ex, ey, assist = false, keypass = false,
      side = if (team == Home) "home" else "away", home_team_id = Home,
      qualifiers = quals)

  test("coordinate scaling to 105x68 metres (F1)") {
    val out = OptaGameConverter.convert(Seq(
      ev(1, 1, x = 50, y = 50, ex = 80, ey = 25)))
    assert(out.head.start_x == 52.5 && out.head.start_y == 34.0)
    assert(out.head.end_x == 84.0 && out.head.end_y == 17.0)
  }

  test("away-side direction flip (F2)") {
    val out = OptaGameConverter.convert(Seq(
      ev(1, 1, team = Away, x = 10, y = 20, ex = 30, ey = 40)))
    val a = out.head
    assert(a.start_x == 105.0 - 10.5 && a.start_y == 68.0 - 13.6)
    assert(a.end_x == 105.0 - 31.5 && a.end_y == 68.0 - 27.2)
  }

  test("pass refinement priority chain (F8)") {
    def tn(quals: Map[String, String], outcome: Boolean = true): String =
      OptaGameConverter.convert(Seq(ev(1, 1, outcome = outcome,
        quals = quals))).head.type_name
    assert(tn(Map("107" -> "1", "6" -> "1", "2" -> "1", "5" -> "1")) == "throw_in")
    assert(tn(Map("6" -> "1", "2" -> "1", "5" -> "1")) == "corner_crossed")
    assert(tn(Map("5" -> "1", "2" -> "1")) == "freekick_crossed")
    assert(tn(Map("2" -> "1")) == "cross")
    assert(tn(Map("5" -> "1")) == "freekick_short")
    assert(tn(Map("6" -> "1")) == "corner_short")
    assert(tn(Map.empty) == "pass")
  }

  test("shot refinement: penalty > freekick > shot (F8)") {
    def tn(typeId: Int, quals: Map[String, String]): String =
      OptaGameConverter.convert(Seq(ev(1, typeId, quals = quals,
        outcome = false))).head.type_name
    assert(tn(13, Map("9" -> "1", "26" -> "1")) == "shot_penalty")
    assert(tn(15, Map("26" -> "1")) == "shot_freekick")
    assert(tn(14, Map.empty) == "shot")
  }

  test("ball touch / foul become actions only on failed outcome (F8)") {
    assert(OptaGameConverter.convert(Seq(ev(1, 61, outcome = false)))
      .head.type_name == "bad_touch")
    assert(OptaGameConverter.convert(Seq(ev(1, 61, outcome = true))).isEmpty)
    assert(OptaGameConverter.convert(Seq(ev(1, 4, outcome = false)))
      .head.type_name == "foul")
    assert(OptaGameConverter.convert(Seq(ev(1, 4, outcome = true))).isEmpty)
  }

  test("results: offside pass, shot fail, goal always success (Q1), outcome-driven (F9)") {
    def res(typeId: Int, outcome: Boolean, quals: Map[String, String] = Map.empty) =
      OptaGameConverter.convert(Seq(ev(1, typeId, outcome = outcome,
        quals = quals))).head
    assert(res(2, false).result_name == "offside")
    assert(res(13, false).result_name == "fail")
    // Q1: even with the owngoal qualifier present, goal => success
    val g = res(16, true, Map("28" -> "1"))
    assert(g.result_name == "success" && g.result_id == 1)
    assert(res(1, true).result_name == "success")
    assert(res(1, false).result_name == "fail")
  }

  test("tackle emits type_id 0 — Q2 verbatim") {
    val out = OptaGameConverter.convert(Seq(ev(1, 7, outcome = true)))
    assert(out.head.type_name == "tackle" && out.head.type_id == 0)
  }

  test("bodypart from qualifiers (F7)") {
    def bp(quals: Map[String, String]) =
      OptaGameConverter.convert(Seq(ev(1, 1, quals = quals))).head
    assert(bp(Map("15" -> "1")).bodypart_name == "head")
    assert(bp(Map("21" -> "1")).bodypart_name == "other")
    assert(bp(Map.empty).bodypart_name == "foot")
    // head beats other (checked first, R/opta_spadl.R:215-225)
    assert(bp(Map("21" -> "1", "3" -> "1")).bodypart_name == "head")
  }

  test("clearance end := next event's start, incl. flipped next (W2)") {
    val out = OptaGameConverter.convert(Seq(
      ev(1, 12, team = Home, second = 0, x = 50, y = 50, ex = 50, ey = 50),
      ev(2, 1, team = Away, second = 30, x = 40, y = 30, ex = 60, ey = 60)))
    val cl = out.find(_.type_name == "clearance").get
    // next event is away => its start is flipped before being copied
    assert(cl.end_x == 105.0 - 42.0 && cl.end_y == 68.0 - 20.4)
  }

  test("last-row clearance keeps its own end (W2 edge)") {
    val out = OptaGameConverter.convert(Seq(
      ev(1, 1, second = 0), ev(2, 12, second = 5, x = 10, y = 10, ex = 70, ey = 30)))
    val cl = out.find(_.type_name == "clearance").get
    assert(cl.end_x == 73.5 && cl.end_y == 20.4)
  }

  test("period filter keeps only 1 and 2 (P1)") {
    val out = OptaGameConverter.convert(Seq(
      ev(1, 1, period = 1), ev(2, 1, period = 3),
      ev(3, 1, period = 2, team = Away))) // team change: no dribble pair
    assert(out.map(_.period_id).toSet == Set(1, 2) && out.size == 2)
  }

  test("dribble synthesis thresholds (W4): 3m/60m bounds inclusive, 10s exclusive") {
    // same team, end of a at (21,34), start of b at d metres away, dt seconds
    def game(bx: Double, dt: Int): Vector[graft.model.SpadlAction] =
      OptaGameConverter.convert(Seq(
        ev(1, 1, minute = 0, second = 0, x = 10, y = 50, ex = 20, ey = 50),
        ev(2, 1, minute = dt / 60, second = dt % 60, x = bx, y = 50,
          ex = 60, ey = 50)))
    def hasDribble(bx: Double, dt: Int) =
      game(bx, dt).exists(_.type_name == "dribble")
    // gap exactly 3m: (end_x 21m, start 24m) => included (>=)
    assert(hasDribble(24.0 / 1.05, 5))
    // gap just under 3m => no
    assert(!hasDribble(23.5 / 1.05, 5))
    // gap exactly 60m => included (<=)
    assert(hasDribble(81.0 / 1.05, 5))
    // gap over 60m => no
    assert(!hasDribble(82.0 / 1.05, 5))
    // dt = 10 s => excluded (strict <)
    assert(!hasDribble(30.0 / 1.05, 10))
    assert(hasDribble(30.0 / 1.05, 9))
  }

  test("dribble row fields: midpoint time, prev-end start, next-start end, success/foot") {
    val out = OptaGameConverter.convert(Seq(
      ev(1, 1, minute = 0, second = 0, x = 10, y = 50, ex = 20, ey = 50),
      ev(2, 1, minute = 0, second = 4, x = 30, y = 50, ex = 60, ey = 50)))
    val d = out.find(_.type_name == "dribble").get
    assert(d.time_seconds == 2.0)
    assert(d.start_x == 21.0 && d.end_x == 31.5)
    assert(d.result_name == "success" && d.bodypart_name == "foot")
    assert(d.type_id == 21)
    assert(d.event_id == 2.0) // copied from the NEXT action
    // ordering: dribble sits between the two passes
    assert(out.map(_.type_name) == Vector("pass", "dribble", "pass"))
    assert(out.map(_.action_idx) == Vector(1, 2, 3))
  }

  test("stable chronological sort: ties keep document order (W1)") {
    val out = OptaGameConverter.convert(Seq(
      ev(5, 1, minute = 1, second = 0), ev(6, 1, minute = 1, second = 0, team = Away),
      ev(4, 1, minute = 0, second = 30, team = Away)))
    assert(out.map(_.event_id) == Vector(4.0, 5.0, 6.0))
  }
}
