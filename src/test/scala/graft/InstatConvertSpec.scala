package graft

import graft.convert.InstatGameConverter
import graft.model.InstatRawEvent
import org.scalatest.funsuite.AnyFunSuite

/** Per-operator rule tests for the InStat conversion, incl. quirks Q3/Q4. */
class InstatConvertSpec extends AnyFunSuite {

  val Home = 30
  val Away = 40

  def ev(id: Int, actionId: Int, sec: Double, team: Int = Home,
      half: Int = 1, gat: Int = 0, std: Int = 1, attack: Int = 0,
      outcome: Boolean = true, body: Int = 1, posId: Int = 5,
      player: Int = -1, x: Double = 50, y: Double = 30,
      dx: Option[Double] = Some(60.0), dy: Option[Double] = Some(35.0),
      name: String = null): InstatRawEvent =
    InstatRawEvent(id, half, sec, team,
      if (player >= 0) player else team * 100 + 1, posId, actionId, gat, std,
      attack, outcome, body, x, y, dx, dy,
      if (name != null) name else graft.model.InstatConfig.actionName(actionId))

  def convert(evs: Seq[InstatRawEvent]) =
    InstatGameConverter.convert(1, Home, evs)

  /** trailing rows so the interesting ones survive the Q4 last-row drop */
  def pad(sec: Double): Seq[InstatRawEvent] = Seq(
    ev(9801, 1011, sec, gat = 1, std = 1),
    ev(9802, 18000, sec + 5, gat = 18, std = 1))

  test("Q4: last sorted event is dropped") {
    val out = convert(Seq(
      ev(1, 1011, 0, gat = 1), ev(2, 1011, 10, gat = 1), ev(3, 1011, 20, gat = 1)))
    assert(out.map(_.event_id) == Vector(1.0, 2.0))
  }

  test("Q3: action 21000 emits BOTH take_on and dribble rows") {
    val out = convert(ev(1, 21000, 0) +: pad(10))
    val dup = out.filter(_.event_id == 1.0).map(_.type_name).sorted
    assert(dup == Vector("dribble", "take_on"))
  }

  test("half-2 time offset +2700 and minute/second derivation (F4)") {
    val out = convert(Seq(
      ev(1, 1011, 100, gat = 1), // half 1
      ev(2, 1011, 130.0, half = 2, gat = 1),
      ev(3, 18000, 200.0, half = 2, gat = 18)))
    val a = out.find(_.event_id == 2.0).get
    assert(a.time_seconds == 2830.0)
    assert(a.minute == 47 && a.second == 10)
    assert(a.period_id == 2)
  }

  test("yellow/red card attribution: next event same player (W5)") {
    val out = convert(Seq(
      ev(1, 1011, 0, gat = 1, player = 7, outcome = false),
      ev(2, 3020, 2, player = 7),
      ev(3, 1011, 10, gat = 1, player = 8, outcome = false),
      ev(4, 3030, 12, player = 9) // different player: no attribution
    ) ++ pad(20))
    assert(out.find(_.event_id == 1.0).get.result_name == "yellow_card")
    assert(out.find(_.event_id == 3.0).get.result_name == "fail")
  }

  test("success override beats card result for successful non-shot (W5 order)") {
    val out = convert(Seq(
      ev(1, 1011, 0, gat = 1, player = 7, outcome = true),
      ev(2, 3020, 2, player = 7)) ++ pad(10))
    assert(out.find(_.event_id == 1.0).get.result_name == "success")
  }

  test("Q4 offside misalignment: events[-2] compares row i vs i+1 for i>=2") {
    // sorted rows: 1:pass 2:challenge 3:offside ... offside flag lands on
    // row 2 (its 'second next' is row 3) AND row 1? row1's second-next is
    // row1 itself (not offside). Row 2 outcome=false so no success override.
    val out = convert(Seq(
      ev(1, 1011, 0, gat = 1, outcome = true),
      ev(2, 2020, 2, outcome = false),
      ev(3, 3040, 4)) ++ pad(20))
    // row 2 is non-action (2020 unclaimed) — use a claimed type instead
    val out2 = convert(Seq(
      ev(1, 1011, 0, gat = 1, outcome = true),
      ev(2, 1012, 2, gat = 1, outcome = false),
      ev(3, 3040, 4)) ++ pad(20))
    assert(out2.find(_.event_id == 2.0).get.result_name == "offside")
    // row 1 got the success override (outcome true)
    assert(out2.find(_.event_id == 1.0).get.result_name == "success")
  }

  test("goal => success, owngoal => owngoal (W5)") {
    val out = convert(Seq(
      ev(1, 8010, 0, gat = 4),
      ev(2, 8020, 10, gat = 4)) ++ pad(20))
    assert(out.find(_.event_id == 1.0).get.result_name == "success")
    assert(out.find(_.event_id == 2.0).get.result_name == "owngoal")
    assert(out.find(_.event_id == 1.0).get.type_name == "shot")
  }

  test("penalty shot classified shot_penalty, excluded from plain shots") {
    val out = convert(ev(1, 5010, 0, gat = 4, std = 6) +: pad(10))
    assert(out.find(_.event_id == 1.0).get.type_name == "shot_penalty")
    assert(out.count(_.event_id == 1.0) == 1)
  }

  test("successful penalty gets success override (not excluded: only 'shot' is)") {
    val out = convert(ev(1, 5010, 0, gat = 4, std = 6, outcome = true) +: pad(10))
    assert(out.find(_.event_id == 1.0).get.result_name == "success")
  }

  test("freekick misaligned predecessor filter + last raw freekick never emitted") {
    // three freekicks; fk2's predecessor is ball-out(27) => fk1 dropped
    // (the j-th kept freekick tests the predecessor of freekick j+1);
    // fk3 is last => never emitted
    val evs = Seq(
      ev(1, 1011, 0, gat = 1),
      ev(2, 1011, 10, gat = 1, std = 3, attack = 1), // fk1
      ev(3, 27000, 20, gat = 27), // ball out (precedes fk2)
      ev(4, 1011, 30, gat = 1, std = 4, attack = 1), // fk2
      ev(5, 1011, 40, gat = 1),
      ev(6, 1011, 50, gat = 1, std = 3, attack = 1), // fk3 (last, dropped)
      ev(7, 1011, 60, gat = 1)
    ) ++ pad(70)
    val out = convert(evs)
    assert(!out.exists(a => a.event_id == 2.0 &&
      a.type_name.startsWith("freekick")))
    // fk2 kept iff predecessor of fk3 (id 5, a pass) is not 27/18 => kept
    assert(out.exists(a => a.event_id == 4.0 && a.type_name == "freekick_short"))
    assert(!out.exists(a => a.event_id == 6.0 && a.type_name.startsWith("freekick")))
  }

  test("freekick crossed via next/2nd-next action_name; shot wins (W6)") {
    val evs = Seq(
      ev(1, 1011, 0, gat = 1),
      ev(2, 1011, 10, gat = 1, std = 3, attack = 1), // fk1 -> crossed (next is cross)
      ev(3, 26001, 12, gat = 26),
      ev(4, 5010, 30, gat = 4, std = 4, attack = 1), // fk2: shot_freekick
      ev(5, 1011, 40, gat = 1),
      ev(6, 1011, 50, gat = 1, std = 3, attack = 1), // fk3 last -> dropped
      ev(7, 1011, 60, gat = 1)
    ) ++ pad(70)
    val out = convert(evs)
    assert(out.exists(a => a.event_id == 2.0 && a.type_name == "freekick_crossed"))
    assert(out.exists(a => a.event_id == 4.0 && a.type_name == "shot_freekick"))
  }

  test("corner crossed vs short (W6)") {
    val evs = Seq(
      ev(1, 1011, 0, gat = 1, std = 5, attack = 1),
      ev(2, 26001, 2, gat = 26),
      ev(3, 1011, 10, gat = 1, std = 5, attack = 1),
      ev(4, 1011, 12, gat = 1)) ++ pad(20)
    val out = convert(evs)
    assert(out.find(_.event_id == 1.0).get.type_name == "corner_crossed")
    assert(out.find(_.event_id == 3.0).get.type_name == "corner_short")
  }

  test("away flip + clearance end from next flipped start (F2/W2)") {
    val evs = Seq(
      ev(1, 9000, 0, team = Away, x = 10, y = 10, dx = None, dy = None),
      ev(2, 1011, 5, team = Home, gat = 1, x = 30, y = 30)) ++ pad(20)
    val out = convert(evs)
    val cl = out.find(_.event_id == 1.0).get
    assert(cl.start_x == 95.0 && cl.start_y == 58.0)
    // next is home: unflipped start
    assert(cl.end_x == 30.0 && cl.end_y == 30.0)
  }

  test("end-position fill (W3): same-start set, next-start set, last-row fallback") {
    val evs = Seq(
      ev(1, 2031, 0, dx = None, dy = None), // tackle -> own start
      ev(2, 1011, 5, gat = 1, std = 2, x = 70, y = 40, dx = None, dy = None), // throw_in -> next start
      ev(3, 1011, 10, gat = 1, x = 20, y = 20),
      ev(4, 1011, 20, gat = 1, std = 2, x = 66, y = 44, dx = None, dy = None), // throw_in, last convertible
      ev(5, 18000, 30, gat = 18)) // status row: dropped by Q4
    val out = convert(evs)
    val t = out.find(_.event_id == 1.0).get
    assert(t.end_x == t.start_x && t.end_y == t.start_y)
    val ti = out.find(_.event_id == 2.0).get
    assert(ti.end_x == 20.0 && ti.end_y == 20.0)
    val last = out.find(_.event_id == 4.0).get
    assert(last.end_x == 66.0 && last.end_y == 44.0) // last-row fallback
  }

  test("bodypart map: 1,2->foot, 3->head, 5->other; tackle type_id 0 (Q2)") {
    val evs = Seq(
      ev(1, 1011, 0, gat = 1, body = 3),
      ev(2, 1011, 5, gat = 1, body = 5),
      ev(3, 2031, 10, body = 2)) ++ pad(20)
    val out = convert(evs)
    assert(out.find(_.event_id == 1.0).get.bodypart_name == "head")
    assert(out.find(_.event_id == 2.0).get.bodypart_name == "other")
    val t = out.find(_.event_id == 3.0).get
    assert(t.bodypart_name == "foot" && t.type_id == 0)
  }
}
