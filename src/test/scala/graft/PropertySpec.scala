package graft

import graft.codec.TokenCodec
import graft.codec.TokenCodec.{InstatWire, OptaWire}
import graft.convert.SpadlPipeline
import graft.fixtures.FixtureGen
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5.3): codec totality/roundtrip over arbitrary
  * wire events, conversion structural invariants over the fixture space.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  val genQual: Gen[(Int, Int)] = for {
    k <- Gen.oneOf(140, 141, 146, 147, 102, 5, 2, 6, 107, 9, 26, 28, 3, 15,
      168, 111, 21, 55, 233)
    v <- Gen.chooseNum(0, 10000)
  } yield (k, v)

  val genOpta: Gen[OptaWire] = for {
    id <- Gen.chooseNum(1, 1000000)
    tid <- Gen.chooseNum(1, 81)
    per <- Gen.chooseNum(1, 4)
    mi <- Gen.chooseNum(0, 95)
    se <- Gen.chooseNum(0, 59)
    pl <- Gen.chooseNum(1, 99999)
    tm <- Gen.oneOf(10, 20)
    oc <- Gen.oneOf(true, false)
    x <- Gen.chooseNum(0, 10000)
    y <- Gen.chooseNum(0, 10000)
    nq <- Gen.chooseNum(0, 8)
    qs <- Gen.listOfN(nq, genQual)
  } yield OptaWire(id, tid, per, mi, se, pl, tm, oc, x, y, qs.toVector)

  val genInstat: Gen[InstatWire] = for {
    id <- Gen.chooseNum(1, 1000000)
    half <- Gen.chooseNum(1, 2)
    sec <- Gen.chooseNum(0, 2700)
    tm <- Gen.oneOf(30, 40)
    pl <- Gen.chooseNum(1, 99999)
    pos <- Gen.chooseNum(1, 31)
    act <- Gen.oneOf(1011, 1012, 21000, 2052, 2031, 6020, 9000, 10000, 7000,
      13040, 13011, 8010, 8020, 3020, 3030, 3040, 5010, 26001, 27000)
    gat <- Gen.chooseNum(0, 27)
    std <- Gen.chooseNum(1, 6)
    att <- Gen.chooseNum(0, 1)
    oc <- Gen.oneOf(true, false)
    body <- Gen.oneOf(-1, 1, 2, 3, 5)
    x <- Gen.chooseNum(0, 10500)
    y <- Gen.chooseNum(0, 6800)
    dx <- Gen.oneOf(Gen.const(-1), Gen.chooseNum(0, 10500))
    dy <- Gen.oneOf(Gen.const(-1), Gen.chooseNum(0, 6800))
  } yield InstatWire(id, half, sec, tm, pl, pos, act, gat, std, att, oc,
    body, x, y, dx, dy)

  test("opta codec roundtrip for arbitrary wire events") {
    check(Prop.forAll(Gen.listOf(genOpta)) { ws =>
      val tokens = TokenCodec.encodeOpta(10, ws)
      TokenCodec.decode(tokens) match {
        case TokenCodec.OptaGame(h, got) => h == 10 && got == ws.toVector
        case _ => false
      }
    })
  }

  test("instat codec roundtrip for arbitrary wire events") {
    check(Prop.forAll(Gen.listOf(genInstat)) { ws =>
      val tokens = TokenCodec.encodeInstat(30, ws)
      TokenCodec.decode(tokens) match {
        case TokenCodec.InstatGame(h, got) => h == 30 && got == ws.toVector
        case _ => false
      }
    })
  }

  test("conversion is total and never crashes on arbitrary opta games") {
    check(Prop.forAll(Gen.listOf(genOpta)) { ws =>
      val tokens = TokenCodec.encodeOpta(10, ws)
      val actions = SpadlPipeline.convertDoc("7", tokens, Nil)
      // structural invariants: ordinal idx, chronological, known vocab
      actions.zipWithIndex.forall { case (a, i) => a.action_idx == i + 1 } &&
        actions.sliding(2).forall {
          case Seq(a, b) => a.period_id < b.period_id ||
            (a.period_id == b.period_id && a.time_seconds <= b.time_seconds)
          case _ => true
        } &&
        actions.forall(a =>
          graft.model.SpadlConfig.actionIdByName.contains(a.type_name) &&
            a.type_name != "non_action" &&
            (a.period_id == 1 || a.period_id == 2))
    })
  }

  test("every fixture event maps to <= 1 action + <= 1 dribble (totality)") {
    (0 until 8).foreach { i =>
      val g = FixtureGen.game(i, 120)
      val actions = SpadlPipeline.convertDoc(g.doc.doc_id, g.doc.tokens, Nil)
      val byEvent = actions.groupBy(_.event_id)
      byEvent.foreach { case (eid, as) =>
        val nonDribble = as.count(_.type_name != "dribble")
        val dribbles = as.count(_.type_name == "dribble")
        if (g.doc.source == "opta")
          assert(nonDribble <= 1 && dribbles <= 1,
            s"game ${g.doc.doc_id} event $eid: $as")
        else // InStat Q3: 21000 emits take_on AND dribble
          assert(as.size <= 2)
      }
    }
  }
}
