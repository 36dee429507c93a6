package graft

import graft.codec.TokenCodec
import graft.fixtures.FixtureGen
import org.scalatest.funsuite.AnyFunSuite

/** decode(encode(events)) == events for all generated games (FIXTURES.md §2). */
class CodecSpec extends AnyFunSuite {

  test("opta wire roundtrip over generated corpus") {
    (0 until 8).filter(FixtureGen.sourceFor(_) == "opta").foreach { i =>
      val g = FixtureGen.optaGame(i, 120)
      TokenCodec.decode(g.doc.tokens) match {
        case TokenCodec.OptaGame(home, events) =>
          assert(home == 10)
          val re = TokenCodec.encodeOpta(home, events)
          assert(re.sameElements(g.doc.tokens), s"game $i roundtrip")
        case other => fail(s"expected OptaGame, got $other")
      }
    }
  }

  test("instat wire roundtrip over generated corpus") {
    (0 until 8).filter(FixtureGen.sourceFor(_) == "instat").foreach { i =>
      val doc = FixtureGen.instatGame(i, 120)
      TokenCodec.decode(doc.tokens) match {
        case TokenCodec.InstatGame(home, events) =>
          assert(home == 30)
          val re = TokenCodec.encodeInstat(home, events)
          assert(re.sameElements(doc.tokens), s"game $i roundtrip")
        case other => fail(s"expected InstatGame, got $other")
      }
    }
  }

  test("n_tok matches token length and header counts events") {
    val g = FixtureGen.game(0)
    assert(g.doc.n_tok == g.doc.tokens.length)
    assert(g.doc.tokens(0) == TokenCodec.Version)
    assert(g.doc.tokens(3) > 0)
  }

  test("opta end-coordinate priority: pass_end > blocked > goal_mouth") {
    import TokenCodec._
    def raw(quals: Vector[(Int, Int)]) =
      toOptaRaw(1, 10, OptaWire(1, 1, 1, 0, 0, 101, 10, true, 1000, 2000, quals))
    // pass end wins
    val a = raw(Vector(140 -> 5000, 141 -> 6000, 146 -> 100, 147 -> 100))
    assert(a.end_x == 50.0 && a.end_y == 60.0)
    // blocked next
    val b = raw(Vector(146 -> 4000, 147 -> 3000))
    assert(b.end_x == 40.0 && b.end_y == 30.0)
    // goal mouth: y from qualifier, x forced to 100 (R/opta_events.R:140-145)
    val c = raw(Vector(102 -> 4500))
    assert(c.end_x == 100.0 && c.end_y == 45.0)
    // nothing: fall back to start
    val d = raw(Vector.empty)
    assert(d.end_x == 10.0 && d.end_y == 20.0)
  }
}
