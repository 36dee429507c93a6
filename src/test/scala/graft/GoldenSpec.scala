package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Token-array-equality regression gate (BASELINE.json `input_hint`): the
  * re-encoded SPADL output of every fixture game must match the committed
  * golden digests bit-for-bit. Any conversion change shows up here.
  */
class GoldenSpec extends AnyFunSuite {

  lazy val golden: Seq[(String, Int, String)] = {
    val src = Source.fromResource("golden_actions.tsv")
    try src.getLines().filter(_.nonEmpty).map { l =>
      val Array(id, n, sha) = l.split("\t")
      (id, n.toInt, sha)
    }.toSeq
    finally src.close()
  }

  test("golden fixture digests exist") {
    assert(golden.size == GoldenGen.NGames)
  }

  test("re-encoded SPADL token arrays match the committed goldens") {
    golden.zipWithIndex.foreach { case ((id, n, sha), i) =>
      val (gotId, gotN, gotSha) = GoldenGen.hashFor(i)
      assert(gotId == id)
      assert(gotN == n, s"game $id action count")
      assert(gotSha == sha, s"game $id token-array digest")
    }
  }
}
