package graft

import graft.codec.TokenCodec
import graft.convert.SpadlPipeline
import graft.fixtures.FixtureGen
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Regenerates the golden conversion fixtures (FIXTURES.md §5): for each
  * deterministic fixture game, the SHA-256 of the re-encoded SPADL action
  * token array (output codec, FIXTURES.md §2). Committed at
  * src/test/resources/golden_actions.tsv and pinned by GoldenSpec — run
  * `sbt "Test/runMain graft.GoldenGen"` ONLY when a semantics change is
  * intended, and justify the diff in the commit message.
  */
object GoldenGen {
  val NGames = 16
  val EventsPerGame = 150

  def hashFor(gameIdx: Int): (String, Int, String) = {
    val g = FixtureGen.game(gameIdx, EventsPerGame)
    val kps = g.keypasses.map(k => SpadlPipeline.Kp(k.event_id, k.pass_type))
    val actions = SpadlPipeline.convertDoc(g.doc.doc_id, g.doc.tokens, kps)
    val encoded = TokenCodec.encodeActions(actions)
    val bytes = new Array[Byte](encoded.length * 4)
    var i = 0
    while (i < encoded.length) {
      val v = encoded(i)
      bytes(4 * i) = (v >> 24).toByte
      bytes(4 * i + 1) = (v >> 16).toByte
      bytes(4 * i + 2) = (v >> 8).toByte
      bytes(4 * i + 3) = v.toByte
      i += 1
    }
    val sha = MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString
    (g.doc.doc_id, actions.size, sha)
  }

  def main(args: Array[String]): Unit = {
    val rows = (0 until NGames).map { i =>
      val (id, n, sha) = hashFor(i)
      s"$id\t$n\t$sha"
    }
    val out = Paths.get("src/test/resources/golden_actions.tsv")
    Files.createDirectories(out.getParent)
    Files.writeString(out, rows.mkString("", "\n", "\n"))
    println(s"wrote ${rows.size} golden rows to $out")
  }
}
