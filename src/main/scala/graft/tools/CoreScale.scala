package graft.tools

import graft.codec.TokenCodec
import graft.convert.SpadlPipeline
import graft.fixtures.FixtureGen
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Spark-free scaling probe: decode+convert the fixture corpus on plain
  * JVM thread pools to separate my-code/GC scaling from Spark overheads.
  */
object CoreScale {
  def main(args: Array[String]): Unit = {
    val games = if (args.length > 0) args(0).toInt else 2048
    val corpus = (0 until games).map(i => FixtureGen.game(i, 400).doc).toArray
    println(s"[corescale] generated $games games")
    for (threads <- Seq(1, 8, 32); rep <- 1 to 3) {
      val pool = Executors.newFixedThreadPool(threads)
      val rows = new AtomicLong()
      val t0 = System.nanoTime()
      corpus.foreach { doc =>
        pool.submit(new Runnable {
          def run(): Unit =
            rows.addAndGet(SpadlPipeline.convertDoc(doc.doc_id, doc.tokens, Nil).size)
        })
      }
      pool.shutdown()
      pool.awaitTermination(600, TimeUnit.SECONDS)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[corescale] threads=$threads rep=$rep rows=${rows.get} sec=$sec%.2f rows_per_sec=${rows.get / sec}%.0f")
    }
  }
}
