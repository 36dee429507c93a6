package graft.tools

import graft.convert.SpadlPipeline
import graft.fixtures.FixtureGen
import graft.vaep.ValuationCore

/** Single-threaded diagnostic for the skew-bench ratio: per-event
  * convert+value cost of one 10x-sized game vs ten normal games over the
  * same total events. The skew matrix (BASELINE.md) shows every skew
  * config — splittable scan, one-task hot shard, salted spread — cluster
  * at the same ~0.75 of uniform throughput on BOTH state-store providers
  * once the core budget is OS-enforced; layout- and salt-invariance
  * implies the cost is inherent per-key work, and this tool measures it
  * directly with no Spark, no state store, no shuffle in the loop.
  *
  * A ~1.4x per-event ratio here fully explains the matrix: with 80% of
  * skew-corpus events in 10x games, corpus throughput is
  * 1 / (0.2 + 0.8*1.4) = 0.76 of uniform.
  */
object HotKeyCost {
  private def convertAll(sizes: Seq[Int]): Long = {
    var n = 0L
    sizes.zipWithIndex.foreach { case (sz, i) =>
      val g = FixtureGen.game(i, sz)
      n += ValuationCore
        .value(SpadlPipeline.convertDoc(g.doc.doc_id, g.doc.tokens, Nil))
        .size
    }
    n
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("hash")) {
      // where do the 8 hot keys land under HashPartitioning(8)? Spark's
      // shuffle key placement is Murmur3(seed 42) pmod nPartitions — with
      // only 8 ten-x keys carrying 80% of events, the max-loaded state
      // partition bounds the stateful stage's wall.
      import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      import org.apache.spark.unsafe.types.UTF8String
      val byPart = (0 until 8).map(i => s"${1000 + i}").groupBy { id =>
        val h = Murmur3HashFunction.hash(
          UTF8String.fromString(id), org.apache.spark.sql.types.StringType,
          42, false, false).toInt
        ((h % 8) + 8) % 8
      }
      (0 until 8).foreach { p =>
        println(s"partition $p: ${byPart.getOrElse(p, Nil).mkString(",")}")
      }
      return
    }
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    (1 to 3).foreach { _ =>
      convertAll(Seq.fill(10)(800)); convertAll(Seq(8000))
    }
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    (1 to reps).foreach { r =>
      val (nU, tU) = time(convertAll(Seq.fill(10)(800)))
      val (nH, tH) = time(convertAll(Seq(8000)))
      println(f"rep $r: 10x800 -> $nU acts $tU%.3f s (${nU / tU}%.0f/s) | " +
        f"1x8000 -> $nH acts $tH%.3f s (${nH / tH}%.0f/s) | " +
        f"per-event cost ratio ${(tH / nH) / (tU / nU)}%.2f")
    }
  }
}
