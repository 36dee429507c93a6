package graft.tools

import org.apache.spark.sql.SparkSession

/** Canary-gated per-query micro-bench (optimization-round instrumentation,
  * guide §1.1/§1.4 — separate from the FROZEN graft.Bench): each named
  * query runs `reps` noop-sink passes with the single-threaded host-speed
  * canary (graft.Bench.canarySec) sampled before and after, so a sandbox
  * throttle wave is visible in the artifact instead of silently polluting
  * an A/B comparison. Prints one line per query:
  *   [bx] <name> cold=<s> warm_min=<s> warm_med=<s> canary=<before>/<after>
  * Usage:
  *   SPARK_GRAFT_BX_REPS=5 sbt "runMain graft.tools.BenchExtra <sfDir> q..."
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val reps = sys.env.getOrElse("SPARK_GRAFT_BX_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val cb = graft.Bench.canarySec()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val ca = graft.Bench.canarySec()
      val warm = ts.tail.sorted
      println(f"[bx] $n cold=${ts.head}%.2f warm_min=${warm.min}%.2f " +
        f"warm_med=${warm(warm.size / 2)}%.2f " +
        f"canary=$cb%.3f/$ca%.3f ref=${graft.Bench.CanaryRefSec}%.3f")
    }
    spark.stop()
  }
}
