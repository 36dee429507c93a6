package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for individual driver queries: reps in one session
  * split plan-compile/codegen cost (first run) from steady-state execution
  * (min of later runs). Usage:
  *   sbt "runMain graft.tools.QueryProfile <sfDir> q24_minhash_lsh q25_simhash"
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val phases = sys.env.contains("GRAFT_QPROF_PHASES")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        if (phases) {
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan // force analysis+optimize+planning
          val t2 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val t3 = System.nanoTime()
          println(f"[qprof-phases] $n build=${(t1 - t0) / 1e9}%.2f " +
            f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f")
        } else fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qprof] $n first=${ts.head}%.2f warm_min=${ts.tail.min}%.2f")
    }
    spark.stop()
  }
}
