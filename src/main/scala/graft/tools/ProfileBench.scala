package graft.tools

import graft.convert.SpadlPipeline
import graft.fixtures.FixtureGen
import graft.vaep.Valuation
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the convert+valuate pipeline: stage-by-stage
  * timings at a given core count, with/without AQE.
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val aqe = if (args.length > 1) args(1).toBoolean else true
    val games = if (args.length > 2) args(2).toInt else 4096
    val docsPath = "/tmp/graft_profile/docs.parquet"

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    if (!new java.io.File(docsPath).exists()) {
      val corpus = (0 until games).map(i => FixtureGen.game(i, 400).doc)
      spark.createDataset(corpus).repartition(32)
        .write.mode("overwrite").parquet(docsPath)
    }
    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label cores=$cores min=${ts.min}%.2f s all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val docs = spark.read.parquet(docsPath).as[graft.model.TokenDoc]
    // warm
    SpadlPipeline.convert(spark, docs).write.format("noop").mode("overwrite").save()
    time("scan-only") {
      docs.write.format("noop").mode("overwrite").save()
    }
    time("convert") {
      SpadlPipeline.convert(spark, docs).write.format("noop").mode("overwrite").save()
    }
    val valued = Valuation.value(SpadlPipeline.convert(spark, docs).toDF())
    time("convert+value") {
      valued.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
