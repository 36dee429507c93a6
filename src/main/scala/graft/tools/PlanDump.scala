package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named driver queries to files —
  * evidence artifacts for plans/r06 (optimization-round deliverable).
  * Usage: sbt "runMain graft.tools.PlanDump <sfDir> <outDir> q1 q2 ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$n.txt"), txt)
      println(s"[plandump] $n -> $outDir/$n.txt")
    }
    spark.stop()
  }
}
