package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Throwaway stage-level profiler for one driver query (deleted before
  * round close). Usage: runMain graft.tools.Scratch <sfDir> <query>
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "q26_ngram_jaccard"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // warm up twice
    (1 to 2).foreach(_ => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    if (sys.env.contains("SCRATCH_BISECT26")) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        (1 to 2).foreach(_ => df.write.format("noop").mode("overwrite").save())
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[bisect] $tag%-28s warm_min=${ts.min}%.3f")
      }
      val HashM = 1000003L
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val words = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "wd")))
      val dict = words.select(col("wd")).distinct()
        .select(col("wd"), pmod(conv(substring(md5(col("wd")), 1, 15), 16, 10)
          .cast("long"), lit(HashM)).as("wh"))
      val hm0 = words.join(broadcast(dict), Seq("wd"))
        .select(col("doc_id"), col("pos"), col("wh"))
      time("words+dictjoin")(hm0)
      val hm = hm0
        .select(col("doc_id"), col("pos"), col("wh"),
          lead(col("wh"), 1).over(w).as("h2"),
          lead(col("wh"), 2).over(w).as("h3"),
          count(lit(1)).over(wAll).as("nw"))
        .select(col("doc_id"),
          when(col("nw") >= 3,
            when(col("pos") <= col("nw") - 3,
              pmod(pmod(col("wh") * 131 + col("h2"), lit(HashM)) * 131 +
                col("h3"), lit(HashM))))
            .otherwise(when(col("pos") === 0,
              when(col("nw") === 1, col("wh"))
                .otherwise(pmod(col("wh") * 131 + col("h2"), lit(HashM)))))
            .as("hm"))
        .filter(col("hm").isNotNull)
      time("window shingles")(hm)
      val permCols = (0 until 16).map(p =>
        min(pmod(col("hm") * (2 * p + 3) + (7 * p + 1), lit(HashM))).as(s"m$p"))
      val sig = hm.groupBy(col("doc_id")).agg(permCols.head, permCols.tail: _*)
      time("sig(16 mins)")(sig)
      val cands = graft.operators.Dedup.minhashCandidatesArith(docs)
      time("cands")(cands)
      println(s"[bisect] cands rows = ${cands.count()}")
      val da = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
      val db = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
      val paired = cands.join(da, Seq("doc_a")).join(db, Seq("doc_b"))
      time("paired(no shingle)")(paired)
      def wordSh(text: org.apache.spark.sql.Column) = {
        val ws = split(text, " ")
        val k = size(ws) - 2
        array_distinct(when(k > 0, transform(sequence(lit(0), k - 1), i =>
          concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2),
            element_at(ws, i + 3)))).otherwise(array(text)))
      }
      val verified = paired
        .withColumn("sh_a", wordSh(col("text_a")))
        .withColumn("sh_b", wordSh(col("text_b")))
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
        .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 6))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
      time("verified (no sort)")(verified)
      time("verified + repart + sort")(
        verified.repartition(col("doc_a")).orderBy(col("doc_a"), col("doc_b")))
      val q26 = graft.SparkEntry.queries("q26_ngram_jaccard")(spark, sfDir)
      time("full q26")(q26)
      spark.stop()
      return
    }
    if (sys.env.contains("SCRATCH_BISECT")) {
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        (1 to 2).foreach(_ => df.write.format("noop").mode("overwrite").save())
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[bisect] $tag%-28s warm_min=${ts.min}%.3f")
      }
      val wd = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("wd"))
      val dict = wd.select(col("wd")).distinct()
        .select(col("wd"),
          conv(substring(md5(col("wd")), 1, 15), 16, 10).cast("long").as("h1"),
          conv(substring(md5(col("wd")), 16, 1), 16, 10).cast("long").as("h2"))
      val hashed = wd.join(broadcast(dict), Seq("wd"))
        .select(col("doc_id"), col("h1"), col("h2"))
      time("hashed")(hashed)
      val voteCols = (0 until 64).map { bit =>
        val src = if (bit < 60) shiftright(col("h1"), bit)
          else shiftright(col("h2"), bit - 60)
        sum(when(src.bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$bit")
      }
      val votes = hashed.groupBy(col("doc_id"))
        .agg(voteCols.head, voteCols.tail: _*)
      time("votes(64 aggs)")(votes)
      val sim = votes.select(col("doc_id"),
        (0 until 64).map { bit =>
          when(col(s"v$bit") > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
        }.reduce(_ bitwiseOR _).as("simhash"))
      time("sim")(sim)
      val banded = sim.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("chunk"))
        }: _*)).as("bb"))
        .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.chunk"))
      time("banded")(banded)
      val a2 = banded.as("a"); val b2 = banded.as("b")
      val joined = a2.join(b2, col("a.band") === col("b.band") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 6)
      time("joined+distinct")(joined)
      time("joined+orderBy")(joined.orderBy(col("doc_a"), col("doc_b")))
      val bandedR = banded.repartition(col("band"), col("chunk"))
      val a3 = bandedR.as("a"); val b3 = bandedR.as("b")
      val joinedR = a3.join(b3, col("a.band") === col("b.band") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 6)
      time("joinedR(reuse)+distinct")(joinedR)
      time("joinedR+orderBy")(joinedR.orderBy(col("doc_a"), col("doc_b")))
      spark.stop()
      return
    }
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.get - si.submissionTime.get)
        println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d wall=${wall}%6d ms  ${si.name.take(80)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(500)
    spark.stop()
  }
}
