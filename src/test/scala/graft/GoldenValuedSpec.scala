package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Pins the committed numeric-output digests written by
  * [[GoldenValuedGen]]: a silent valuation/feature drift now fails the
  * build even where the driver's check is rows-only.
  */
class GoldenValuedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val golden: Map[String, (Int, String)] = {
    val src = Source.fromResource("golden_valued.tsv")
    try src.getLines().filter(_.nonEmpty).map { l =>
      val Array(name, n, sha) = l.split("\t")
      name -> (n.toInt, sha)
    }.toMap
    finally src.close()
  }

  test("golden valued digests exist for every pinned query") {
    assert(golden.keySet == GoldenValuedGen.Queries.map(_._1).toSet)
  }

  GoldenValuedGen.Queries.foreach { case (name, _) =>
    test(s"$name content digest matches the committed golden") {
      val (n, sha) = GoldenValuedGen.digestFor(spark, name)
      val (goldN, goldSha) = golden(name)
      assert(n == goldN, s"$name row count $n != golden $goldN")
      assert(sha == goldSha, s"$name content digest drifted")
    }
  }
}
