package graft

import graft.convert.{InstatConvertBatch, InstatGameConverter, OptaConvertBatch, SpadlPipeline}
import graft.codec.TokenCodec
import graft.fixtures.FixtureGen
import graft.model.{SpadlAction, TokenDoc}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The declarative Catalyst conversion must equal the per-game core
  * EXACTLY (every field, bitwise doubles) on the fixture corpus — the
  * two-implementations-one-semantics guard (SURVEY.md §5.3).
  */
class BatchEquivalenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("Catalyst Opta conversion == per-game core on the fixture corpus") {
    import spark.implicits._
    val games = FixtureGen.corpus(10, 150).filter(_.doc.source == "opta")
    val docs = spark.createDataset(games.map(_.doc))
    val kp = spark.createDataset(games.flatMap(_.keypasses))

    val truth: Seq[SpadlAction] = games.flatMap { g =>
      SpadlPipeline.convertDoc(g.doc.doc_id, g.doc.tokens,
        g.keypasses.map(k => SpadlPipeline.Kp(k.event_id, k.pass_type)))
    }.sortBy(a => (a.game_id, a.action_idx))

    val raw = SpadlPipeline.decodeOptaEvents(spark, docs, Some(kp))
    val got = OptaConvertBatch.toSpadl(raw.toDF())
      .as[SpadlAction].collect().toSeq
      .sortBy(a => (a.game_id, a.action_idx))

    assert(got.size == truth.size,
      s"row count got=${got.size} want=${truth.size}")
    got.zip(truth).foreach { case (a, b) =>
      assert(a == b, s"mismatch at (${b.game_id}, ${b.action_idx})")
    }
  }

  test("Catalyst InStat conversion == per-game core on the fixture corpus") {
    import spark.implicits._
    val games = FixtureGen.corpus(24, 200).filter(_.doc.source == "instat")
    assert(games.nonEmpty, "fixture corpus has no instat games")
    val docs = spark.createDataset(games.map(_.doc))

    val truth: Seq[SpadlAction] = games.flatMap { g =>
      TokenCodec.decode(g.doc.tokens) match {
        case TokenCodec.InstatGame(home, wires) =>
          InstatGameConverter.convert(g.doc.doc_id.toInt, home,
            wires.map(TokenCodec.toInstatRaw))
        case _ => Vector.empty
      }
    }.sortBy(a => (a.game_id, a.action_idx))

    val got = InstatConvertBatch.toSpadl(
      SpadlPipeline.decodeInstatEvents(spark, docs).toDF())
      .as[SpadlAction].collect().toSeq
      .sortBy(a => (a.game_id, a.action_idx))

    assert(got.size == truth.size,
      s"row count got=${got.size} want=${truth.size}")
    got.zip(truth).foreach { case (a, b) =>
      assert(a == b, s"mismatch at (${b.game_id}, ${b.action_idx}):\n  got=$a\n want=$b")
    }
  }

  test("Catalyst InStat plan: single exchange by game") {
    import spark.implicits._
    val games = FixtureGen.corpus(8, 80).filter(_.doc.source == "instat")
    val docs = spark.createDataset(games.map(_.doc))
    val df = InstatConvertBatch.toSpadl(
      SpadlPipeline.decodeInstatEvents(spark, docs).toDF())
    df.collect()
    val planFull = df.queryExecution.executedPlan.toString
    val plan = planFull.split("== Initial Plan ==")(0)
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges\n$plan")
  }

  test("multi-keypass winner is order-independent (assisst beats key)") {
    import graft.convert.KpWinner
    val g = FixtureGen.corpus(4, 150).filter(_.keypasses.nonEmpty).head
    val ev = g.keypasses.head.event_id
    // duplicate keypass rows for ONE event, opposite delivery orders
    val extraA = SpadlPipeline.Kp(ev, "key") +: SpadlPipeline.Kp(ev, "assisst") +:
      g.keypasses.map(k => SpadlPipeline.Kp(k.event_id, k.pass_type))
    val extraB = extraA.reverse
    val a = SpadlPipeline.convertDoc(g.doc.doc_id, g.doc.tokens, extraA)
    val b = SpadlPipeline.convertDoc(g.doc.doc_id, g.doc.tokens, extraB)
    assert(a == b, "keypass winner depends on delivery order")
    assert(KpWinner.pick("key", "assisst") == "assisst")
    assert(KpWinner.pick("assisst", "key") == "assisst")
    assert(KpWinner.pickAll(Seq("zz", "key")) == "key")
  }

  test("Catalyst conversion plan: single exchange by game, codegen'd") {
    import spark.implicits._
    val games = FixtureGen.corpus(4, 60).filter(_.doc.source == "opta")
    val docs = spark.createDataset(games.map(_.doc))
    val df = OptaConvertBatch.toSpadl(
      SpadlPipeline.decodeOptaEvents(spark, docs).toDF())
    df.collect() // action on the SAME QueryExecution finalizes the AQE plan
    val planFull = df.queryExecution.executedPlan.toString
    val plan = planFull.split("== Initial Plan ==")(0) // AQE echoes nodes
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges\n$plan")
    // AQE final plans mark codegen'd stages with "*(n)" prefixes
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"no codegen stage marker in plan:\n$plan")
  }
}
