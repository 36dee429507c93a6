package graft

import graft.features.Features
import graft.model.SpadlAction
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Feature/label frame semantics (features_old.R + labels_old.R), incl.
  * quirk pins Q5/Q6 and the minute*60+second time basis.
  */
class FeatureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def act(idx: Int, team: Int = 10, minute: Int = 0, second: Int = 0,
      ts: Double = -1, typeId: Int = 0, tn: String = "pass",
      rn: String = "success", sx: Double = 50, sy: Double = 30,
      ex: Double = 60, ey: Double = 35): SpadlAction =
    SpadlAction(1, idx.toDouble, idx, 1, minute, second,
      if (ts >= 0) ts else 60.0 * minute + second, team * 100 + 1, team, 10,
      if (team == 10) "home" else "away", sx, sy, ex, ey, typeId, tn, 1, rn,
      0, "foot", assist = false, keypass = false)

  /** 12 trailing filler actions so probe rows have complete label horizons
    * (rows with incomplete horizons and no positive label get NULL and are
    * drop_na'd — faithful R behavior, but fatal for 4-row test games).
    */
  private def pad(from: Int, fromMinute: Int): Seq[SpadlAction] =
    (0 until 12).map(i => act(from + i, minute = fromMinute + i,
      team = if (i % 2 == 0) 10 else 20))

  private def frame(as: Seq[SpadlAction]) = {
    import spark.implicits._
    Features.trainingFrame(spark.createDataset(as).toDF())
      .collect()
      .map(r => r.getAs[Number]("action_idx").intValue() -> r).toMap
  }

  private def frameRows(as: Seq[SpadlAction]) = {
    import spark.implicits._
    Features.trainingFrame(spark.createDataset(as).toDF())
  }

  test("parametrized lags: nbPrevActions=5 emits a0..a4 with correct shifts") {
    import spark.implicits._
    val as = (1 to 8).map(i => act(i, minute = i)) ++ pad(9, 9)
    val f5 = Features.trainingFrame(spark.createDataset(as).toDF(),
      withLabels = true, nbPrevActions = 5, nrActions = 10)
    assert(f5.columns.count(_.startsWith("type_id_a")) == 5)
    assert(f5.columns.contains("team_4") && f5.columns.contains("dx_a04") &&
      f5.columns.contains("time_delta_4"))
    // deeper lag horizon drops more leading rows to NA
    val rows = f5.collect().map(r =>
      r.getAs[Number]("action_idx").intValue() -> r).toMap
    assert(!rows.contains(4) && rows.contains(5),
      s"rows 1-4 must be NA-dropped at 5 lags, have ${rows.keys.toSeq.sorted}")
    // a4 at row i == a0 of row i-4 (time_seconds varies per row: minute*60)
    val r9 = rows(9)
    assert(r9.getAs[Double]("time_seconds_a4") ==
      rows(5).getAs[Double]("time_seconds_a0"))
    assert(r9.getAs[Double]("time_seconds_a4") == 5 * 60.0)
  }

  test("parametrized labels: nrActions bounds the scoring horizon") {
    import spark.implicits._
    // goal by team 10 at idx 12; probe at idx 3 (9 ahead => within 10, not 2)
    val as = (1 to 11).map(i => act(i, minute = i, team = 10)) :+
      act(12, minute = 12, team = 10, tn = "shot", rn = "success",
        typeId = 11) // goal
    val padded = as ++ pad(13, 13)
    def labelAt(nr: Int): Double = {
      val f = Features.trainingFrame(spark.createDataset(padded).toDF(),
        withLabels = true, nbPrevActions = 3, nrActions = nr)
      f.collect().map(r =>
        r.getAs[Number]("action_idx").intValue() ->
          r.getAs[Double]("scores")).toMap.apply(3)
    }
    assert(labelAt(10) == 1.0, "goal 9 ahead must score at nr=10")
    assert(labelAt(2) == 0.0, "goal 9 ahead must NOT score at nr=2")
  }

  test("modelData: addPredictions replaces labels with model probabilities") {
    import spark.implicits._
    val as = (1 to 10).map(i => act(i, minute = i)) ++ pad(11, 11)
    val df = spark.createDataset(as).toDF()
    val md = Features.modelData(df)
    // row-count guard: a same-lineage join gone cartesian would still pass
    // the per-row probability lookups below — count catches it
    assert(md.count() == Features.trainingFrame(df).count(),
      "modelData must be 1:1 with the training frame")
    val preds = graft.vaep.Valuation.value(df)
      .select($"action_idx", $"scores", $"concedes")
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    md.select($"action_idx", $"scores", $"concedes").collect().foreach { r =>
      val i = r.getAs[Number](0).intValue()
      assert(r.getDouble(1) == preds(i)._1 && r.getDouble(2) == preds(i)._2,
        s"modelData probabilities must match Valuation at idx $i")
      assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0,
        "probability, not a 0/1 label")
    }
    // labels=TRUE, addPredictions=FALSE keeps the 0/1 labels
    val lbl = Features.modelData(df, addPredictions = false)
      .select($"scores").distinct().collect().map(_.getDouble(0)).toSet
    assert(lbl.subsetOf(Set(0.0, 1.0)))
  }

  test("drop_na removes the first two rows of each game (lag NAs)") {
    val as = (1 to 6).map(i => act(i, minute = i))
    val f = frameRows(as ++ pad(7, 7))
    val kept = f.select("action_idx").collect()
      .map(_.getAs[Number]("action_idx").intValue()).sorted
    assert(!kept.contains(1) && !kept.contains(2))
    assert(kept.contains(3) && kept.contains(6))
  }

  test("Q5: bodypart_id_* and result_id_* features carry type_id values") {
    val as = Seq(act(1, typeId = 7, tn = "take_on"),
      act(2, typeId = 11, tn = "shot", rn = "success", minute = 1),
      act(3, typeId = 18, tn = "clearance", minute = 2),
      act(4, typeId = 11, tn = "shot", rn = "success", minute = 3))
    val f = frame(as ++ pad(5, 4))
    val r3 = f(3)
    assert(r3.getAs[Double]("bodypart_id_a0") == 18.0)
    assert(r3.getAs[Double]("result_id_a0") == 18.0)
    assert(r3.getAs[Double]("bodypart_id_a1") == 11.0)
    assert(r3.getAs[Double]("type_id_a2") == 7.0)
  }

  test("Q6: angle is pi/2 on the goal line (dx = 0)") {
    val as = Seq(act(1), act(2, minute = 1),
      act(3, minute = 2, ex = 105.0, ey = 20.0), // end on goal line
      act(4, minute = 3, tn = "shot", typeId = 11, rn = "success"))
    val f = frame(as ++ pad(5, 4))
    assert(f(3).getAs[Double]("end_angle_to_goal_a0") == math.Pi / 2)
  }

  test("feature frame re-flips coordinates for team != home (quirk F2')") {
    val as = Seq(act(1), act(2, minute = 1),
      act(3, team = 20, minute = 2, sx = 30, sy = 20),
      act(4, minute = 3, tn = "shot", typeId = 11, rn = "success"))
    val f = frame(as ++ pad(5, 4))
    assert(f(3).getAs[Double]("start_x_a0") == 105.0 - 30.0)
    assert(f(3).getAs[Double]("start_y_a0") == 68.0 - 20.0)
  }

  test("time features use minute*60+second, not time_seconds (dribble case)") {
    // dribble rows copy minute/second from the NEXT action but carry the
    // midpoint time_seconds (R/opta_spadl.R:170) — the feature frame must
    // use the minute/second basis (features_old.R:258,332)
    val as = Seq(act(1), act(2, minute = 1),
      act(3, minute = 2, second = 4, ts = 117.0), // midpoint ts, min 2 s 4
      act(4, minute = 3, tn = "shot", typeId = 11, rn = "success"))
    val f = frame(as ++ pad(5, 4))
    assert(f(3).getAs[Double]("time_seconds_a0") == 124.0)
    assert(f(3).getAs[Double]("time_delta_1") == 124.0 - 60.0)
  }

  test("labels: goal within next 9 actions by same team; horizon exact") {
    def game(goalAt: Int, n: Int): Seq[SpadlAction] =
      (1 to n).map(i => if (i == goalAt)
        act(i, minute = i, tn = "shot_penalty", typeId = 12, rn = "success")
      else act(i, minute = i))
    // action 3 + 9 = 12: goal at 12 => scores true at 3
    val f1 = frame(game(12, 26))
    assert(f1(3).getAs[Double]("scores") == 1.0)
    // goal at 13 is beyond the 9-lead horizon of 3 => scores 0
    val f2 = frame(game(13, 26))
    assert(f2(3).getAs[Double]("scores") == 0.0)
    // the goal action itself scores
    assert(f1(12).getAs[Double]("scores") == 1.0)
  }

  test("labels: owngoal within horizon sets concedes for both teams (bug-compatible)") {
    val as = Seq(act(1), act(2, minute = 1), act(3, minute = 2),
      act(4, team = 20, minute = 3, tn = "shot", typeId = 11, rn = "owngoal"),
      act(5, minute = 4), act(6, minute = 5),
      act(7, minute = 6, tn = "shot", typeId = 11, rn = "success"))
    val f = frame(as ++ pad(8, 7))
    // labels_old.R:38-44 — the concede team conditions are vacuous: ANY
    // owngoal within the horizon sets concedes regardless of team
    assert(f(3).getAs[Double]("concedes") == 1.0)
    assert(f(4).getAs[Double]("concedes") == 1.0)
  }

  test("one-hot lag columns exist for the full 23-type vocabulary") {
    val as = (1 to 5).map(i => act(i, minute = i)) :+
      act(6, minute = 6, tn = "shot", typeId = 11, rn = "success")
    val cols = frameRows(as ++ pad(7, 7)).columns.toSet
    Seq("type_pass_a0", "type_goalkick_a2", "type_tackle_a1",
      "result_yellow_card_a0", "bodypart_other_a1",
      "dx_a01", "mov_a02", "goalscore_diff",
      "time_seconds_overall_a2").foreach(c =>
      assert(cols.contains(c), s"missing $c"))
    assert(cols.count(c => c.startsWith("type_") &&
      !c.startsWith("type_id_")) == 23 * 3)
  }
}
