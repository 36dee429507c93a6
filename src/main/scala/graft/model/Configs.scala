package graft.model

/** Compile-time config tables — the engine equivalent of the reference's
  * JSON config scans (S5, /root/reference/R/config.R:56-72). Mirrored
  * verbatim from /root/reference/inst/extdata/{spadl,opta,instat}_config.json
  * INCLUDING the quirks (SURVEY.md §7.5): Q2 `tackle.action_id == 0`
  * (collides with `pass`; spadl_config.json:12). Lookups in the reference are
  * always BY NAME (R/opta_spadl.R:138-142), which is unique, so the collision
  * is observable only in emitted `type_id` values — replicated here.
  */
object SpadlConfig {
  // spadl_config.json:2-26
  val actiontypes: Seq[(Int, String)] = Seq(
    0 -> "pass",
    1 -> "cross",
    2 -> "throw_in",
    3 -> "freekick_crossed",
    4 -> "freekick_short",
    5 -> "corner_crossed",
    6 -> "corner_short",
    7 -> "take_on",
    8 -> "foul",
    0 -> "tackle", // Q2: duplicate id, verbatim from spadl_config.json:12
    10 -> "interception",
    11 -> "shot",
    12 -> "shot_penalty",
    13 -> "shot_freekick",
    14 -> "keeper_save",
    15 -> "keeper_claim",
    16 -> "keeper_punch",
    17 -> "keeper_pick_up",
    18 -> "clearance",
    19 -> "bad_touch",
    20 -> "non_action",
    21 -> "dribble",
    22 -> "goalkick"
  )
  /** name -> id (unique; the direction the reference actually uses). */
  val actionIdByName: Map[String, Int] =
    actiontypes.map { case (id, n) => n -> id }.toMap

  // spadl_config.json:27-34
  val results: Seq[(Int, String)] = Seq(
    0 -> "fail",
    1 -> "success",
    2 -> "offside",
    3 -> "owngoal",
    4 -> "yellow_card",
    5 -> "red_card"
  )
  val resultIdByName: Map[String, Int] =
    results.map { case (id, n) => n -> id }.toMap

  // spadl_config.json:35-39
  val bodyparts: Seq[(Int, String)] = Seq(0 -> "foot", 1 -> "head", 2 -> "other")
  val bodypartNameById: Map[Int, String] = bodyparts.toMap

  // spadl_config.json:40-47
  val FieldLength = 105.0
  val FieldWidth = 68.0
  val GoalX = 105.0
  val GoalY = 34.0
  val MinDribbleLength = 3.0
  val MaxDribbleLength = 60.0
  val MaxDribbleDuration = 10.0
}

/** Opta provider config — /root/reference/inst/extdata/opta_config.json. */
object OptaConfig {
  // action classification groups (opta_config.json:2-12,27-30)
  val actionTypes: Set[String] = Set(
    "take on", "tackle", "interception", "blocked pass", "save", "claim",
    "punch", "keeper pick-up", "clearance")
  val actionShots: Set[String] = Set("miss", "post", "attempt saved", "goal")
  val actionPass: Set[String] = Set("pass", "offside pass")
  val actionTouch: Set[String] = Set("ball touch")
  val actionFoul: Set[String] = Set("foul")

  /** direct event-name -> SPADL type-name map (opta_config.json:31-39). */
  val directTypeMap: Map[String, String] = Map(
    "take on" -> "take_on",
    "tackle" -> "tackle",
    "interception" -> "interception",
    "blocked pass" -> "interception",
    "save" -> "keeper_save",
    "claim" -> "keeper_claim",
    "punch" -> "keeper_punch",
    "keeper pick-up" -> "keeper_pick_up",
    "clearance" -> "clearance"
  )

  // qualifier ids (opta_config.json:13-26)
  val QPassEndX = "140"
  val QPassEndY = "141"
  val QBlockedX = "146"
  val QBlockedY = "147"
  val QGoalMouthY = "102"
  val QFreekick = "5"
  val QCross = "2"
  val QCorner = "6"
  val QThrowIn = "107"
  val QShotPenalty = "9"
  val QShotFreekick = "26"
  val QOwngoal = "28"
  val QHead: Set[String] = Set("3", "15", "168", "111")
  val QOther = "21"

  /** typeId -> event type name (opta_config.json:53-135, verbatim incl. the
    * duplicate `typeId` 81 — the R left_join keeps the FIRST match order of
    * the table, duplicating rows; a Map keeps the LAST entry, so we pin the
    * first occurrence explicitly to match left-join-first semantics for the
    * only duplicated key).
    */
  val typeTable: Map[Int, String] = Map(
    1 -> "pass", 2 -> "offside pass", 3 -> "take on", 4 -> "foul",
    5 -> "out", 6 -> "corner awarded", 7 -> "tackle", 8 -> "interception",
    9 -> "turnover", 10 -> "save", 11 -> "claim", 12 -> "clearance",
    13 -> "miss", 14 -> "post", 15 -> "attempt saved", 16 -> "goal",
    17 -> "card", 18 -> "player off", 19 -> "player on",
    20 -> "player retired", 21 -> "player returns",
    22 -> "player becomes goalkeeper", 23 -> "goalkeeper becomes player",
    24 -> "condition change", 25 -> "official change", 26 -> "unknown26",
    27 -> "start delay", 28 -> "end delay", 29 -> "unknown29",
    30 -> "end", 31 -> "unknown31", 32 -> "start", 33 -> "unknown33",
    34 -> "team set up", 35 -> "player changed position",
    36 -> "player changed jersey number", 37 -> "collection end",
    38 -> "temp_goal", 39 -> "temp_attempt", 40 -> "formation change",
    41 -> "punch", 42 -> "good skill", 43 -> "deleted event",
    44 -> "aerial", 45 -> "challenge", 46 -> "unknown46",
    47 -> "rescinded card", 48 -> "unknown46", 49 -> "ball recovery",
    50 -> "dispossessed", 51 -> "error", 52 -> "keeper pick-up",
    53 -> "cross not claimed", 54 -> "smother", 55 -> "offside provoked",
    56 -> "shield ball opp", 57 -> "foul throw in", 58 -> "penalty faced",
    59 -> "keeper sweeper", 60 -> "chance missed", 61 -> "ball touch",
    62 -> "unknown62", 63 -> "temp_save", 64 -> "resume",
    65 -> "contentious referee decision", 66 -> "possession data",
    67 -> "50/50", 68 -> "referee drop ball", 69 -> "failed to block",
    70 -> "injury time announcement", 71 -> "coach setup",
    72 -> "caught offside", 73 -> "other ball contact", 74 -> "blocked pass",
    75 -> "delayed start", 76 -> "early end", 77 -> "player off pitch",
    79 -> "Coverage interruption", 80 -> "Drop of ball",
    81 -> "Obstacle" // first of the two typeId=81 rows (opta_config.json:133-134)
  )
}

/** InStat provider config — /root/reference/inst/extdata/instat_config.json
  * plus the action-id vocabulary used by the extractors
  * (/root/reference/R/instat_spadl.R:199-429).
  */
object InstatConfig {
  /** body_id -> (bodypart_id, bodypart_name); instat_config.json:17-42.
    * Missing body_id defaults to 1 = foot (R/instat_spadl.R:58).
    */
  val bodypartByBodyId: Map[Int, (Int, String)] = Map(
    3 -> (1, "head"),
    2 -> (0, "foot"),
    1 -> (0, "foot"),
    5 -> (2, "other")
  )

  // action ids consumed by the extractors (R/instat_spadl.R:199-429)
  val AGoal = 8010
  val AOwngoal = 8020
  val AYellowCard = 3020
  val ARedCard = 3030
  val AOffside = 3040
  val ADribble = 21000 // matched by BOTH take_on and dribble extractors (Q3)
  val ATackle1 = 2052
  val ATackle2 = 2031
  val AInterception = 6020
  val AClearance = 9000
  val ABadTouch = 10000
  val AKeeperPickUp = 7000
  val AKeeperSave1 = 13040
  val AKeeperSave2 = 13011
  val AFoul = 3010
  val GkPositionId = 31
  // generic_action_type_id values
  val GatShot = 4
  val GatPass = 1
  val GatCross = 26
  val GatBallOut = 27
  val GatMatchStatus = 18
  // standart_id values
  val StdOpenPlay = 1
  val StdThrowIn = 2
  val StdIndirectFreekick = 3
  val StdDirectFreekick = 4
  val StdCorner = 5
  val StdPenalty = 6

  /** action_id -> action_name vocabulary for the fixture feed. The reference
    * reads `action_name` strings straight from the InStat documents and only
    * ever tests them with grepl("cross") (R/instat_spadl.R:259-260,345); this
    * deterministic map defines the names our token codec reconstructs.
    */
  val actionNameById: Map[Int, String] = Map(
    8010 -> "goal",
    8020 -> "own goal",
    3020 -> "yellow card",
    3030 -> "red card",
    3040 -> "offside",
    3010 -> "foul",
    21000 -> "dribbling",
    2052 -> "unsuccessful dribbling",
    2031 -> "tackle",
    6020 -> "interception",
    9000 -> "clearance",
    10000 -> "bad ball control",
    7000 -> "keeper pick-up",
    13040 -> "save",
    13011 -> "good interception",
    1011 -> "accurate pass",
    1012 -> "inaccurate pass",
    26001 -> "cross accurate",
    26002 -> "cross inaccurate",
    2020 -> "challenge",
    27000 -> "ball out of the field",
    18000 -> "match status",
    5010 -> "shot on target",
    5020 -> "shot wide"
  )
  def actionName(actionId: Int): String =
    actionNameById.getOrElse(actionId, s"action_$actionId")
}
