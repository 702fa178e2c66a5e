package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  private def fixtures = {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), 100L),
      (1L, ts(20), 101L),
      (1L, ts(5), 102L),   // before any right row
      (2L, ts(15), 103L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(8), 8.0, 200L),
      (1L, ts(10), 10.0, 201L),  // exactly simultaneous with left@10
      (1L, ts(10), 11.0, 202L),  // same ts, larger id — must win
      (1L, ts(18), 18.0, 203L),
      (2L, ts(1), 1.0, 204L))
      .toDF("user_id", "ts", "value", "event_id")
    (left, right)
  }

  test("picks the latest right at or before each left time; ties by id") {
    val (l, r) = fixtures
    val out = AsOfJoin.asof(l, r, "user_id", "ts", "ts",
        Seq("value", "event_id"), tiebreak = "event_id")
      .collect().map(row => row.getAs[Long]("event_id") ->
        Option(row.getAs[java.lang.Double]("asof_value")).map(_.toDouble)).toMap
    assert(out(100L).contains(11.0)) // simultaneous right visible, larger id wins
    assert(out(101L).contains(18.0))
    assert(out(102L).isEmpty)        // nothing at or before 10:05
    assert(out(103L).contains(1.0))
  }

  test("tolerance nulls out stale payloads") {
    val (l, r) = fixtures
    val out = AsOfJoin.asof(l, r, "user_id", "ts", "ts",
        Seq("value"), tiebreak = "event_id", toleranceMs = 5 * 60000L)
      .collect().map(row => row.getAs[Long]("event_id") ->
        Option(row.getAs[java.lang.Double]("asof_value"))).toMap
    assert(out(100L).isDefined)  // right@10 within 5 min of left@10
    assert(out(101L).isDefined)  // right@18 within 5 min of left@20
    assert(out(103L).isEmpty)    // right@01 is 14 min stale for left@15
  }

  test("null payload on the matched right row stays null, never an older row's value") {
    import spark.implicits._
    val left = Seq((1L, ts(30), 300L)).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(10), Option(5.0), 210L),
      (1L, ts(25), Option.empty[Double], 211L)) // latest right: NULL value
      .toDF("user_id", "ts", "value", "event_id")

    // Unbounded: all payload columns must come from the ts(25) row.
    val row = AsOfJoin.asof(left, right, "user_id", "ts", "ts",
        Seq("value", "event_id"), tiebreak = "event_id").collect().head
    assert(Option(row.getAs[java.lang.Double]("asof_value")).isEmpty)
    assert(row.getAs[Long]("asof_event_id") == 211L)

    // Tolerance 10 min: matched row ts(25) is fresh for left ts(30),
    // and the stale ts(10) value must not leak through it.
    val tol = AsOfJoin.asof(left, right, "user_id", "ts", "ts",
        Seq("value", "event_id"), tiebreak = "event_id",
        toleranceMs = 10 * 60000L).collect().head
    assert(Option(tol.getAs[java.lang.Double]("asof_value")).isEmpty)
    assert(tol.getAs[Long]("asof_event_id") == 211L)
  }

  test("forward direction picks the earliest right at or after each left") {
    val (l, r) = fixtures
    val out = AsOfJoin.asof(l, r, "user_id", "ts", "ts",
        Seq("value", "event_id"), tiebreak = "event_id", direction = "forward")
      .collect().map(row => row.getAs[Long]("event_id") ->
        Option(row.getAs[java.lang.Double]("asof_value")).map(_.toDouble)).toMap
    assert(out(102L).contains(8.0))  // left@05 → right@08
    assert(out(100L).contains(10.0)) // simultaneous right visible; SMALLEST id wins
    assert(out(101L).isEmpty)        // nothing at or after 10:20 for user 1
    assert(out(103L).isEmpty)        // user 2's only right is before 10:15
  }

  test("forward tolerance bounds the wait ahead") {
    val (l, r) = fixtures
    val out = AsOfJoin.asof(l, r, "user_id", "ts", "ts",
        Seq("value"), tiebreak = "event_id", toleranceMs = 2 * 60000L,
        direction = "forward")
      .collect().map(row => row.getAs[Long]("event_id") ->
        Option(row.getAs[java.lang.Double]("asof_value"))).toMap
    assert(out(102L).isEmpty)   // right@08 is 3 min ahead of left@05 > 2 min
    assert(out(100L).isDefined) // simultaneous match, gap 0
  }

  test("nearest picks the closer side, ties to backward, tolerance bounds both") {
    val (l, r) = fixtures
    def run(tolMs: Long) = AsOfJoin.asof(l, r, "user_id", "ts", "ts",
        Seq("value", "event_id"), tiebreak = "event_id",
        toleranceMs = tolMs, direction = "nearest")
      .collect().map(row => row.getAs[Long]("event_id") ->
        Option(row.getAs[java.lang.Double]("asof_value")).map(_.toDouble)).toMap

    val out = run(0L)
    // left@10: backward gap 0 (simultaneous right) vs forward gap 8 min
    assert(out(100L).contains(11.0))
    // left@20: backward 10:18 (2 min) beats nothing ahead
    assert(out(101L).contains(18.0))
    // left@05: nothing before, nearest ahead is 10:08
    assert(out(102L).contains(8.0))
    // user 2: only a backward match exists
    assert(out(103L).contains(1.0))

    // 2-minute tolerance: left@05's forward match (3 min ahead) is now
    // too far; left@20's backward (2 min) still qualifies
    val tight = run(2L * 60 * 1000)
    assert(tight(102L).isEmpty)
    assert(tight(101L).contains(18.0))
  }

  test("matches a brute-force per-row computation on events data") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    import org.apache.spark.sql.functions._
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
    val got = AsOfJoin.asof(clicks, purch, "user_id", "ts", "ts",
        Seq("event_id"), tiebreak = "event_id")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_event_id")).map(_.toLong)).toMap

    val purchRows = purch.collect().map(r => (r.getLong(0),
      r.getAs[Timestamp](1).getTime, r.getAs[Long]("event_id")))
    val expected = clicks.collect().map { r =>
      val (u, t, id) = (r.getLong(0), r.getAs[Timestamp](1).getTime, r.getLong(2))
      val best = purchRows.filter(p => p._1 == u && p._2 <= t)
        .sortBy(p => (p._2, p._3)).lastOption.map(_._3)
      id -> best
    }.toMap
    assert(got == expected)
  }
}
