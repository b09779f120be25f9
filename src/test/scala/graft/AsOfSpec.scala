package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** As-of join semantics: most recent right row at-or-before each left row,
  * per key; inclusive at equal timestamps; null when nothing precedes.
  */
class AsOfSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("asof picks the latest at-or-before right row per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, ts(10)), (1L, 101L, ts(25)), (1L, 102L, ts(5)),
      (2L, 200L, ts(50)), (3L, 300L, ts(7))
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts(10), 1.0), (1L, ts(20), 2.0), (1L, ts(30), 3.0),
      (2L, ts(49), 9.0)
    ).toDF("user_id", "ts", "value")
    val out = AsOf.asofJoin(left, right, Seq("user_id"), "ts", "ts",
      Map("ts" -> "p_ts", "value" -> "p_value"))
      .collect().map(r => (r.getLong(1),
        Option(r.getAs[Timestamp]("p_ts")).map(_.getTime / 1000),
        Option(r.getAs[Any]("p_value")).map(_.asInstanceOf[Double]))).toSet
    assert(out == Set(
      (100L, Some(10L), Some(1.0)), // equal ts → inclusive
      (101L, Some(20L), Some(2.0)), // 25 picks 20, not 30
      (102L, None, None),           // nothing at-or-before 5
      (200L, Some(49L), Some(9.0)),
      (300L, None, None)))          // key with no right rows at all
  }

  test("latestPerKeyTime dedups (key, time) deterministically") {
    import spark.implicits._
    val df = Seq((1L, ts(10), 5.0), (1L, ts(10), 7.0), (1L, ts(11), 1.0))
      .toDF("user_id", "ts", "value")
    val d = AsOf.latestPerKeyTime(df, Seq("user_id"), "ts", "value")
      .collect().map(r => (r.getTimestamp(1).getTime / 1000, r.getDouble(2))).toSet
    assert(d == Set((10L, 7.0), (11L, 1.0)))
  }

  test("intervalJoin == naive BETWEEN join, including bucket-boundary edges") {
    import spark.implicits._
    import graft.operators.RangeJoin
    // intervals straddling bucket edges (width 10): [5,14], [10,10], [29,41]
    val iv = Seq((1L, 5L, 14L, "a"), (1L, 10L, 10L, "b"), (2L, 29L, 41L, "c"))
      .toDF("k", "lo", "hi", "tag")
    val pts = Seq((1L, 9L), (1L, 10L), (1L, 14L), (1L, 15L),
      (2L, 30L), (2L, 41L), (2L, 42L), (3L, 10L)).toDF("k", "p")
    val fast = RangeJoin.intervalJoin(pts, iv, Seq("k"), "p", "lo", "hi", 10L)
      .select("k", "p", "tag")
    val slow = pts.join(iv, Seq("k"))
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("k", "p", "tag")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    assert(fast.count() == 6) // (9,a)(10,a)(10,b)(14,a)(30,c)(41,c)
  }

  test("asof over real events matches a window-free nested-loop oracle on a sample") {
    val ev = Tables.events(spark, sf())
    val clicks = ev.filter(col("event_type") === "click" && col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = AsOf.latestPerKeyTime(
      ev.filter(col("event_type") === "purchase" && col("user_id") < 20)
        .select(col("user_id"), col("ts"), col("value")),
      Seq("user_id"), "ts", "value")
    val fast = AsOf.asofJoin(clicks, purchases, Seq("user_id"), "ts", "ts",
      Map("ts" -> "p_ts", "value" -> "p_value"))
    // oracle: theta-join + argmax — O(n·m), fine on the sample
    val slow = clicks.as("c").join(purchases.as("p"),
        col("c.user_id") === col("p.user_id") && col("c.ts") >= col("p.ts"), "left")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("c.user_id"), col("c.event_id"))
          .orderBy(col("p.ts").desc_nulls_last)))
      .filter(col("__rn") === 1)
      .select(col("c.user_id"), col("c.event_id"), col("c.ts"),
        col("p.ts").as("p_ts"), col("p.value").as("p_value"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("funnel (x75): strictly-after ordering gates each stage; retention (x76) buckets by first day") {
    import spark.implicits._
    def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    // u1 completes the funnel in order; u2 clicked BEFORE viewing (click
    // must not count — no click after the first view, so u2 stalls at
    // view); u3 views only; u4 purchases without ever viewing (not in
    // the funnel at all)
    val ev = Seq(
      (1L, "view", ts(1, 1)), (1L, "click", ts(1, 2)), (1L, "purchase", ts(2, 3)),
      (2L, "click", ts(1, 1)), (2L, "view", ts(1, 2)),
      (3L, "view", ts(3, 1)),
      (4L, "purchase", ts(1, 1))
    ).toDF("user_id", "event_type", "ts")
    val f = graft.operators.EventAnalytics
      .funnel(ev, "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(f == Map("view" -> 3L, "click" -> 1L, "purchase" -> 1L))
    // conversion window: u1's purchase is ~25h after its click — a 12h
    // window drops it while the click (1h after view) survives
    val fw = graft.operators.EventAnalytics
      .funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), withinMinutes = Some(720))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(fw == Map("view" -> 3L, "click" -> 1L, "purchase" -> 0L))
    // retention: u1 active day1+day2 (offset 0,1); u2 day1; u3 day3
    // (its own cohort); u4 day1
    val r = graft.operators.EventAnalytics.retention(ev, "user_id", "ts")
      .collect().map(x => (x.getDate(0).toString, x.getLong(1)) -> x.getLong(2)).toMap
    assert(r == Map(
      ("2024-01-01", 0L) -> 3L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-03", 0L) -> 1L))
    graft.engine.CacheScope.drain()
  }

  test("attribution (x80): last-touch picks the latest preceding touch, linear splits fractionally, lookback gates") {
    import spark.implicits._
    def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    // u1: view(1h) → click(2h) → purchase(3h, 10.0): last touch = click,
    //     linear = 5.0 view + 5.0 click, 0.5 conv each.
    // u2: click only AFTER the purchase — no credit at all.
    // u3: view 100h before purchase (outside the 72h lookback) — no credit.
    // u4: two views then purchase(12.0): last touch = the LATER view
    //     (t_id tiebreak not needed, ts differ); linear = 6.0 + 6.0 both
    //     to view channel → 12.0, 1.0 conv.
    val ev = Seq(
      (100L, 1L, "view", ts(1, 1), 0.0), (101L, 1L, "click", ts(1, 2), 0.0),
      (102L, 1L, "purchase", ts(1, 3), 10.0),
      (103L, 2L, "purchase", ts(1, 5), 7.0), (104L, 2L, "click", ts(1, 6), 0.0),
      (105L, 3L, "view", ts(1, 1), 0.0), (106L, 3L, "purchase", ts(5, 9), 9.0),
      (107L, 4L, "view", ts(2, 1), 0.0), (108L, 4L, "view", ts(2, 2), 0.0),
      (109L, 4L, "purchase", ts(2, 4), 12.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val a = graft.operators.EventAnalytics.attribution(ev,
        "user_id", "event_type", "ts", "value", "event_id",
        Seq("view", "click"), "purchase", lookbackHours = 72)
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> ((x.getDouble(2), x.getDouble(3))))
      .toMap
    assert(a == Map(
      ("last_touch", "click") -> ((1.0, 10.0)),
      ("last_touch", "view") -> ((1.0, 12.0)),
      ("linear", "click") -> ((0.5, 5.0)),
      ("linear", "view") -> ((1.5, 17.0))))
    graft.engine.CacheScope.drain()
  }

  test("session paths (x82): gap splits sessions, order is (ts, event_id), top-k ties break by path") {
    import spark.implicits._
    def ts(day: Int, h: Int, m: Int) =
      Timestamp.valueOf(f"2024-01-$day%02d $h%02d:$m%02d:00")
    // u1 session 1: view>click; 40-min gap → session 2: purchase.
    // u2 one session: view>click (same-minute events ordered by event_id).
    // u3 one session: click alone.
    val ev = Seq(
      (1L, 1L, "view", ts(1, 9, 0)), (2L, 1L, "click", ts(1, 9, 10)),
      (3L, 1L, "purchase", ts(1, 9, 55)),
      (4L, 2L, "view", ts(1, 12, 0)), (5L, 2L, "click", ts(1, 12, 0)),
      (6L, 3L, "click", ts(2, 8, 0))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val p = graft.operators.EventAnalytics.sessionPaths(ev, gapMinutes = 30, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // view>click twice; the two singleton paths tie at 1 → path order
    assert(p.toSeq == Seq("view>click" -> 2L, "click" -> 1L, "purchase" -> 1L))
  }

  test("rate anomalies (x83): planted spike flagged, incomplete baselines skipped, no self-leakage") {
    import spark.implicits._
    // 30 hourly buckets alternating 10/11 events (nonzero baseline
    // variance), hour 27 spiking to 100
    val base = Timestamp.valueOf("2024-01-01 00:00:00").toInstant
    val rows = for {
      h <- 0 until 30
      n = if (h == 27) 100 else 10 + h % 2
      i <- 0 until n
    } yield (h.toLong * 1000 + i, 1L, "view",
      Timestamp.from(base.plusSeconds(h * 3600L + i)))
    val ev = rows.toDF("event_id", "user_id", "event_type", "ts")
    val a = graft.operators.EventAnalytics.rateAnomalies(ev, trailing = 24, z = 3.0)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2)))
    // ONLY hour 27 flags: hours 0-23 lack a full baseline; hour 28-29's
    // baselines CONTAIN the spike, inflating sd past their own deviation
    assert(a.toSeq == Seq(("view", "2024-01-02 03:00:00.0", 100L)))
  }
}
