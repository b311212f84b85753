package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/**
 * TimeSeries: counter increase/rate with reset detection, gap-fill
 * (LOCF + linear), bounded-window EWMA. Hand-computed small series
 * plus plan-shape and real-events checks.
 */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def series(rows: (String, Long, java.lang.Double)*) =
    rows.toSeq.toDF("k", "ts", "v")

  test("counterIncrease detects resets and skips NULLs as baselines") {
    val df = series(
      ("a", 1L, 10.0), ("a", 2L, 15.0), ("a", 3L, null), ("a", 4L, 18.0),
      ("a", 5L, 4.0),  // reset: 4 < 18 -> increase = 4
      ("b", 1L, 7.0))
    val out = TimeSeries.counterIncrease(df, Seq("k"), "ts", "v")
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq === Seq(
      ("a", 1L, None),          // first sample: no baseline
      ("a", 2L, Some(5.0)),
      ("a", 3L, None),          // NULL value: no increase
      ("a", 4L, Some(3.0)),     // baseline is 15 (the NULL was skipped)
      ("a", 5L, Some(4.0)),     // reset
      ("b", 1L, None)))
  }

  test("counterRate buckets increases and derives per-second rate") {
    val df = series(
      ("a", 0L, 0.0), ("a", 500L, 5.0), ("a", 1500L, 8.0), ("a", 1900L, 2.0))
    val out = TimeSeries.counterRate(df, Seq("k"), "ts", "v", bucketMillis = 1000L)
      .orderBy("bucket_ms").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // bucket 0: first sample contributes nothing, 500ms sample +5
    // bucket 1000: +3 then reset to 2 (+2) = 5
    assert(out.toSeq === Seq((0L, 2L, 5.0, 5.0), (1000L, 2L, 5.0, 5.0)))
  }

  test("counterRate keeps samples-only buckets with zero increase") {
    val df = series(("a", 100L, 42.0))
    val out = TimeSeries.counterRate(df, Seq("k"), "ts", "v", 1000L).collect()
    assert(out.length === 1)
    assert(out(0).getLong(2) === 1L)       // samples
    assert(out(0).getDouble(3) === 0.0)    // increase coalesced
  }

  test("counterRate plans exactly one hash exchange (window partitioning reused)") {
    val ev = sf("sf0.001", "events")
      .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"), F.col("value"))
    val plan = TimeSeries.counterRate(ev, Seq("user_id"), "ms", "value", 3600000L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("gapFill linear interpolates interior cells exactly") {
    val df = series(("a", 0L, 10.0), ("a", 40L, 18.0), ("a", 50L, 20.0))
    val out = TimeSeries.gapFill(df, Seq("k"), "ts", "v", stepMillis = 10L)
      .orderBy("ts").collect()
      .map(r => (r.getLong(1), r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (0L, 10.0, true), (10L, 12.0, false), (20L, 14.0, false),
      (30L, 16.0, false), (40L, 18.0, true), (50L, 20.0, true)))
  }

  test("gapFill locf carries the left observation") {
    val df = series(("a", 0L, 10.0), ("a", 30L, 4.0))
    val out = TimeSeries.gapFill(df, Seq("k"), "ts", "v", 10L, TimeSeries.Locf)
      .orderBy("ts").collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(out.toSeq === Seq((0L, 10.0), (10L, 10.0), (20L, 10.0), (30L, 4.0)))
  }

  test("gapFill drops misaligned and NULL observations, truncates oversize gaps") {
    val df = series(
      ("a", 0L, 1.0), ("a", 15L, 99.0),       // misaligned -> dropped
      ("a", 20L, null),                        // NULL value -> dropped
      ("a", 30L, 4.0),
      ("a", 1000030L, 7.0))                    // 100k-cell gap -> truncated
    val out = TimeSeries.gapFill(df, Seq("k"), "ts", "v", 10L,
        TimeSeries.Linear, maxCellsPerGap = 100L)
      .orderBy("ts").collect().map(r => (r.getLong(1), r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (0L, 1.0, true), (10L, 2.0, false), (20L, 3.0, false), (30L, 4.0, true),
      (1000030L, 7.0, true)))
  }

  test("gapFill per-key grids never cross keys") {
    val df = series(("a", 0L, 1.0), ("a", 20L, 3.0), ("b", 100L, 5.0))
    val out = TimeSeries.gapFill(df, Seq("k"), "ts", "v", 10L)
      .groupBy("k").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out === Map("a" -> 3L, "b" -> 1L))
  }

  test("gapFill plans exactly one hash exchange (repartition-by-key contract)") {
    // gapFill's partitioning contract: repartition by the series key
    // BEFORE the (key, bucket) aggregation — HashPartitioning(user_id)
    // satisfies both the aggregate's ClusteredDistribution(user_id, ms)
    // and the window's ClusteredDistribution(user_id), so the whole
    // agg -> gapFill chain runs on the one explicit exchange.
    val ev = sf("sf0.001", "events")
      .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"), F.col("value"))
    val ms = F.col("ms")
    val hr = ev.repartition(F.col("user_id"))
      .groupBy(F.col("user_id"),
        (ms - F.pmod(ms, F.lit(3600000L))).as("ms"))
      .agg(F.max(F.col("value")).as("v"))
    val plan = TimeSeries.gapFill(hr, Seq("user_id"), "ms", "v", 3600000L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("gapFill survives duplicate aligned timestamps (clamped, no sequence error)") {
    val df = series(("a", 0L, 10.0), ("a", 20L, 3.0), ("a", 20L, 5.0))
    val out = TimeSeries.gapFill(df, Seq("k"), "ts", "v", 10L)
      .orderBy("ts", "filled").collect()
      .map(r => (r.getLong(1), r.getDouble(3), r.getBoolean(4)))
    // the duplicate pair both pass through as observed cells at ts=20;
    // the 0->20 gap interpolates against whichever duplicate leads
    assert(out.length === 4)
    assert(out.count(_._1 == 20L) === 2)
    assert(out.filter(_._1 == 20L).map(_._2).sorted.toSeq === Seq(3.0, 5.0))
    assert(out.forall { case (t, _, obs) => obs || t == 10L })
  }

  test("rollingZScore matches hand-computed mean/stddev; NULL under 2 samples") {
    val df = series(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 60.0))
    val out = TimeSeries.rollingZScore(df, Seq("k"), "ts", "v", window = 3)
      .orderBy("ts").collect()
    assert(out(0).isNullAt(3))                   // single sample
    // rows 1-2: mean 15, sd ~7.0711 -> z of 20 = 0.7071...
    assert(math.abs(out(1).getDouble(3) - (20.0 - 15.0) / math.sqrt(50.0)) < 1e-12)
    val m = 30.0
    val sd = math.sqrt(((10 - m) * (10 - m) + (20 - m) * (20 - m) + (60 - m) * (60 - m)) / 2.0)
    assert(math.abs(out(2).getDouble(3) - (60.0 - m) / sd) < 1e-12)
  }

  test("rollingZScore: flat series yields NULL z (zero variance)") {
    val df = series(("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0))
    val out = TimeSeries.rollingZScore(df, Seq("k"), "ts", "v", 3).collect()
    assert(out.forall(_.isNullAt(3)))
  }

  test("ewma matches the hand-computed normalized fold") {
    val a = 0.5
    val df = series(("a", 1L, 2.0), ("a", 2L, 4.0), ("a", 3L, 8.0))
    val out = TimeSeries.ewma(df, Seq("k"), "ts", "v", alpha = a)
      .orderBy("ts").collect().map(_.getDouble(3))
    // adjust=True: [2], [2*.5+4]/1.5, [2*.25+4*.5+8]/1.75
    assert(math.abs(out(0) - 2.0) < 1e-12)
    assert(math.abs(out(1) - (2.0 * 0.5 + 4.0) / 1.5) < 1e-12)
    assert(math.abs(out(2) - (2.0 * 0.25 + 4.0 * 0.5 + 8.0) / 1.75) < 1e-12)
  }

  test("ewma bounded window forgets old samples; NULL rows stay NULL") {
    val rows = (1L to 10L).map(i => ("a", i, java.lang.Double.valueOf(if (i == 1) 1000.0 else 1.0))) :+
      (("a", 11L, null: java.lang.Double))
    val df = rows.toDF("k", "ts", "v")
    val out = TimeSeries.ewma(df, Seq("k"), "ts", "v", alpha = 0.5, window = 4)
      .orderBy("ts").collect()
    // by row 10 the window holds only 1.0s -> exactly 1.0
    assert(out(9).getDouble(3) === 1.0)
    assert(out(10).isNullAt(3))
  }

  test("counter round-trip on real events: increases are non-negative, rate consistent") {
    val ev = sf("sf0.001", "events")
      .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"), F.col("value"))
    val rated = TimeSeries.counterRate(ev, Seq("user_id"), "ms", "value", 3600000L)
    val bad = rated.filter(F.col("increase") < 0 ||
      F.abs(F.col("rate") * 3600.0 - F.col("increase")) > 1e-9).count()
    assert(bad === 0L)
    assert(rated.count() > 0L)
  }
}
