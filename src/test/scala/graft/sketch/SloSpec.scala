package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}

class SloSpec extends SparkTestBase {
  import spark.implicits._

  test("burnRate = (1 - compliance) / budget on a known distribution") {
    // 100 values 1..100, objective 90 → compliance ~0.90 (±accuracy),
    // budget 0.2 → burn ~0.5
    val sk = (1 to 100).map(_.toDouble).toDF("v")
      .agg(G.ddsketch_agg_values(F.col("v")).as("sk"))
    val (c, b) = sk.select(
        Slo.compliance(F.col("sk"), 90.0),
        Slo.burnRate(F.col("sk"), 90.0, 0.2))
      .as[(Double, Double)].head()
    assert(math.abs(c - 0.90) < 0.03, s"compliance $c")
    assert(math.abs(b - (1.0 - c) / 0.2) < 1e-12, s"burn $b vs $c")
  }

  test("multiWindowBurn alerts only when BOTH windows burn above threshold") {
    val hour = 3600000L
    // key "bad": short AND long windows violate (values 200 > objective)
    // key "recovered": long window violates, short window healthy
    val rows = (0 until 48).flatMap { h =>
      val ts = new java.sql.Timestamp(1700000000000L + h * hour)
      val recent = h >= 46   // the short (2h) window
      Seq(
        ("bad", ts, 200.0),
        ("recovered", ts, if (recent) 1.0 else 200.0))
    }
    val df = rows.toDF("event_type", "ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_slo").toString
    SketchView.materialize(df, "ts", Seq("event_type"), "value", dir)
    val until = 1700000000000L + 48 * hour
    val out = Slo.multiWindowBurn(spark, dir, Seq("event_type"),
        objective = 100.0, budget = 0.1, untilMs = until,
        shortMs = 2 * hour, longMs = 48 * hour, threshold = 1.0)
      .select("event_type", "alert").as[(String, Boolean)].collect().toMap
    assert(out("bad") === true)
    assert(out("recovered") === false)   // short window healthy → no page
  }

  test("exhaustionForecast: consumed math, hot exhausts before cool, zero burn = never") {
    val hour = 3600000L
    // 48h elapsed of a 30-day period (elapsed fraction 1/15);
    // base hour-ALIGNED so the first event's bucket is in-window
    val base = 472224L * hour
    val rows = (0 until 48).flatMap { h =>
      val ts = new java.sql.Timestamp(base + h * hour)
      Seq(
        ("hot", ts, 200.0),                          // burn 10
        ("cool", ts, if (h % 10 == 0) 200.0 else 1.0), // burn ~0.5
        ("clean", ts, 1.0))                          // burn 0 → never
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_slo_fc").toString
    SketchView.materialize(
      rows.toDF("event_type", "ts", "value"), "ts", Seq("event_type"), "value", dir)
    val until = base + 48 * hour
    val periodMs = 720 * hour
    val out = Slo.exhaustionForecast(spark, dir, Seq("event_type"),
        objective = 100.0, budget = 0.1, periodStartMs = until - 48 * hour,
        untilMs = until, periodMs = periodMs, recentMs = 48 * hour)
      .select("event_type", "n_period", "consumed_frac", "burn_recent",
        "exhaust_at_ms")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(out("hot")._1 === 48L)
    assert(math.abs(out("hot")._2 - 10.0 / 15.0) < 1e-9) // burn 10 × 1/15
    assert(math.abs(out("hot")._3 - 10.0) < 1e-9)
    // cool: 5 of 48 violate → burn = (5/48)/0.1
    assert(math.abs(out("cool")._3 - (5.0 / 48.0) / 0.1) < 1e-9)
    val (hotAt, coolAt) = (out("hot")._4.get, out("cool")._4.get)
    assert(hotAt > until && coolAt > hotAt, s"$hotAt vs $coolAt")
    assert(out("clean")._4 === None) // zero burn: never exhausts
  }

  test("multiWindowBurn surfaces keys quiet in the short window") {
    val hour = 3600000L
    // "gone" stops reporting before the short window opens — the
    // stopped-reporting service an SLO dashboard must still show
    val rows = (0 until 48).flatMap { h =>
      val ts = new java.sql.Timestamp(1700000000000L + h * hour)
      Seq(("live", ts, 200.0)) ++
        (if (h < 40) Seq(("gone", ts, 200.0)) else Nil)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_slo_q").toString
    SketchView.materialize(
      rows.toDF("event_type", "ts", "value"), "ts", Seq("event_type"), "value", dir)
    val until = 1700000000000L + 48 * hour
    val out = Slo.multiWindowBurn(spark, dir, Seq("event_type"),
        objective = 100.0, budget = 0.1, untilMs = until,
        shortMs = 2 * hour, longMs = 48 * hour, threshold = 1.0)
      .select("event_type", "n_short", "burn_short", "alert")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.isNullAt(2), r.getBoolean(3)))).toMap
    assert(out.contains("gone"), "quiet key must not be dropped")
    assert(out("gone") === ((0L, true, false)))
    assert(out("live")._1 > 0L && out("live")._3 === true)
  }
}
