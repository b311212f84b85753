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
