package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}

class SketchOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("salted aggregation is byte-identical to direct aggregation") {
    val events = sf("sf0.001", "events")
    val direct = events.groupBy($"event_type")
      .agg(G.ddsketch_agg_values($"value").as("sketch"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val salted = SketchOps.saltedSketchAgg(events, Seq("event_type"), "value", 13)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, bytes) =>
      assert(java.util.Arrays.equals(bytes, salted(k)),
        s"salted sketch differs for $k")
    }
  }

  test("trimOutliers drops planted extremes, keeps the bulk, never shuffles the corpus") {
    val base = (1 to 1000).map(i => ("g", i.toDouble))
    val outliers = Seq(("g", 1.0e9), ("g", -1.0e9))
    val df = (base ++ outliers).toDF("k", "v").repartition(4)
    val kept = SketchOps.trimOutliers(df, Seq("k"), "v", 0.001, 0.999)
    val vals = kept.select("v").as[Double].collect()
    assert(!vals.contains(1.0e9) && !vals.contains(-1.0e9))
    // the bulk survives: at most a handful of rows near the cut lines drop
    assert(vals.length >= 990 && vals.length <= 1002)
    // full-range quantiles keep everything
    assert(SketchOps.trimOutliers(df, Seq("k"), "v", 0.0, 1.0).count() === 1002)
    // corpus side re-attaches bounds by broadcast: only the bounds
    // aggregation hash-shuffles
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan)
  }

  test("time-bucketed sketches roll up to exact totals") {
    val events = sf("sf0.001", "events")
    val hourly = SketchOps.timeBucketedSketches(events, "ts", Seq("event_type"), "value")
    val total = hourly.groupBy($"event_type")
      .agg(G.ddsketch_count(G.ddsketch_agg($"sketch")).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(total == exact)
  }
}
