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
