package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}

/**
 * Forces ObjectHashAggregate's sort-based fallback (threshold 2) so the
 * TypedImperativeAggregate serialize/deserialize/merge path runs under
 * spill conditions — the code path a memory-pressured cluster hits.
 */
class FallbackSpec extends SparkTestBase {
  import spark.implicits._

  private def withFallback[T](f: => T): T = {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "2")
    try f
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("sketch aggregation is identical under sort-based fallback") {
    val df = spark.range(20000)
      .select(($"id" % 100).as("k"), ($"id" % 997).cast("double").as("v"))
    val normal = df.groupBy($"k")
      .agg(G.ddsketch_agg_values($"v").as("s"))
      .select($"k", G.ddsketch_count($"s").as("c"), G.ddsketch_quantile($"s", 0.9).as("p90"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val fallback = withFallback {
      df.groupBy($"k")
        .agg(G.ddsketch_agg_values($"v").as("s"))
        .select($"k", G.ddsketch_count($"s").as("c"), G.ddsketch_quantile($"s", 0.9).as("p90"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    }
    assert(normal == fallback)
    assert(normal.size == 100)
    assert(normal.values.map(_._1).sum == 20000L)
  }

  test("stats aggregation keeps exact sum/min/max under fallback") {
    val df = spark.range(5000)
      .select(($"id" % 50).as("k"), ($"id".cast("double") + 0.25).as("v"))
    val exact = df.groupBy($"k")
      .agg(F.sum($"v").as("es"), F.min($"v").as("emn"), F.max($"v").as("emx"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val viaSketch = withFallback {
      df.groupBy($"k")
        .agg(G.ddsketch_stats_agg_values($"v").as("st"))
        .select($"k", $"st.sum", $"st.min", $"st.max")
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    }
    exact.foreach { case (k, (es, emn, emx)) =>
      val (ss, smn, smx) = viaSketch(k)
      // the exact-stats shuffle side channel must survive fallback
      // serialization: sum may differ only by double addition order
      assert(math.abs(ss - es) <= math.abs(es) * 1e-12, s"k=$k sum $ss vs $es")
      assert(smn == emn, s"k=$k min")
      assert(smx == emx, s"k=$k max")
    }
  }

  test("kmv aggregation is identical under fallback") {
    val df = spark.range(30000).select(($"id" % 64).as("k"), ($"id" % 5000).as("v"))
    val normal = df.groupBy($"k")
      .agg(kmv.kmv_distinct(kmv.kmv_agg($"v")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fallback = withFallback {
      df.groupBy($"k")
        .agg(kmv.kmv_distinct(kmv.kmv_agg($"v")).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(normal == fallback)
  }
}
