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

  test("quantileBuckets yields near-equal bucket depths on a skewed distribution") {
    // exponential-ish skew: value = i^2
    val df = (1 to 10000).map(i => ("g", (i.toDouble * i))).toDF("k", "v")
      .repartition(4)
    val out = SketchOps.quantileBuckets(df, Seq("k"), "v", 10)
    val counts = out.groupBy("bucket").count()
      .as[(Int, Long)].collect().toMap
    assert(counts.keySet === (0 until 10).toSet)
    // equi-depth within the sketch's accuracy: every decile within 20%
    counts.values.foreach(c => assert(math.abs(c - 1000L) <= 200L, counts))
    // NULL value -> NULL bucket, never an error
    val withNull = Seq(("g", Option.empty[Double]), ("g", Some(1.0)))
      .toDF("k", "v")
    assert(SketchOps.quantileBuckets(withNull, Seq("k"), "v", 4)
      .filter(F.col("bucket").isNull).count() === 1L)
    // corpus never shuffles: bounds re-attach by broadcast
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan)
  }

  test("keyCountProfile reports exact skew facts and accurate count quantiles") {
    // 1 hot key with 1000 rows + 100 uniform keys with 10 rows each
    val rows = (1L to 1000L).map(_ => "hot") ++
      (1 to 100).flatMap(k => (1 to 10).map(_ => s"k$k"))
    val df = rows.toDF("key")
    val p = SketchOps.keyCountProfile(df, Seq("key")).collect().head
    assert(p.getAs[Long]("n_keys") === 101L)
    assert(p.getAs[Long]("n_rows") === 2000L)
    assert(p.getAs[Long]("max_count") === 1000L)
    assert(math.abs(p.getAs[Double]("mean_count") - 2000.0 / 101) < 1e-12)
    assert(math.abs(p.getAs[Double]("skew_ratio") - 1000.0 * 101 / 2000) < 1e-12)
    // the count distribution is ~all 10s: p50/p90 within sketch accuracy
    assert(math.abs(p.getAs[Double]("p50") - 10.0) <= 0.35)
    assert(math.abs(p.getAs[Double]("p90") - 10.0) <= 0.35)
    // q=0.999 of 101 counts is still the 100th order statistic (10) —
    // the hot key surfaces through max_count, not a quantile
    assert(math.abs(p.getAs[Double]("p999") - 10.0) <= 0.35)
    // two exchanges: per-key count + 1-row rollup
    val plan = SketchOps.keyCountProfile(df, Seq("key"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan)
  }

  test("bloomPrune keeps every matching row, drops most others, stays map-only") {
    val big = spark.range(0, 20000).toDF("k")
    val small = spark.range(0, 20000, 500).toDF("j")      // 40 keys
    val pruned = SketchOps.bloomPrune(big, "k", small, "j", 1000L, 0.01)
    val kept = pruned.as[Long].collect().toSet
    val matching = (0L until 20000L by 500L).toSet
    assert(matching.subsetOf(kept))                        // no false negatives
    assert(kept.size < 2000, s"pruned ${kept.size}")       // actually prunes
    // joining the pruned side equals the plain join exactly
    val plain = big.join(small, $"k" === $"j").as[(Long, Long)].collect().toSet
    val viaPrune = pruned.join(small, $"k" === $"j").as[(Long, Long)].collect().toSet
    assert(viaPrune === plain)
    // the big side sees no exchange before the filter (1-row broadcast only)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    // NULL big keys are dropped
    val withNull = Seq(Some(0L), None).toDF("k")
    assert(SketchOps.bloomPrune(withNull, "k", small, "j").count() === 1L)
  }

  test("robustZScores flags planted outliers without the outliers skewing the scale") {
    val rnd = new scala.util.Random(3)
    // bulk ~ Uniform[90, 110] + three planted 10000s; a mean/stddev
    // z-score would be dragged by the outliers, the robust one is not
    val bulk = Seq.tabulate(2000)(i => ("a", 90.0 + 20.0 * rnd.nextDouble(), i.toLong))
    val planted = Seq(("a", 10000.0, 9001L), ("a", 10000.0, 9002L), ("a", 10000.0, 9003L))
    val constant = Seq.tabulate(50)(i => ("c", 42.0, 10000L + i))
    val df = (bulk ++ planted ++ constant).toDF("k", "v", "id")
    val out = SketchOps.robustZScores(df, Seq("k"), "v")
      .select($"id", $"robust_z").as[(Long, Option[Double])].collect().toMap
    planted.foreach { case (_, _, id) => assert(out(id).get > 100.0) }
    bulk.foreach { case (_, _, id) => assert(math.abs(out(id).get) < 3.0) }
    // constant group: MAD sits at the sketch's own resolution
    // (~alpha * median), so scores stay bounded near 0 — a constant
    // group never gets spuriously flagged, and never divides by zero
    constant.foreach { case (_, _, id) =>
      assert(out(id).forall(z => math.abs(z) < 1.0), out(id))
    }

    val stats = SketchOps.robustStats(df.filter($"k" === "a"), Seq("k"), "v")
      .select($"median", $"mad").as[(Double, Double)].head()
    // bin_to_value overshoots by up to ~3.5% (RankTol): median 100 can
    // read as ~103.5; the point is outlier-immunity, not exactness
    assert(math.abs(stats._1 - 100.0) < 4.0)    // median ~100, outlier-immune
    assert(stats._2 < 9.0)                      // MAD ~5-7, not stddev ~300
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
