package graft.plans

import graft.SparkTestBase
import graft.sketch.{functions => G, DDSketch, DataDogCodec}
import org.apache.spark.sql.{functions => F}

class MultiQuantileFusionSpec extends SparkTestBase {
  import spark.implicits._

  private def sketchDf(n: Int) = {
    (1 to n).map { i =>
      val s = DDSketch(0.01)
      (1 to 50).foreach(v => s.add(v.toDouble * i))
      (i.toLong, DataDogCodec.encode(s))
    }.toDF("id", "sk")
      // keep the plan from collapsing into a pre-evaluated LocalRelation
      .repartition(2)
  }

  test("repeated quantile calls are fused into one multi_quantile call") {
    val df = sketchDf(10).select(
      $"id",
      G.ddsketch_quantile($"sk", 0.5).as("p50"),
      G.ddsketch_quantile($"sk", 0.95).as("p95"),
      G.ddsketch_quantile($"sk", 0.99).as("p99"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("ddsketch_multi_quantile"), optimized)
    assert(!optimized.contains("ddsketch_quantile("), optimized)
  }

  test("repeated cdf calls are fused into one multi_cdf call") {
    val df = sketchDf(10).select(
      $"id",
      G.ddsketch_cdf($"sk", 10.0).as("c10"),
      G.ddsketch_cdf($"sk", 25.0).as("c25"),
      G.ddsketch_cdf($"sk", 40.0).as("c40"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("ddsketch_multi_cdf"), optimized)
    assert(!optimized.contains("ddsketch_cdf("), optimized)
  }

  test("fused cdf equals unfused cdf, including NULL semantics") {
    val base = sketchDf(15)
      .union(Seq((99L, null.asInstanceOf[Array[Byte]])).toDF("id", "sk"))
      .union(Seq((100L, DataDogCodec.encode(DDSketch(0.01)))).toDF("id", "sk"))
    val expected = base.select($"id",
      G.ddsketch_cdf($"sk", 25.0).as("a")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val fused = base.select($"id",
      G.ddsketch_cdf($"sk", 25.0).as("a"),
      G.ddsketch_cdf($"sk", 40.0).as("b")).collect()
    fused.foreach { r =>
      val exp = expected(r.getLong(0))
      if (exp == null) { assert(r.isNullAt(1)); assert(r.isNullAt(2)) }
      else assert(r.getDouble(1) == exp, s"id=${r.getLong(0)}")
    }
  }

  test("codegen CSE evaluates the fused cdf UDF once per row") {
    val df = sketchDf(40).select(
      G.ddsketch_cdf($"sk", 10.0).as("a"),
      G.ddsketch_cdf($"sk", 20.0).as("b"),
      G.ddsketch_cdf($"sk", 30.0).as("c"))
    G.multiCdfInvocations.set(0L)
    df.collect()
    assert(G.multiCdfInvocations.get() === 40L)
  }

  test("mixed quantile and cdf calls fuse independently per family") {
    val df = sketchDf(10).select(
      G.ddsketch_quantile($"sk", 0.5).as("p50"),
      G.ddsketch_quantile($"sk", 0.9).as("p90"),
      G.ddsketch_cdf($"sk", 10.0).as("c10"),
      G.ddsketch_cdf($"sk", 25.0).as("c25"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("ddsketch_multi_quantile"), optimized)
    assert(optimized.contains("ddsketch_multi_cdf"), optimized)
    val rows = df.collect()
    assert(rows.length === 10)
    assert(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(3)))
  }

  test("mixed quantile and cdf over one grouped aggregate build the sketch once") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    val d = spark.range(100)
      .select(($"id" % 5).as("k"), ($"id" + 1).cast("double").as("v"))
      .repartition(2)
    val q = d.groupBy($"k").agg(
      G.ddsketch_quantile(G.ddsketch_agg_values($"v"), 0.5).as("p50"),
      G.ddsketch_quantile(G.ddsketch_agg_values($"v"), 0.9).as("p90"),
      G.ddsketch_cdf(G.ddsketch_agg_values($"v"), 10.0).as("c10"),
      G.ddsketch_cdf(G.ddsketch_agg_values($"v"), 50.0).as("c50"))
    val aggs = q.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    val aggExprCount = aggs.map(_.aggregateExpressions
      .flatMap(_.collect { case ae: AggregateExpression => ae }).size).sum
    // both families fused AND sharing one sketch aggregate per group
    assert(aggExprCount === 1, q.queryExecution.optimizedPlan.toString)
    val rows = q.collect()
    assert(rows.length === 5)
    assert(rows.forall(r => (1 to 4).forall(!r.isNullAt(_))))
  }

  test("fused results equal unfused results, including NULL semantics") {
    val base = sketchDf(25)
      .union(Seq((99L, null.asInstanceOf[Array[Byte]])).toDF("id", "sk"))
      .union(Seq((100L, DataDogCodec.encode(DDSketch(0.01)))).toDF("id", "sk"))
    // unfused reference: single-quantile queries evaluated separately
    val expected = base.select($"id",
      G.ddsketch_quantile($"sk", 0.5).as("a")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val fused = base.select($"id",
      G.ddsketch_quantile($"sk", 0.5).as("a"),
      G.ddsketch_quantile($"sk", 0.9).as("b")).collect()
    fused.foreach { r =>
      val exp = expected(r.getLong(0))
      if (exp == null) {
        assert(r.isNullAt(1), s"id=${r.getLong(0)} expected NULL")
        assert(r.isNullAt(2))
      } else {
        assert(r.getDouble(1) == exp, s"id=${r.getLong(0)}")
      }
    }
  }

  test("codegen CSE evaluates the fused UDF once per row") {
    val df = sketchDf(40).select(
      G.ddsketch_quantile($"sk", 0.25).as("a"),
      G.ddsketch_quantile($"sk", 0.5).as("b"),
      G.ddsketch_quantile($"sk", 0.75).as("c"),
      G.ddsketch_quantile($"sk", 0.99).as("d"))
    G.multiQuantileInvocations.set(0L)
    df.collect()
    val calls = G.multiQuantileInvocations.get()
    // 40 rows, 4 quantiles: without fusion+CSE this would be 160 decodes
    assert(calls == 40L, s"fused UDF invoked $calls times for 40 rows")
  }

  test("quantiles directly in an aggregate select are split and fused") {
    val df = sketchDf(30)
      .groupBy(($"id" % 3).as("g"))
      .agg(
        G.ddsketch_quantile(G.ddsketch_agg($"sk"), 0.5).as("p50"),
        G.ddsketch_quantile(G.ddsketch_agg($"sk"), 0.95).as("p95"),
        G.ddsketch_quantile(G.ddsketch_agg($"sk"), 0.99).as("p99"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("ddsketch_multi_quantile"), optimized)
    G.multiQuantileInvocations.set(0L)
    val rows = df.collect()
    assert(rows.length == 3)
    // one fused call per group, not per quantile
    assert(G.multiQuantileInvocations.get() == 3L,
      s"invocations=${G.multiQuantileInvocations.get()}")
    // values match the unfused single-quantile path
    val single = sketchDf(30).groupBy(($"id" % 3).as("g"))
      .agg(G.ddsketch_quantile(G.ddsketch_agg($"sk"), 0.5).as("p50"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(r.getDouble(1) == single(r.getLong(0)), s"group ${r.getLong(0)}")
    }
  }

  test("NULL quantile literal stays on the single-call path and yields NULL") {
    val df = sketchDf(5).select(
      G.ddsketch_quantile($"sk", 0.5).as("a"),
      G.ddsketch_quantile($"sk", F.lit(null).cast("double")).as("b"),
      G.ddsketch_quantile($"sk", 0.9).as("c"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(!r.isNullAt(0))
      assert(r.isNullAt(1), "NULL q must produce NULL, not an error")
      assert(!r.isNullAt(2))
    }
  }

  test("single quantile call is left untouched") {
    val df = sketchDf(5).select(G.ddsketch_quantile($"sk", 0.5).as("p50"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("ddsketch_multi_quantile"), optimized)
  }

  test("different sketch expressions are not fused together") {
    val df = sketchDf(5).select(
      G.ddsketch_quantile($"sk", 0.5).as("a"),
      G.ddsketch_quantile(G.ddsketch_add($"sk", F.lit(1.0)), 0.5).as("b"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("ddsketch_multi_quantile"), optimized)
  }
}
