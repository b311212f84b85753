package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}

class WeightedSpec extends SparkTestBase {
  import spark.implicits._

  test("core addWithCount skips non-positive and NaN counts") {
    val s = DDSketch()
    s.addWithCount(5.0, 3.0)
    s.addWithCount(7.0, 0.0)
    s.addWithCount(7.0, -2.0)
    s.addWithCount(7.0, Double.NaN)
    assert(s.countLong === 3L)
    assert(s.sum === 15.0)
    assert(s.max === 5.0)
  }

  test("ddsketch_agg_weighted over grouped rows equals agg_values over raw rows") {
    val raw = Seq.tabulate(500)(i => ("k", (i % 37 + 1).toDouble)) ++
      Seq.tabulate(100)(i => ("z", (i % 5) * 10.0))   // includes zeros
    val rawDf = raw.toDF("g", "v").repartition(4)
    val grouped = rawDf.groupBy($"g", $"v").agg(F.count(F.lit(1)).cast("double").as("c"))

    val w = grouped.groupBy($"g").agg(G.ddsketch_agg_weighted($"v", $"c").as("sk"))
    val r = rawDf.groupBy($"g").agg(G.ddsketch_agg_values($"v").as("sk"))
    val joined = w.join(r.withColumnRenamed("sk", "rsk"), "g")
      .select($"g",
        G.ddsketch_count($"sk").as("wc"), G.ddsketch_count($"rsk").as("rc"),
        G.ddsketch_min($"sk").as("wmin"), G.ddsketch_min($"rsk").as("rmin"),
        G.ddsketch_max($"sk").as("wmax"), G.ddsketch_max($"rsk").as("rmax"),
        G.ddsketch_quantile($"sk", 0.5).as("wq"), G.ddsketch_quantile($"rsk", 0.5).as("rq"))
      .collect()
    assert(joined.length === 2)
    joined.foreach { row =>
      assert(row.getLong(1) === row.getLong(2))
      assert(row.getDouble(3) === row.getDouble(4))
      assert(row.getDouble(5) === row.getDouble(6))
      assert(row.getDouble(7) === row.getDouble(8))
    }
  }

  test("ddsketch_agg_weighted skips NULL values, NULL counts, and count <= 0 rows") {
    val df = Seq(
      (Option(10.0), Option(2.0)),
      (Option(20.0), Option(0.0)),      // skipped
      (Option(30.0), Option(-1.0)),     // skipped
      (Option(40.0), None),             // skipped
      (None: Option[Double], Option(5.0)))  // skipped
      .toDF("v", "c")
    val cnt = df.agg(G.ddsketch_count(G.ddsketch_agg_weighted($"v", $"c")).as("n"))
      .as[Long].head()
    assert(cnt === 2L)
  }

  test("SQL surface: ddsketch_agg_weighted and ddsketch_add_weighted with int literals") {
    Seq((1.5, 3), (2.5, 2)).toDF("v", "c").createOrReplaceTempView("wrows")
    val row = spark.sql(
      """SELECT ddsketch_count(sk) AS n,
        |       ddsketch_count(ddsketch_add_weighted(sk, 9.0, 4)) AS n_add,
        |       ddsketch_count(ddsketch_add_weighted(sk, 9.0, -3)) AS n_skip
        |FROM (SELECT ddsketch_agg_weighted(v, c) AS sk FROM wrows)""".stripMargin)
      .as[(Long, Long, Long)].head()
    assert(row === ((5L, 9L, 5L)))
  }

  test("accuracy parameter flows through ddsketch_agg_weighted") {
    val df = Seq.tabulate(1000)(i => (i + 1.0, 1.0)).toDF("v", "c")
    val sk = df.agg(G.ddsketch_agg_weighted($"v", $"c", 0.001).as("sk"))
    val p50 = sk.select(G.ddsketch_quantile($"sk", 0.5)).as[Double].head()
    // exact median order statistic is 500; 0.1% accuracy keeps us within ~0.4%
    assert(math.abs(p50 - 500.0) / 500.0 < 0.004)
  }

  test("weighted buffer survives shuffle serialization (many partitions, one group)") {
    val df = spark.range(0, 2000).select(
        ((F.col("id") % 100) + 1).cast("double").as("v"), F.lit(2.0).as("c"))
      .repartition(16)
    val cnt = df.agg(G.ddsketch_count(G.ddsketch_agg_weighted($"v", $"c")))
      .as[Long].head()
    assert(cnt === 4000L)
  }
}
