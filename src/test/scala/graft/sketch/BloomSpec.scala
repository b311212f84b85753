package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class BloomSpec extends SparkTestBase {
  import spark.implicits._

  test("no false negatives across distributed partial merges") {
    val df = spark.range(10000).repartition(8)
    val bf = df.agg(bloom.bloom_agg(F.col("id")).as("bf"))
    val hits = spark.range(10000).crossJoin(bf)
      .select(bloom.bloom_contains(F.col("bf"), F.col("id")).as("hit"))
      .filter(F.col("hit"))
      .count()
    assert(hits === 10000L)   // every inserted element must probe true
  }

  test("false positive rate stays near the configured fpp") {
    val df = spark.range(20000).repartition(4)
    val bf = df.agg(bloom.bloom_agg(F.col("id"), 20000L, 0.01).as("bf"))
    // probe 20k values that were never inserted
    val fps = spark.range(100000, 120000).crossJoin(bf)
      .select(bloom.bloom_contains(F.col("bf"), F.col("id")).as("hit"))
      .filter(F.col("hit"))
      .count()
    assert(fps < 20000 * 0.03, s"fp count $fps exceeds 3x the configured 1% fpp")
  }

  test("works over strings and skips NULLs") {
    val df = Seq(Some("alpha"), Some("beta"), None).toDF("s").repartition(2)
    val bf = df.agg(bloom.bloom_agg(F.col("s")).as("bf"))
    val out = Seq("alpha", "beta").toDF("probe").crossJoin(bf)
      .select(bloom.bloom_contains(F.col("bf"), F.col("probe")).as("hit"))
      .as[Boolean].collect()
    assert(out.forall(identity))
  }

  test("NULL discipline: null sketch, null value, garbage bytes") {
    val bf = spark.range(10).agg(bloom.bloom_agg(F.col("id")).as("bf"))
    val row = bf.select(
      bloom.bloom_contains(F.lit(null).cast("binary"), F.lit(1L)).isNull.as("a"),
      bloom.bloom_contains(F.col("bf"), F.lit(null).cast("long")).isNull.as("b"),
      bloom.bloom_contains(F.lit(Array[Byte](1, 2, 3)), F.lit(1L)).isNull.as("c"))
      .as[(Boolean, Boolean, Boolean)].head()
    assert(row === ((true, true, true)))
  }

  test("SQL surface: bloom_agg and bloom_contains registered") {
    spark.range(100).createOrReplaceTempView("bloom_in")
    val out = spark.sql(
      """SELECT bloom_contains(bf, 5L) AS hit5, bloom_contains(bf, 12345L) AS hitx
        |FROM (SELECT bloom_agg(id, 1000, 0.01) AS bf FROM bloom_in)""".stripMargin)
      .as[(Boolean, Boolean)].head()
    assert(out._1 === true)
    assert(out._2 === false)   // 1-in-100 fpp chance; value chosen to probe false
  }
}
