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

  test("broadcast probe: one decode per query, zero per row, agrees with bloom_contains") {
    val keys = spark.range(0, 5000).toDF("k").repartition(4)
    val bc = bloom.broadcastFilter(keys, "k", 5000L, 0.01)
    val decodesAfterBuild = bloom.decodeCount.get()
    val probes = spark.range(0, 50000).toDF("k").repartition(8)
    val hits = probes
      .select(bloom.contains_broadcast(bc, F.col("k")).as("hit"), F.col("k"))
      .collect()
    // 50k probed rows must not add a single filter decode — the decoded
    // filter is executor-local via the broadcast, never re-read per row
    assert(bloom.decodeCount.get() === decodesAfterBuild)
    val inserted = (0L until 5000L).toSet
    assert(hits.forall(r => !inserted.contains(r.getLong(1)) || r.getBoolean(0)))
    // bit-identical behavior to the bytes-in-plan SQL probe
    val bf = keys.agg(bloom.bloom_agg(F.col("k"), 5000L, 0.01).as("bf"))
    val disagree = probes.crossJoin(bf)
      .select((bloom.bloom_contains(F.col("bf"), F.col("k")) =!=
        bloom.contains_broadcast(bc, F.col("k"))).as("d"))
      .filter(F.col("d")).count()
    assert(disagree === 0L)
  }

  test("broadcast probe NULL discipline: null value probes NULL, null filter probes NULL") {
    val bc = bloom.broadcastFilter(spark.range(10).toDF("k"), "k")
    val row = Seq(Option(5L), None).toDF("k")
      .select(bloom.contains_broadcast(bc, F.col("k")).as("hit"))
      .as[Option[Boolean]].collect()
    assert(row.toSet === Set(Some(true), None))
    // an empty/undecodable build side decodes to null → all-NULL probes
    val emptyBc = spark.sparkContext.broadcast(
      null.asInstanceOf[org.apache.spark.util.sketch.BloomFilter])
    val nulls = Seq(1L, 2L).toDF("k")
      .select(bloom.contains_broadcast(emptyBc, F.col("k")).isNull.as("n"))
      .as[Boolean].collect()
    assert(nulls.forall(identity))
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
