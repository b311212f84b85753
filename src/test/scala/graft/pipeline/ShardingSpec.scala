package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class ShardingSpec extends SparkTestBase {
  import spark.implicits._

  test("assignShardsByBytes matches a driver-side cumsum walk, edge cases included") {
    val rnd = new scala.util.Random(11)
    // oversize rows, zero bytes, a NULL, a negative — all legal input
    val rows = (0L until 400L).map { i =>
      val b: java.lang.Long = i match {
        case 7 => null
        case 13 => -5L
        case 21 => 9000L // bigger than the target: advances past a boundary
        case _ => rnd.nextInt(500).toLong
      }
      (i, b)
    }
    val target = 1000L
    val got = Sharding.assignShardsByBytes(
        rows.toDF("id", "b").repartition(7), F.col("id"), F.col("b"),
        target, buckets = 5)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    var cum = 0L
    rows.foreach { case (id, b0) =>
      val b = Option(b0).map(_.longValue).filter(_ > 0).getOrElse(0L)
      val want = (cum / target).toInt
      assert(got(id) === want, s"id=$id")
      cum += b
    }
    // shards are contiguous in id order and non-decreasing
    val ordered = rows.map(r => got(r._1))
    assert(ordered.sliding(2).forall(p => p.head <= p.last))
  }

  test("repartitionByShard puts exactly one shard per partition, by number") {
    val df = (0L until 57L).map(i => (i, (i % 5).toInt)).toDF("id", "shard")
      .repartition(3)
    val routed = Sharding.repartitionByShard(df, "shard", 5)
    val perPart = routed
      .select(F.spark_partition_id().as("p"), F.col("shard"))
      .distinct().as[(Int, Int)].collect()
    assert(perPart.length === 5)
    perPart.foreach { case (p, s) => assert(p === s) }
    assert(routed.count() === 57L)
  }

  test("shardByBytes feeds the trainer sinks: one ~target-sized tar per shard id") {
    val docs = sf("sf0.001", "documents")
      .filter(F.col("text").isNotNull)
      .select(F.col("doc_id"), F.col("text"),
        F.length(F.col("text")).cast("long").as("b"))
    val (routed, n) = Sharding.shardByBytes(
      docs, F.col("doc_id"), F.col("b"), targetBytes = 20000L)
    assert(n > 1, "fixture must span multiple shards")
    val keyed = routed.select(
      F.concat(F.lit("doc"), F.col("doc_id")).as("key"),
      F.map(F.lit("txt"), F.encode(F.col("text"), "UTF-8")).as("members"),
      F.col("shard"))
    val dir = java.nio.file.Files.createTempDirectory("shardwds").toString
    graft.sources.WebDataset.write(
      keyed, F.col("key"), F.col("members"), dir)
    val back = graft.sources.WebDataset.read(spark, dir)
      .select(F.regexp_extract(F.col("shard"), "part-(\\d+)\\.tar$", 1)
        .cast("int").as("file_shard"), F.col("key"))
    // every sample landed in the tar numbered by its assigned shard
    val assigned = keyed.select(
      F.col("key"), F.col("shard").as("want"))
    val bad = back.join(assigned, "key")
      .filter(F.col("file_shard") =!= F.col("want"))
    assert(bad.isEmpty)
    assert(back.select("file_shard").distinct().count() === n.toLong)
    // byte balance: every tar's member payload stays under
    // target + max single row (an oversize row can only overshoot once)
    val maxRow = docs.agg(F.max("b")).head().getLong(0)
    val sizes = back
      .join(docs.select(F.concat(F.lit("doc"), F.col("doc_id")).as("key"),
        F.col("b")), "key")
      .groupBy("file_shard").agg(F.sum("b").as("bytes"))
      .as[(Int, Long)].collect()
    sizes.foreach { case (s, bytes) =>
      assert(bytes <= 20000L + maxRow, s"shard $s overshoots: $bytes") }
  }
}
