package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class MergeAggSpec extends SparkTestBase {
  import spark.implicits._

  private def shardedEvents = sf("sf0.001", "events")
    .select(F.col("user_id"), F.col("event_type"),
      (F.col("event_id") % 7).as("shard"))

  test("kmv_merge_agg of sharded sketches is byte-identical to one-shot kmv_agg") {
    val ev = shardedEvents
    val merged = ev.groupBy("event_type", "shard")
      .agg(kmv.kmv_agg(F.col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(kmv.kmv_merge_agg(F.col("sk")).as("sk"))
    val direct = ev.groupBy("event_type")
      .agg(kmv.kmv_agg(F.col("user_id")).as("sk1"))
    val rows = merged.join(direct, "event_type")
      .select((F.col("sk") === F.col("sk1")).as("eq"),
        kmv.kmv_distinct(F.col("sk")).as("est"))
      .as[(Boolean, Double)].collect()
    assert(rows.nonEmpty && rows.forall(_._1))
    // below k the KMV estimate is exact — check one group against truth
    val exact = ev.groupBy("event_type")
      .agg(F.countDistinct(F.col("user_id")).cast("double").as("n"))
      .orderBy("event_type").as[(String, Double)].collect().toMap
    val ests = merged
      .select(F.col("event_type"), kmv.kmv_distinct(F.col("sk")))
      .as[(String, Double)].collect().toMap
    ests.foreach { case (k, est) =>
      if (exact(k) < KmvSketch.DefaultK) assert(est === exact(k), s"type $k") }
  }

  test("cms_merge_agg of sharded sketches is byte-identical to one-shot cms_agg") {
    val ev = shardedEvents
    val merged = ev.groupBy("shard")
      .agg(cms.cms_agg(F.col("event_type")).as("sk"))
      .agg(cms.cms_merge_agg(F.col("sk")).as("sk"))
    val direct = ev.agg(cms.cms_agg(F.col("event_type")).as("sk1"))
    val eq = merged.crossJoin(direct)
      .select((F.col("sk") === F.col("sk1")).as("eq")).as[Boolean].collect()
    assert(eq.toSeq === Seq(true))
  }

  test("bloom_merge_agg ORs sharded filters into the one-shot filter") {
    val ev = shardedEvents
    val merged = ev.groupBy("shard")
      .agg(bloom.bloom_agg(F.col("user_id")).as("sk"))
      .agg(bloom.bloom_merge_agg(F.col("sk")).as("sk"))
    val direct = ev.agg(bloom.bloom_agg(F.col("user_id")).as("sk1"))
    val eq = merged.crossJoin(direct)
      .select((F.col("sk") === F.col("sk1")).as("eq")).as[Boolean].collect()
    assert(eq.toSeq === Seq(true))
  }

  test("topk_merge_agg is exact when capacity covers the distinct items") {
    val ev = shardedEvents
    val merged = ev.groupBy("shard")
      .agg(topk.topk_agg(F.col("event_type"), 64).as("sk"))
      .agg(topk.topk_merge_agg(F.col("sk")).as("sk"))
    val items = merged.select(F.explode(topk.topk_items(F.col("sk"), 64)))
      .select(F.col("col.item"), F.col("col.count"))
      .as[(String, Long)].collect().toMap
    val exact = ev.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(items === exact)
  }

  test("merge aggs skip NULL/undecodable rows and yield NULL for empty groups") {
    val df = Seq(
      (1, Option.empty[Array[Byte]]),
      (1, Some(Array[Byte](1, 2, 3))),   // undecodable
      (2, Option.empty[Array[Byte]]))
      .toDF("g", "sk")
    val out = df.groupBy("g").agg(kmv.kmv_merge_agg(F.col("sk")).as("m"))
      .orderBy("g").select("m").as[Option[Array[Byte]]].collect()
    assert(out.forall(_.isEmpty))
  }

  test("kmv_merge_agg adopts the first k and skips mismatched sketches") {
    val a = Seq(1L, 2L, 3L).toDF("v").agg(kmv.kmv_agg(F.col("v"), 16).as("sk"))
    val b = Seq(4L, 5L).toDF("v").agg(kmv.kmv_agg(F.col("v"), 32).as("sk"))
    val est = a.union(b).coalesce(1)
      .agg(kmv.kmv_distinct(kmv.kmv_merge_agg(F.col("sk"))))
      .as[Double].collect()
    assert(est.toSeq === Seq(3.0))   // the k=32 sketch was skipped
  }

  test("merge aggs are registered for SQL") {
    shardedEvents.groupBy("shard")
      .agg(kmv.kmv_agg(F.col("user_id")).as("k"),
        cms.cms_agg(F.col("event_type")).as("c"),
        topk.topk_agg(F.col("event_type")).as("t"),
        bloom.bloom_agg(F.col("user_id")).as("b"))
      .createOrReplaceTempView("merge_agg_shards")
    val row = spark.sql(
      """SELECT kmv_distinct(kmv_merge_agg(k)) AS uniques,
        |       cms_total(cms_merge_agg(c)) AS total,
        |       size(topk_items(topk_merge_agg(t), 8)) AS nitems,
        |       octet_length(bloom_merge_agg(b)) AS bbytes
        |FROM merge_agg_shards""".stripMargin).collect().head
    assert(row.getDouble(0) > 0.0)
    assert(row.getLong(1) === shardedEvents.count())
    assert(row.getInt(2) > 0)
    assert(row.getInt(3) > 0)
  }
}
