package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}
import scala.util.Random

class TopKCoreSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("exact counts while distinct items fit capacity") {
    val s = new TopKSketch(16)
    val data = Seq("a", "b", "a", "c", "a", "b")
    data.foreach(s.add(_))
    assert(s.topK(3) == Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }

  test("eviction bounds: count_true <= count <= count_true + error") {
    val rnd = new Random(3)
    val s = new TopKSketch(8)
    val truth = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    // skewed zipf-ish stream over 40 distinct items
    (1 to 5000).foreach { _ =>
      val item = "i" + math.min(39, (math.abs(rnd.nextGaussian()) * 8).toInt)
      s.add(item)
      truth(item) += 1
    }
    s.topK(8).foreach { case (item, count, error) =>
      val t = truth(item)
      assert(count >= t, s"$item count=$count true=$t")
      assert(count - error <= t, s"$item lower bound")
    }
    // the true #1 item must be tracked (SpaceSaving guarantee)
    val top1 = truth.toSeq.maxBy(_._2)._1
    assert(s.topK(8).exists(_._1 == top1))
  }

  test("merge combines counts; encode/decode round-trips") {
    val a = new TopKSketch(32); Seq("x", "y", "x").foreach(a.add(_))
    val b = new TopKSketch(32); Seq("y", "z").foreach(b.add(_))
    a.merge(b)
    assert(a.topK(3) == Seq(("x", 2L, 0L), ("y", 2L, 0L), ("z", 1L, 0L)))
    val rt = TopKSketch.decode(TopKSketch.encode(a))
    assert(rt.topK(3) == a.topK(3))
    assert(rt.capacity == a.capacity)
  }

  test("multi-way merge with truncation keeps the SpaceSaving bounds") {
    // regression: an item dropped by a truncating merge then re-merged
    // must not report error=0 with an undercount
    def mk(items: (String, Int)*): TopKSketch = {
      val s = new TopKSketch(2)
      items.foreach { case (k, n) => (1 to n).foreach(_ => s.add(k)) }
      s
    }
    val merged = mk("a" -> 5, "b" -> 4)
    merged.merge(mk("c" -> 5, "d" -> 4))
    merged.merge(mk("b" -> 5, "e" -> 1))
    val truth = Map("a" -> 5L, "b" -> 9L, "c" -> 5L, "d" -> 4L, "e" -> 1L)
    merged.topK(2).foreach { case (item, count, error) =>
      assert(count >= truth(item), s"$item upper bound")
      assert(count - error <= truth(item), s"$item lower bound: count=$count error=$error true=${truth(item)}")
    }
    // the true heaviest item (b, 9) must be tracked
    assert(merged.topK(2).exists(_._1 == "b"))
  }

  test("merge of non-full partials stays exact (error 0)") {
    val a = new TopKSketch(64); Seq("x", "x", "y").foreach(a.add(_))
    val b = new TopKSketch(64); Seq("x", "z").foreach(b.add(_))
    a.merge(b)
    assert(a.topK(3) == Seq(("x", 3L, 0L), ("y", 1L, 0L), ("z", 1L, 0L)))
  }

  test("garbage decode raises CodecException") {
    val rnd = new Random(5)
    (1 to 300).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(30))(rnd.nextInt().toByte)
      try { TopKSketch.decode(bytes); () }
      catch { case _: DataDogCodec.CodecException => () }
    }
  }
}

class TopKSparkSpec extends SparkTestBase {
  import spark.implicits._

  test("topk_agg over exploded words matches exact counts (distinct <= capacity)") {
    val words = sf("sf0.001", "documents")
      .select(F.explode(F.split($"text", "\\s+")).as("w"))
    val viaSketch = words
      .agg(topk.topk_items(topk.topk_agg($"w", 256), 10).as("top"))
      .select(F.explode($"top").as("t"))
      .select($"t.item", $"t.count", $"t.error")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = words.groupBy($"w").count()
      .orderBy($"count".desc, $"w").limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaSketch.forall(_._3 == 0L), "31 distinct words must be exact")
    assert(viaSketch.map(t => (t._1, t._2)).toSeq == exact.toSeq)
  }

  test("topk SQL surface and distributed merge") {
    sf("sf0.001", "documents").createOrReplaceTempView("docs_topk")
    val r = spark.sql(
      """SELECT topk_items(topk_agg(w, 64), 3) AS top FROM (
        |  SELECT explode(split(text, '\\s+')) AS w FROM docs_topk) t""".stripMargin)
      .select(F.explode(F.col("top")).as("t")).select("t.item").as[String].collect()
    assert(r.length == 3)
  }
}
