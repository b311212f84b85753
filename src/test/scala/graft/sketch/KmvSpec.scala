package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}
import graft.sketch.{kmv => K}
import scala.util.Random

class KmvCoreSpec extends org.scalatest.funsuite.AnyFunSuite {

  // splitmix64 (same mixing as the pipeline hash helpers)
  private def hash(i: Long): Long = {
    var z = i + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  test("exact below k, within 5% above k") {
    val s = KmvSketch(256)
    (1L to 100L).foreach(i => s.add(hash(i)))
    assert(s.distinctEstimate == 100.0)
    val big = KmvSketch(1024)
    (1L to 100000L).foreach(i => big.add(hash(i)))
    val est = big.distinctEstimate
    assert(math.abs(est - 100000) / 100000.0 < 0.10, s"est=$est")
  }

  test("duplicates do not inflate the estimate") {
    val s = KmvSketch(256)
    (1L to 50L).foreach(i => s.add(hash(i % 10)))
    assert(s.distinctEstimate == 10.0)
  }

  test("merge equals union; encode/decode round-trips") {
    val a = KmvSketch(512); val b = KmvSketch(512); val u = KmvSketch(512)
    (1L to 3000L).foreach(i => { a.add(hash(i)); u.add(hash(i)) })
    (2000L to 5000L).foreach(i => { b.add(hash(i)); u.add(hash(i)) })
    a.merge(b)
    assert((0 until a.size).map(a.hashAt) == (0 until u.size).map(u.hashAt))
    val rt = KmvSketch.decode(KmvSketch.encode(a))
    assert((0 until rt.size).map(rt.hashAt) == (0 until a.size).map(a.hashAt))
    assert(rt.k == a.k)
  }

  test("jaccard and containment estimates near truth") {
    val rnd = new Random(7)
    val setA = (1L to 20000L).toSet
    val setB = (10001L to 30000L).toSet // |inter|=10000 |union|=30000 j=1/3
    val a = KmvSketch(1024); setA.foreach(i => a.add(hash(i)))
    val b = KmvSketch(1024); setB.foreach(i => b.add(hash(i)))
    val j = KmvSketch.jaccard(a, b)
    assert(math.abs(j - 1.0 / 3.0) < 0.06, s"j=$j")
    val c = KmvSketch.containment(a, b) // |inter|/|A| = 0.5
    assert(math.abs(c - 0.5) < 0.09, s"c=$c")
    assert(rnd != null)
  }

  test("garbage decode raises CodecException, never crashes") {
    val rnd = new Random(11)
    (1 to 500).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(40))(rnd.nextInt().toByte)
      try { KmvSketch.decode(bytes); () }
      catch { case _: DataDogCodec.CodecException => () }
    }
  }
}

class KmvSparkSpec extends SparkTestBase {
  import spark.implicits._

  test("kmv_agg distinct estimate matches exact countDistinct per group") {
    val events = sf("sf0.01", "events")
    val out = events.groupBy($"event_type")
      .agg(
        K.kmv_distinct(K.kmv_agg($"user_id")).as("est"),
        F.countDistinct($"user_id").as("exact"))
      .collect()
    out.foreach { r =>
      val est = r.getAs[Double]("est")
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(est - exact) / exact < 0.12,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("kmv jaccard between user sets tracks exact jaccard") {
    val events = sf("sf0.01", "events")
    val sk = events.groupBy($"event_type").agg(K.kmv_agg($"user_id").as("s"))
    val click = sk.filter($"event_type" === "click").select("s")
    val purchase = sk.filter($"event_type" === "purchase").select("s")
    val j = click.crossJoin(purchase.withColumnRenamed("s", "s2"))
      .select(K.kmv_jaccard($"s", $"s2").as("j")).collect().head.getAs[Double]("j")
    val a = events.filter($"event_type" === "click").select($"user_id").distinct()
    val b = events.filter($"event_type" === "purchase").select($"user_id").distinct()
    val inter = a.intersect(b).count().toDouble
    val union = a.union(b).distinct().count().toDouble
    val exact = inter / union
    assert(math.abs(j - exact) < 0.08, s"kmv=$j exact=$exact")
  }

  test("kmv SQL surface") {
    val events = sf("sf0.001", "events")
    events.createOrReplaceTempView("ev_kmv")
    val r = spark.sql(
      """SELECT event_type, kmv_distinct(kmv_agg(user_id)) AS d
        |FROM ev_kmv GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(r.length == 5)
    r.foreach(row => assert(row.getAs[Double]("d") > 0.0))
  }

  test("kmv null discipline") {
    val r = spark.range(1).select(
      K.kmv_distinct(F.lit(null).cast("binary")).isNull.as("a"),
      K.kmv_jaccard(F.lit(Array[Byte](9)).cast("binary"),
                    F.lit(Array[Byte](9)).cast("binary")).isNull.as("b"))
      .collect().head
    assert(r.getBoolean(0) && r.getBoolean(1))
  }
}
