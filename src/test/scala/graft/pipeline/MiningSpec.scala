package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class MiningSpec extends SparkTestBase {
  import spark.implicits._

  // 2-d vectors whose cosine order is obvious by angle; labels split
  // the half-plane so the nearest SAME-label and DIFFERENT-label
  // neighbors differ.
  private def items = Seq(
    (0L, Array(1.0f, 0.0f), "a"),
    (1L, Array(0.9f, 0.1f), "a"),   // closest to 0 overall (same label)
    (2L, Array(0.8f, 0.2f), "b"),   // closest DIFFERENT-label to 0
    (3L, Array(0.0f, 1.0f), "b"),
    (4L, Array(-1.0f, 0.1f), "a"),
    (5L, Array(0.7f, 0.3f), null.asInstanceOf[String])
  ).toDF("id", "vec", "lab")

  private def localCos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    dot / (na * nb)
  }

  test("hardNegatives: different-label only, ranked by cosine; null labels drop") {
    val q = items.filter(F.col("id") === 0)
    val got = Similarity.hardNegatives(items, q, "id", "vec", "lab", 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"),
        r.getAs[String]("neighbor_label")))
    // label 'a' query: negatives are exactly the 'b' items (null never matches)
    assert(got.map(_._2).toSeq == Seq(2L, 3L))
    assert(got.forall(_._3 == "b"))
    assert(got.map(_._1).toSeq == Seq(1, 2))
  }

  test("minePairs positive: same-label only, self excluded") {
    val q = items.filter(F.col("id") === 0)
    val got = Similarity.minePairs(items, q, "id", "vec", "lab", 10, positive = true)
      .orderBy("rank").collect().map(r => r.getAs[Long]("neighbor_id")).toSeq
    assert(got == Seq(1L, 4L)) // same label 'a', self (0) excluded, cos order
  }

  test("cos values match a local reference; ranks follow (cos desc, id asc)") {
    val vecs = items.collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[scala.collection.Seq[Float]]("vec").toArray,
        r.getAs[String]("lab"))).toSeq
    val q0 = vecs.find(_._1 == 0L).get
    val want = vecs.filter(v => v._3 != null && v._3 != q0._3)
      .map(v => (v._1, localCos(q0._2, v._2)))
      .sortBy { case (id, c) => (-c, id) }
    val got = Similarity.hardNegatives(items, items.filter(F.col("id") === 0),
        "id", "vec", "lab", 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos")))
    assert(got.map(_._1).toSeq == want.map(_._1))
    got.zip(want).foreach { case ((_, g), (_, w)) => assert(math.abs(g - w) < 1e-7) }
  }

  test("hardNegativesIndexed agrees with exact mining on clustered data") {
    // planted clusters so IVF cells align with structure: recall
    // should be perfect with nprobe = nlist
    val rnd = new scala.util.Random(7)
    val rows = (0 until 120).map { i =>
      val center = i % 3
      val base = Array.tabulate(8)(d => if (d == center) 4.0f else 0.0f)
      val v = base.map(x => x + rnd.nextFloat() * 0.3f)
      (i.toLong, v, s"lab${i % 2}")
    }
    val df = rows.toDF("id", "vec", "lab")
    val queries = df.filter(F.col("id") < 5)
    val exact = Similarity.hardNegatives(df, queries, "id", "vec", "lab", 5)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val idx = Similarity.buildIvfIndex(df, "id", "vec", nlist = 4, iterations = 3)
    val approx = Similarity.hardNegativesIndexed(
        idx, queries, df, "id", "vec", "lab", 5, nprobe = 4)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(approx == exact, "full-probe IVF mining must equal the exact scan")
  }

  test("query with a label no other item shares yields full negative set") {
    val q = Seq((99L, Array(1.0f, 0.0f), "z")).toDF("id", "vec", "lab")
    val got = Similarity.hardNegatives(items, q, "id", "vec", "lab", 10).collect()
    assert(got.length == 5) // every labeled item is a negative (null drops)
  }
}
