package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class VectorAggSpec extends SparkTestBase {
  import spark.implicits._

  test("vec_sum sums float vectors element-wise per group across partitions") {
    val df = Seq(
      ("a", Array(1.0f, 2.0f, 3.0f)),
      ("a", Array(0.5f, -1.0f, 4.0f)),
      ("b", Array(10.0f, 20.0f, 30.0f)))
      .toDF("g", "v").repartition(4)   // forces partial buffers + merge
    val out = df.groupBy($"g").agg(VectorAgg.vec_sum($"v").as("s"))
      .as[(String, Array[Double])].collect().toMap
    assert(out("a").map(x => math.round(x * 100) / 100.0).toSeq === Seq(1.5, 1.0, 7.0))
    assert(out("b").toSeq === Seq(10.0, 20.0, 30.0))
  }

  test("vec_sum handles double arrays too") {
    val df = Seq((1, Array(1.5, 2.5)), (1, Array(0.5, 0.5))).toDF("g", "v")
    val out = df.groupBy($"g").agg(VectorAgg.vec_sum($"v").as("s"))
      .as[(Int, Array[Double])].head()
    assert(out._2.toSeq === Seq(2.0, 3.0))
  }

  test("vec_sum NULL discipline: null / ragged vectors skipped, all-skipped group is NULL") {
    val df = Seq(
      (1, Option(Array(1.0f, 2.0f))),
      (1, Option.empty[Array[Float]]),          // null vector: skipped
      (1, Option(Array(9.0f, 9.0f, 9.0f))),     // ragged vs first seen: skipped
      (2, Option.empty[Array[Float]]))          // group of only nulls
      .toDF("g", "v").coalesce(1)               // deterministic "first seen" length
    val rows = df.groupBy($"g").agg(VectorAgg.vec_sum($"v").as("s"))
      .orderBy($"g").collect()
    assert(rows(0).getSeq[Double](1).toSeq === Seq(1.0, 2.0))
    assert(rows(1).isNullAt(1))
  }

  test("vec_sum is registered for SQL") {
    Seq((1, Array(1.0f, 1.0f)), (1, Array(2.0f, 3.0f))).toDF("g", "v")
      .createOrReplaceTempView("vecs")
    val out = spark.sql("SELECT vec_sum(v) AS s FROM vecs GROUP BY g")
      .as[Array[Double]].head()
    assert(out.toSeq === Seq(3.0, 4.0))
  }

  test("vec_sum rejects non-array input at analysis time") {
    val df = Seq(1.0, 2.0).toDF("v")
    val e = intercept[Exception] {
      df.agg(VectorAgg.vec_sum($"v")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("vec_sum") ||
      e.getMessage.toLowerCase.contains("array"))
  }

  test("trainCentroids works at dim 1024 (constant plan width)") {
    // 120 vectors in 3 well-separated clusters at embedding-scale width;
    // the old dim-separate-aggregate form would build a 1024-column agg here.
    val dim = 1024
    def vec(cluster: Int, j: Int): Array[Float] = {
      val a = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        a(i) = (if (i % 3 == cluster) 10.0f else 0.0f) + ((i * 31 + j * 7) % 5) * 0.01f
        i += 1
      }
      a
    }
    val rows = for (c <- 0 until 3; j <- 0 until 40) yield (c.toLong * 100 + j, vec(c, j))
    val df = rows.toDF("id", "v").repartition(4)
    val idx = Similarity.buildIvfIndex(df, "id", "v", nlist = 3, iterations = 2)
    assert(idx.centroids.length === 3)
    assert(idx.centroids.forall(_.length === dim))
    // every corpus vector lands in a cell, and cells separate the clusters:
    // ids from the same cluster share a cell with >= majority of their cluster
    val cells = idx.assigned.select("neighbor_id", "__cell")
      .as[(Long, Int)].collect().toMap
    assert(cells.size === 120)
    for (c <- 0 until 3) {
      val clusterCells = (0 until 40).map(j => cells(c.toLong * 100 + j))
      assert(clusterCells.distinct.size === 1, s"cluster $c split across cells")
    }
  }
}
