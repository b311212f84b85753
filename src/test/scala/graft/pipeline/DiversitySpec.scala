package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class DiversitySpec extends SparkTestBase {
  import spark.implicits._

  // four well-separated directions in 2D plus clones; cosine distance
  // separates by angle
  private val corpus = Seq(
    (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
    (3L, Array(-1f, 0f)), (4L, Array(0f, -1f)),
    (5L, Array(0.99f, 0.01f)), (6L, Array(0.01f, 0.99f)),
    (7L, Array(-0.99f, -0.01f)), (8L, Array(-0.01f, -0.99f)))
    .toDF("vec_id", "embedding").repartition(4)

  test("farthest-point picks one exemplar per direction") {
    val out = Diversity.farthestPointSample(corpus, "vec_id", "embedding", 4)
      .orderBy("pick_order")
      .select("vec_id").as[Long].collect().toSeq
    // seed = min id (1, +x); farthest from +x by cosine is -x (id 3);
    // then +y / -y split the remaining diagonal, smallest id on ties
    assert(out.head === 1L)
    assert(out(1) === 3L || out(1) === 7L)
    val dirs = out.map {
      case 1L | 5L => "+x"; case 2L | 6L => "+y"
      case 3L | 7L => "-x"; case 4L | 8L => "-y"
    }
    assert(dirs.toSet.size === 4, s"picked $out")
  }

  test("deterministic across reruns; zero-norm and null vectors excluded") {
    val withJunk = corpus.union(Seq(
      (9L, Array(0f, 0f)), (10L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding"))
    val a = Diversity.farthestPointSample(withJunk, "vec_id", "embedding", 5)
      .select("vec_id").as[Long].collect().toSeq
    val b = Diversity.farthestPointSample(withJunk, "vec_id", "embedding", 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(a === b)
    assert(!a.contains(9L) && !a.contains(10L))
  }

  test("beats a prefix baseline on minimum pairwise spread") {
    val emb = sf("sf0.001", "embeddings")
    val k = 6
    val sel = Diversity.farthestPointSample(emb, "vec_id", "embedding", k)
    val ids = sel.select(F.col("vec_id")).as[Long].collect().toSet
    def minPairDist(ids: Set[Long]): Double = {
      val sub = emb.filter(F.col("vec_id").isInCollection(ids))
        .select(F.col("vec_id").as("ia"), F.col("embedding").as("va"))
      val sub2 = sub.select(F.col("ia").as("ib"), F.col("va").as("vb"))
      sub.crossJoin(sub2).filter(F.col("ia") < F.col("ib"))
        .select((F.lit(1.0) - Similarity.cosine(F.col("va"), F.col("vb"))).as("d"))
        .agg(F.min("d")).as[Double].head()
    }
    val baseline = emb.orderBy("vec_id").limit(k)
      .select(F.col("vec_id")).as[Long].collect().toSet
    assert(minPairDist(ids) >= minPairDist(baseline),
      s"greedy $ids not more spread than prefix $baseline")
  }
}
