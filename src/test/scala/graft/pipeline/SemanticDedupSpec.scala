package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** SemDeDup: within-cluster cosine dedup keeping the least-centroid-
  * similar member of every duplicate group. */
class SemanticDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("keeps the outlier of a duplicate group and one copy of exact pairs") {
    // group A: two identical + one slightly rotated (all pairwise
    // cos >= 0.99): the centroid leans toward the identical pair, so
    // the rotated member is least-central and must be the survivor.
    // group B: two identical vectors in an orthogonal direction: tie
    // on centroid similarity -> lowest id survives.
    // plus two singletons nowhere near anything.
    val eps = 0.12
    val docs = Seq(
      (1L, vec(1, 0, 0, 0)),
      (2L, vec(1, 0, 0, 0)),
      (3L, vec(1, eps, 0, 0)),
      (10L, vec(0, 0, 1, 0)),
      (11L, vec(0, 0, 1, 0)),
      (20L, vec(0, 0, 0, 1)),
      (21L, vec(0.7, 0, -0.7, 0.2))
    ).toDF("id", "v")
    val kept = Dedup.semanticDeduplicate(
        docs, "id", "v", nClusters = 3, threshold = 0.99, iterations = 3)
      .select("id").as[Long].collect().toSet
    assert(kept.contains(20L) && kept.contains(21L), kept) // singletons untouched
    assert(kept.intersect(Set(1L, 2L, 3L)) == Set(3L), kept) // outlier survives
    assert(kept.intersect(Set(10L, 11L)) == Set(10L), kept)  // tie -> lowest id
    assert(kept.size == 4)
  }

  test("exact copies dedup regardless of clustering; disjoint corpus untouched") {
    val emb = sf("sf0.001", "embeddings").select("vec_id", "embedding")
    val copies = emb.filter(F.col("vec_id") < 20)
      .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
    val n = emb.count()
    val kept = Dedup.semanticDeduplicate(
        emb.union(copies), "vec_id", "embedding",
        nClusters = 8, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    // identical vectors co-cluster always -> every copy drops, and no
    // natural pair reaches cos 0.99 in this testdata
    assert(kept == emb.select("vec_id").as[Long].collect().toSet)
    assert(kept.size.toLong == n)
  }

  test("incremental SemDeDup probes a persisted IVF index; no self-pairs") {
    val emb = sf("sf0.001", "embeddings").select("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivfsem").toString + "/idx"
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8).save(path)
    val index = Similarity.loadIvfIndex(spark, path)
    // re-ingested exact copies under new ids: every copy must pair
    // with exactly its original at cos ~1
    val fresh = emb.filter(F.col("vec_id") < 20)
      .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
    val pairs = Dedup.incrementalSemanticDuplicates(
        fresh, index, "vec_id", "embedding", threshold = 0.99)
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    assert(pairs == (0L until 20L).map(i => (i + 100000L, i)).toSet)
    // same ids re-sent: the self-pair guard leaves nothing
    val samePairs = Dedup.incrementalSemanticDuplicates(
        emb.filter(F.col("vec_id") < 20), index, "vec_id", "embedding", 0.99)
    assert(samePairs.count() == 0L)
  }
}
