package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/**
 * Diversity-maximizing subset selection (greedy k-center /
 * farthest-point traversal) over an embedding column — the data-
 * curation move that picks k maximally-spread exemplars instead of k
 * random rows (dataset pruning, eval-set seeding, prototype mining).
 *
 * Scale shape: k passes over the corpus, each pass ONE narrow
 * aggregation — the running min-distance column updates against the
 * single newest center (broadcast as a literal), and the argmax row is
 * the only row collected per round (k rows total on the driver, like
 * IVF's nlist centroid collect). Lineage is cut each round with a lazy
 * localCheckpoint so round r doesn't replay rounds 1..r-1.
 *
 * Deterministic: seeded at the smallest id; argmax ties break on
 * smallest id.
 */
object Diversity {

  /**
   * Select k ids by farthest-point traversal under cosine distance.
   * Returns (id, pick_order LONG, dist_at_pick DOUBLE): pick_order 0
   * is the seed (dist_at_pick NULL), pick_order r is the row farthest
   * (max cosine distance to its nearest already-picked center) at
   * round r. Rows with NULL/zero-norm vectors are never picked.
   */
  def farthestPointSample(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._

    val base = df
      .select(F.col(idCol).cast("long").as("id"), F.col(vecCol).as("v"))
      .filter(F.col("v").isNotNull)
      .filter(F.aggregate(F.col("v"), F.lit(0.0d),
        (acc, x) => acc + x * x) > 0.0)
      .localCheckpoint(eager = false)

    val seedRow = base.orderBy(F.col("id")).limit(1)
      .select(F.col("id"), F.col("v")).head()
    var picked = List((seedRow.getLong(0), 0L, Option.empty[Double]))
    var centerVec = seedRow.getSeq[Float](1).toArray

    // running nearest-picked-center distance, updated one center per round
    var state = base.withColumn("mind", F.lit(Double.MaxValue))
    for (round <- 1 until k) {
      val c = F.typedLit(centerVec)
      state = state
        .withColumn("mind", F.least(F.col("mind"),
          F.lit(1.0) - Similarity.cosine(F.col("v"), c)))
        .localCheckpoint(eager = false)
      val next = state
        .filter(!F.col("id").isInCollection(picked.map(_._1)))
        .orderBy(F.col("mind").desc, F.col("id")).limit(1)
        .select(F.col("id"), F.col("mind"), F.col("v")).head()
      picked = (next.getLong(0), round.toLong, Some(next.getDouble(1))) :: picked
      centerVec = next.getSeq[Float](2).toArray
    }
    picked.reverse
      .toDF("id", "pick_order", "dist_at_pick")
      .withColumnRenamed("id", idCol)
  }
}
