package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Deterministic byte-balanced sharding — the layout step in front of
 * the trainer sinks ([[graft.sources.MegatronIdx]] /
 * [[graft.sources.WebDataset]] write one shard per partition, and real
 * trainer shards target a byte size, 1–4 GiB, not a row count):
 * rows are walked in a caller-chosen total order and cut into
 * contiguous shards of ~`targetBytes` each.
 *
 * The assignment is pure arithmetic — `shard = exclusive-cumulative-
 * bytes div targetBytes` — so it is engine-reproducible (the oracle
 * replays it in one SQL window) and stable across runs: re-sharding
 * the same corpus yields byte-identical shard membership, which is
 * what makes trainer-side resume/caching possible.
 *
 * Scale shape: the cumulative sum rides [[RangeCumsum]]'s two-phase
 * parallel form (per-bucket windows + a <= `buckets`-row broadcast of
 * prefix offsets) — never a single-partition global window. A row
 * larger than `targetBytes` advances the counter past one shard
 * boundary; it lands alone-or-leading in its shard, never split.
 */
object Sharding {

  /**
   * Append an integer `shard` column: contiguous byte-balanced shard
   * ids in ascending `orderCol` order. `orderCol` must be unique per
   * row and numeric-castable (the [[RangeCumsum]] contract); NULL or
   * negative byte counts count as 0 bytes.
   */
  def assignShardsByBytes(
      df: DataFrame,
      orderCol: Column,
      bytesCol: Column,
      targetBytes: Long,
      buckets: Int = 64): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val withB = df.withColumn("__sh_b",
      F.greatest(F.coalesce(bytesCol.cast("long"), F.lit(0L)), F.lit(0L)))
    RangeCumsum.inclusive(withB, orderCol, Seq((F.col("__sh_b"), "__sh_cum")), buckets)
      // `div` = ANSI integral division: exact long math at any corpus
      // size (a double `/` silently loses precision above 2^52 bytes)
      .withColumn("shard",
        F.expr(s"CAST((__sh_cum - __sh_b) div $targetBytes AS INT)"))
      .drop("__sh_b", "__sh_cum")
  }

  /**
   * Route each row to the partition NUMBERED by its shard id, exactly
   * — partition i holds shard i and nothing else, so the one-shard-
   * per-partition writers emit `part-0000i` == shard i. A plain
   * `repartition(n, col)` hashes shard ids and can co-locate two
   * shards in one output file (breaking the byte balancing the
   * assignment just computed); `repartitionByRange` samples bounds
   * and is not guaranteed exact. This is the one place the identity
   * routing matters, so it drops to an RDD partitioner at the write
   * boundary (the rows are about to leave Spark anyway).
   *
   * `shardCol` must hold non-negative ints below `numShards`
   * (`assignShardsByBytes` output with
   * `numShards = max(shard) + 1`).
   */
  def repartitionByShard(
      df: DataFrame, shardCol: String, numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val spark = df.sparkSession
    val idx = df.schema.fieldIndex(shardCol)
    val part = new org.apache.spark.Partitioner {
      override def numPartitions: Int = numShards
      override def getPartition(key: Any): Int = key match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"shard id must be integral, got $other")
      }
    }
    val rdd = df.rdd
      .map { r =>
        val s = r.get(idx) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"shard id must be integral, got $other")
        }
        require(s >= 0 && s < numShards,
          s"shard id $s outside [0, $numShards)")
        (s, r)
      }
      .partitionBy(part)
      .values
    spark.createDataFrame(rdd, df.schema)
  }

  /** [[assignShardsByBytes]] + [[repartitionByShard]] in one call:
    * returns the routed frame (with the `shard` column) and the shard
    * count, ready for the one-shard-per-partition writers. */
  def shardByBytes(
      df: DataFrame,
      orderCol: Column,
      bytesCol: Column,
      targetBytes: Long,
      buckets: Int = 64): (DataFrame, Int) = {
    val assigned = assignShardsByBytes(df, orderCol, bytesCol, targetBytes, buckets)
      .localCheckpoint(eager = false)
    val mx = assigned.agg(F.max(F.col("shard"))).head()
    val n = if (mx.isNullAt(0)) 1 else mx.getInt(0) + 1
    (repartitionByShard(assigned, "shard", n), n)
  }
}
