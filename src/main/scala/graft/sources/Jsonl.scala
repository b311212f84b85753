package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * Newline-delimited JSON ingestion with corrupt-record quarantine —
 * the raw-crawl landing shape: web-scale JSONL always carries some
 * truncated/garbled lines, and the pipeline must split them off for
 * audit WITHOUT failing the read (FAILFAST) or silently nulling them
 * (plain PERMISSIVE).
 *
 * Scale shape: the read is the standard splittable text scan — one
 * task per file split, schema enforced up front so the parser never
 * runs schema inference over the corpus (inference is a full extra
 * pass). The single parse is shared by both outputs via a lazy
 * localCheckpoint: good rows and quarantined lines come from ONE scan,
 * not two.
 */
object Jsonl {

  /**
   * Read `path` as JSONL against `schema`, returning
   * (good rows, quarantined raw lines). Malformed lines land in the
   * quarantine frame as their original text (column `line`), so they
   * can be persisted for replay once the producer is fixed.
   *
   * The parsed frame is lazily localCheckpoint'ed: Spark refuses
   * queries that select ONLY the internal corrupt-record column from a
   * raw JSON source (SPARK-21610), and the checkpoint also guarantees
   * the text scan runs once for both outputs.
   */
  def readWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType,
      corruptCol: String = "_corrupt_record"): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not already contain the corrupt-record column $corruptCol")
    val parsed = spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .localCheckpoint(eager = false)
    val good = parsed.filter(F.col(corruptCol).isNull).drop(corruptCol)
    val bad = parsed.filter(F.col(corruptCol).isNotNull)
      .select(F.col(corruptCol).as("line"))
    (good, bad)
  }
}
