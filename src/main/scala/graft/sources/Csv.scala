package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * CSV ingestion with corrupt-record quarantine — the [[Jsonl]] shape
 * for delimited exports. Spark's CSV reader pads missing trailing
 * columns with NULL; what lands in quarantine is the genuinely
 * malformed: type-cast failures and broken quoting.
 *
 * Same scale shape as JSONL: splittable text scan, schema enforced up
 * front (no inference pass), one parse shared by both outputs via a
 * lazy localCheckpoint.
 */
object Csv {

  /**
   * Read `path` as CSV against `schema`, returning
   * (good rows, quarantined raw lines as column `line`).
   */
  def readWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = false,
      delimiter: String = ",",
      corruptCol: String = "_corrupt_record"): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not already contain the corrupt-record column $corruptCol")
    val parsed = spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)
      .localCheckpoint(eager = false)
    val good = parsed.filter(F.col(corruptCol).isNull).drop(corruptCol)
    val bad = parsed.filter(F.col(corruptCol).isNotNull)
      .select(F.col(corruptCol).as("line"))
    (good, bad)
  }
}
