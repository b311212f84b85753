package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loaders for the driver-generated test tables (TESTDATA.md).
 *
 * `events.ts` has shipped in two parquet spellings across driver
 * rounds, and both must surface as a session-zoned TimestampType so
 * `unix_millis` etc. resolve and agree with the DuckDB oracle's
 * `epoch_ms` (naive wall clock read as UTC — every graft session pins
 * spark.sql.session.timeZone=UTC):
 *  - TIMESTAMP(NANOS), which Spark's reader rejects by default: read
 *    nanos as long (spark.sql.legacy.parquet.nanosAsLong) and rebuild
 *    microseconds;
 *  - TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
 *    TIMESTAMP_NTZ: cast to TimestampType (UTC session zone makes the
 *    cast instant-preserving vs the oracle).
 */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (!df.schema.fieldNames.contains("ts")) df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral division: `/` on longs is a double Divide, which loses
        // sub-microsecond precision for epoch nanos beyond 2^53
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
}
