package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loaders for the driver-generated test tables (TESTDATA.md).
 *
 * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
 * reader rejects by default; we read nanos as long
 * (spark.sql.legacy.parquet.nanosAsLong) and surface a proper
 * TimestampType column at microsecond precision.
 */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (df.schema.fieldNames.contains("ts") &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // integral division: `/` on longs is a double Divide, which loses
      // sub-microsecond precision for epoch nanos beyond 2^53
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
