package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * All reads go through here so scan-level normalization happens once:
  *   - `events.ts` normalizes to TimestampType (microseconds, UTC session)
  *     whatever the parquet writer produced: TIMESTAMP(NANOS) arrives as a
  *     nanos BIGINT (legacy.parquet.nanosAsLong) and is floored to micros
  *     like DuckDB's `epoch_us`; TIMESTAMP(MICROS) without a zone arrives
  *     as TIMESTAMP_NTZ and re-types to the same UTC instant.
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the loader
  * keeps call sites declarative (`Tables.lineitem(spark, dir)`) so swapping
  * in a real catalog is a one-file change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    Graft.tune(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    name match {
      case "events" => normalizeEventTs(df)
      case _ => df
    }
  }

  /** Normalize `events.ts` to micros TimestampType on a batch OR streaming
    * DataFrame, whatever physical type the parquet writer chose:
    *   - TIMESTAMP(NANOS) reads as a nanos BIGINT under nanosAsLong —
    *     `div` floors to micros exactly like DuckDB's `epoch_us`;
    *   - TIMESTAMP(MICROS) without a zone reads as TIMESTAMP_NTZ — under
    *     the UTC session timeZone [[Graft.tune]] pins, the re-type to
    *     TimestampType preserves the instant;
    *   - TIMESTAMP(MICROS) with a zone already is TimestampType.
    * The match is on the static schema, so streaming plans stay incremental.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
