package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * All reads go through here so scan-level normalization happens once:
  *   - `events.ts` is parquet TIMESTAMP(NANOS); Spark reads it as a nanos
  *     BIGINT (legacy.parquet.nanosAsLong) and we convert to TimestampType
  *     (microsecond precision, floor — matching DuckDB's `epoch_us`).
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
      // nanos BIGINT -> micros TimestampType; `div` floors like epoch_us.
      case "events" => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
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
