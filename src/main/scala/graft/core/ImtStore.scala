package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-memory aggregate table with the IMT plugin's client operations
  * (SURVEY §2.9): continuous upsert-merge of new aggregates, full/partial
  * queries via Spark SQL, `-r` reset-counters and `-e` erase
  * (`src/imt_plugin.c`, `src/server.c`; reset served on next update,
  * docs/INTERNALS:246-249).
  *
  * State is a cached DataFrame behind a temp view — the local[N] stand-in
  * for a Delta/state-store table on a cluster.
  */
final class ImtStore(spark: SparkSession, name: String,
                     keys: Seq[String], counters: Seq[String]) {

  private var state: Option[DataFrame] = None

  private def publish(df: DataFrame): Unit = {
    val cached = df.cache()
    cached.count() // materialize before dropping the predecessor
    state.foreach(_.unpersist())
    state = Some(cached)
    cached.createOrReplaceTempView(name)
  }

  private def mergeByKey(df: DataFrame): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(counters.head).as(counters.head),
        counters.tail.map(c => sum(c).as(c)): _*)

  /** Merge a batch of aggregates: counters accumulate per key
    * (Accumulate_Counters, src/imt_plugin.h:145) — including duplicate
    * keys WITHIN the very first batch. */
  def upsert(batch: DataFrame): Unit = {
    val merged = state match {
      case None => mergeByKey(batch)
      case Some(cur) => mergeByKey(cur.unionByName(batch))
    }
    publish(merged)
  }

  /** `pmacct -s` / `-c ... -M ...` queries are plain SQL on the view. */
  def query(sql: String): DataFrame = spark.sql(sql)

  def table: DataFrame = state.getOrElse(spark.emptyDataFrame)

  /** `-r`: zero all counters, keep keys. */
  def reset(): Unit = state.foreach { cur =>
    publish(cur.select(keys.map(col) ++
      counters.map(c => lit(0L).as(c)): _*))
  }

  /** `-e`: drop the table contents. */
  def erase(): Unit = {
    state.foreach { cur => publish(cur.limit(0)) }
  }
}
