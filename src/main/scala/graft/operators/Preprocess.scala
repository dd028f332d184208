package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** pmacct preprocess ops (`sql_preprocess`/`print_preprocess`,
  * CONFIG-KEYS:1573-1689; dispatch `set_preprocess_funcs`
  * src/preprocess.c:37): HAVING-style gates and the two statistical
  * resampling schemes (Duffield sample-and-hold, priority sampling).
  *
  * The reference applies these to the flush queue — bounded, per-interval
  * data. The rank-based ops here use a global window the same way; on a
  * real cluster they run per flush micro-batch (bounded cardinality), not
  * over an unbounded fact table.
  *
  * Randomness: the reference draws from random(); for oracle-replayable
  * determinism we derive the uniform from the row key with a Knuth
  * multiplicative hash — pure integer arithmetic both engines evaluate
  * identically. Documented deviation: statistically equivalent, replayable.
  */
object Preprocess {

  /** HAVING floors/ceilings: minp/minb/minf/maxp/maxb/maxf
    * (src/preprocess.c:389-470). */
  def having(df: DataFrame, conds: Column*): DataFrame =
    conds.foldLeft(df)((d, c) => d.filter(c))

  /** usrf: multiply counters by an external sampling factor
    * (CONFIG-KEYS:1660-1668). */
  def usrf(df: DataFrame, factor: Long, counters: String*): DataFrame =
    counters.foldLeft(df)((d, c) => d.withColumn(c, col(c) * factor))

  /** adjb: add N bytes per packet, L2 overhead adjust
    * (CONFIG-KEYS:1669-1674). */
  def adjb(df: DataFrame, perPacket: Long, bytes: String = "bytes",
           packets: String = "packets"): DataFrame =
    df.withColumn(bytes, col(bytes) + col(packets) * perPacket)

  /** Deterministic uniform in (0,1) from an integer key column (Knuth
    * multiplicative hashing — public-domain constant 2654435761). */
  def detUniform(key: Column): Column =
    ((key * 2654435761L) % 1000003L + 1L).cast("double") / 1000004.0

  /** SQL mirror of [[detUniform]] for oracle queries. */
  def detUniformSql(key: String): String =
    s"CAST(($key * 2654435761) % 1000003 + 1 AS DOUBLE) / 1000004.0"

  /** fss — Duffield sample-and-hold (src/preprocess.c:549-580;
    * CONFIG-KEYS:1634-1648): keep an aggregate with probability
    * min(1, bytes/threshold); boost kept small flows to the threshold so
    * the byte estimate stays unbiased.
    */
  def fss(df: DataFrame, bytes: Column, key: Column,
          threshold: Long): DataFrame =
    df.filter(bytes.cast("double") >= detUniform(key) * threshold)
      .withColumn("bytes_est", greatest(bytes, lit(threshold)))

  /** fsrc — priority sampling under a resource constraint
    * (src/preprocess.c:582-660; CONFIG-KEYS:1649-1659): priority
    * z = bytes/u, keep the top-m, estimate each kept flow as
    * max(bytes, tau) where tau is the (m+1)-th priority.
    */
  def fsrc(df: DataFrame, bytes: Column, key: Column, m: Int): DataFrame = {
    val z = bytes.cast("double") / detUniform(key)
    val w = Window.orderBy(z.desc, key.asc)
    val ranked = df.withColumn("__z", z)
      .withColumn("__rn", row_number().over(w))
    val tau = ranked.filter(col("__rn") === m + 1)
      .select(col("__z").as("__tau"))
    // left join on TRUE: when the set has <= m rows there is no (m+1)-th
    // priority and everything is kept unadjusted (pmacct keeps the queue).
    ranked.filter(col("__rn") <= m)
      .join(broadcast(tau), lit(true), "left")
      .withColumn("bytes_est",
        greatest(bytes.cast("double"), coalesce(col("__tau"), lit(0.0))))
      .drop("__z", "__rn", "__tau")
  }
}
