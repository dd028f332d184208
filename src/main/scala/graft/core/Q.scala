package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL over the same parquet tables. Queries with
  * `oracle = None` get the driver's weaker rows-only check.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    doc: String = "")

object Q {
  /** Assemble a family list into the SparkEntry maps. Every lane gets
    * the graft function library registered on its session first (the
    * TextOps expression strings call graft_toks/graft_hash60; the
    * registration is a handful of registry puts, idempotent and
    * per-session-cheap, and the driver hands us arbitrary sessions). */
  def queriesOf(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> { (s: SparkSession, d: String) =>
      graft.functions.GraftFunctions.register(s)
      q.run(s, d)
    }).toMap
  def oraclesOf(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
