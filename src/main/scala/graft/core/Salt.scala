package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-tolerant two-phase aggregation (SURVEY §9 "salting for skew"):
  * partial-aggregate on (keys, salt) — spreading a hot key over `buckets`
  * reducers — then merge partials on the bare keys. For the decomposable
  * aggregates pmacct uses (sum/count/min/max/bit_or) the result is
  * IDENTICAL to the direct plan; only the shuffle layout changes.
  *
  * AQE's skew handling covers joins; aggregation skew (one exporter or
  * one /8 producing most records) is what this addresses at 100 TB.
  */
object Salt {

  /** One aggregate: output name, phase-1 partial, phase-2 merge of the
    * named partial column. */
  final case class Agg(name: String, partial: Column,
                       merge: String => Column)

  def sum2(name: String, c: Column): Agg =
    Agg(name, sum(c), n => sum(col(n)))
  def count2(name: String): Agg =
    Agg(name, count(lit(1)), n => sum(col(n)))
  def min2(name: String, c: Column): Agg = Agg(name, min(c), n => min(col(n)))
  def max2(name: String, c: Column): Agg = Agg(name, max(c), n => max(col(n)))
  def bitOr2(name: String, c: Column): Agg =
    Agg(name, bit_or(c), n => bit_or(col(n)))

  def aggregate(df: DataFrame, keys: Seq[String], saltFrom: Column,
                buckets: Int, aggs: Seq[Agg]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(saltFrom, lit(buckets)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head.partial.as(aggs.head.name),
        aggs.tail.map(a => a.partial.as(a.name)): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head.merge(aggs.head.name).as(aggs.head.name),
        aggs.tail.map(a => a.merge(a.name).as(a.name)): _*)
  }
}
