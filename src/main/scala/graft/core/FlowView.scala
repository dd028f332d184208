package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic flow-record view over the driver's `events` table.
  *
  * The oracle gate runs on TPC-H-ish tables, not pcap replays, so engine
  * semantics (pro-rating, preprocess sampling, tagging, windowed flow
  * aggregation) are exercised through this arithmetic mapping of `events`
  * into flow records. The Scala projection and [[sql]] (a DuckDB CTE) are
  * kept in exact lockstep: integer arithmetic only, plus one
  * `floor(double)` both engines evaluate identically (IEEE 754).
  *
  * Columns: ip_src/ip_dst (numeric host ids), ports, ip_proto (6/17),
  * bytes/packets counters, tcp_flags, and [t0u, t1u) flow start/end in
  * epoch microseconds with duration up to 10 minutes — enough to span
  * multiple 5-minute history bins, which is what pro-rating needs.
  */
/** Typed form of the flow view — the `Dataset[T]` core promised by
  * SURVEY §1.3 for operators that want compile-time field safety
  * (the stateful ops in [[graft.streaming.StreamingQueries]] use their
  * own narrower records; this is the full row). */
final case class FlowRecord(
    event_id: Long, ip_src: Long, ip_dst: Long, port_src: Long,
    port_dst: Long, ip_proto: Long, bytes: Long, packets: Long,
    tcp_flags: Long, t0u: Long, t1u: Long)

object FlowView {

  /** Typed accessor: `Dataset[FlowRecord]` over the same projection. */
  def typed(events: DataFrame): org.apache.spark.sql.Dataset[FlowRecord] = {
    val enc = org.apache.spark.sql.Encoders.product[FlowRecord]
    fromEvents(events).as(enc)
  }

  def fromEvents(events: DataFrame): DataFrame = events.select(
    col("event_id"),
    (col("user_id") * 48271 % 65536).as("ip_src"), // scatter over ip space
    ((col("event_id") * 31 + col("user_id")) % 65536).as("ip_dst"),
    (col("event_id") % 50000).as("port_src"),
    when(col("event_type") === "click", 80L)
      .when(col("event_type") === "view", 443L)
      .when(col("event_type") === "purchase", 8443L)
      .when(col("event_type") === "signup", 25L)
      .otherwise(53L).as("port_dst"),
    when(col("event_type") === "error", 17L).otherwise(6L).as("ip_proto"),
    (expr("CAST(floor(value * 1000) AS BIGINT)") + 40L).as("bytes"),
    (lit(1L) + col("event_id") % 10).as("packets"),
    (col("event_id") % 256).as("tcp_flags"),
    expr("unix_micros(ts)").as("t0u"),
    (expr("unix_micros(ts)") + (col("event_id") % 600) * 1000000L).as("t1u"))

  /** DuckDB mirror of [[fromEvents]], for oracle SQL (`WITH flows AS (...)`). */
  val sql: String =
    """SELECT event_id,
       user_id * 48271 % 65536 AS ip_src,
       (event_id * 31 + user_id) % 65536 AS ip_dst,
       event_id % 50000 AS port_src,
       CASE event_type WHEN 'click' THEN 80 WHEN 'view' THEN 443
            WHEN 'purchase' THEN 8443 WHEN 'signup' THEN 25
            ELSE 53 END AS port_dst,
       CASE WHEN event_type = 'error' THEN 17 ELSE 6 END AS ip_proto,
       CAST(floor(value * 1000) AS BIGINT) + 40 AS bytes,
       1 + event_id % 10 AS packets,
       event_id % 256 AS tcp_flags,
       epoch_us(ts) AS t0u,
       epoch_us(ts) + (event_id % 600) * 1000000 AS t1u
       FROM events"""

  def cte(body: String): String = s"WITH flows AS ($sql) $body"
}
