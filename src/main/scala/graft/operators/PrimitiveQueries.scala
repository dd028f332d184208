package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{FlowView, Q, Tables}

/** Primitive-family coverage (SURVEY §1.1/§1.3): the MPLS/tunnel structs
  * and the BGP attribute encodings (as_path / communities as bounded
  * strings AND as arrays — `as_path_encode_as_array`,
  * `bgp_comms_encode_as_array`, `mpls_label_stack_encode_as_array`,
  * CONFIG-KEYS:1745-1784). Values are derived deterministically from the
  * flow view, mirrored in the oracle; what is exercised is the array
  * encode/decode expression surface and grouping on derived primitives.
  */
object PrimitiveQueries {

  private def flows(s: org.apache.spark.sql.SparkSession, d: String) =
    FlowView.fromEvents(Tables.events(s, d))

  val all: Seq[Q] = Seq(

    // MPLS label stack + VXLAN VNI: stack as "pos-label" array encoding
    // joined to its string form (mpls_label_stack_encode_as_array).
    Q("q65_mpls_tunnel",
      (s, d) => flows(s, d)
        .withColumn("label_top", col("event_id") % 1048576)
        .withColumn("label_bot", (col("event_id") * 7) % 1048576)
        .withColumn("vni", col("ip_src") % 16777216)
        .withColumn("stack_str", expr(
          """array_join(transform(array(label_top, label_bot),
             (l, i) -> concat(cast(i as string), '-', cast(l as string))),
             ',')"""))
        .groupBy((col("label_top") % 64).as("label_bucket"),
          (col("vni") % 32).as("vni_bucket"))
        .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"),
          max("stack_str").as("stack_sample")),
      Some(FlowView.cte(
        """SELECT (event_id % 1048576) % 64 AS label_bucket,
           (ip_src % 16777216) % 32 AS vni_bucket,
           count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes,
           max(concat('0-', CAST(event_id % 1048576 AS VARCHAR),
             ',1-', CAST((event_id * 7) % 1048576 AS VARCHAR)))
             AS stack_sample
           FROM flows GROUP BY 1, 2""")),
      doc = "MPLS label stack + tunnel VNI primitives, array encoding"),

    // as_path / communities: string and array encodings; filter on
    // community membership, group on path length.
    Q("q66_bgp_attrs",
      (s, d) => flows(s, d)
        .withColumn("as_path", expr(
          """concat('64500 ', cast(ip_dst % 100 + 64600 as string),
             CASE WHEN ip_dst % 3 = 0
               THEN concat(' ', cast(ip_dst % 50 + 64800 as string))
               ELSE '' END)"""))
        .withColumn("comms", expr(
          """concat('64500:', cast(ip_dst % 8 as string), ' 64500:',
             cast(port_dst as string))"""))
        .filter(expr("array_contains(split(comms, ' '), '64500:80')") ||
          expr("array_contains(split(comms, ' '), '64500:53')"))
        .groupBy(expr("size(split(as_path, ' '))").as("path_len"))
        .agg(count(lit(1)).as("n"), sum("bytes").as("bytes"),
          countDistinct(expr("element_at(split(as_path, ' '), -1)"))
            .as("n_origins")),
      Some(FlowView.cte(
        """SELECT len(string_split(as_path, ' ')) AS path_len,
           count(*) AS n, CAST(sum(bytes) AS BIGINT) AS bytes,
           count(DISTINCT list_extract(string_split(as_path, ' '),
             len(string_split(as_path, ' ')))) AS n_origins
           FROM (
             SELECT bytes,
               concat('64500 ', CAST(ip_dst % 100 + 64600 AS VARCHAR),
                 CASE WHEN ip_dst % 3 = 0
                   THEN concat(' ', CAST(ip_dst % 50 + 64800 AS VARCHAR))
                   ELSE '' END) AS as_path,
               concat('64500:', CAST(ip_dst % 8 AS VARCHAR), ' 64500:',
                 CAST(port_dst AS VARCHAR)) AS comms
             FROM flows)
           WHERE list_contains(string_split(comms, ' '), '64500:80')
              OR list_contains(string_split(comms, ' '), '64500:53')
           GROUP BY 1""")),
      doc = "as_path/communities string+array encodings, membership filter")
  )
}
