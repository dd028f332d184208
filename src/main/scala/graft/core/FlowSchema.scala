package graft.core

import org.apache.spark.sql.types._

/** The wide flow-record schema — Spark mapping of pmacct's primitive
  * registry (`src/pmacct-defines.h:172-384`, 213 COUNT_INT_* primitives;
  * struct layouts `src/network.h:436-660`).
  *
  * One nullable StructType covers every primitive family; a query's
  * `aggregate:` list is a projection of it (Catalyst column pruning makes
  * the untouched fields free, which is the Spark-native analogue of
  * pmacct's bitmask-driven handler-chain compilation,
  * `src/pkt_handlers.c:99-1320`).
  *
  * Unsigned C counters widen to the next signed Spark type (u64 counters
  * stay Long: pmacct flushes well before overflow; we document the same).
  */
object FlowSchema {

  // -- core primitives (struct pkt_primitives, src/network.h:436-481)
  private val core = Seq(
    StructField("mac_src", StringType),
    StructField("mac_dst", StringType),
    StructField("vlan", IntegerType),
    StructField("cvlan", IntegerType),
    StructField("cos", IntegerType),
    StructField("etype", IntegerType),
    StructField("ip_src", StringType),
    StructField("ip_dst", StringType),
    StructField("net_src", StringType),
    StructField("net_dst", StringType),
    StructField("mask_src", IntegerType),
    StructField("mask_dst", IntegerType),
    StructField("as_src", LongType),
    StructField("as_dst", LongType),
    StructField("port_src", IntegerType),
    StructField("port_dst", IntegerType),
    StructField("tos", IntegerType),
    StructField("ip_proto", StringType),
    StructField("flow_label", LongType),
    StructField("iface_in", LongType),
    StructField("iface_out", LongType),
    StructField("country_ip_src", StringType),
    StructField("country_ip_dst", StringType),
    StructField("pocode_ip_src", StringType),
    StructField("pocode_ip_dst", StringType),
    StructField("lat_ip_src", DoubleType),
    StructField("lon_ip_src", DoubleType),
    StructField("lat_ip_dst", DoubleType),
    StructField("lon_ip_dst", DoubleType),
    StructField("class", StringType),
    StructField("tag", LongType),
    StructField("tag2", LongType),
    StructField("label", StringType),
    StructField("sampling_rate", LongType),
    StructField("sampling_direction", StringType),
    StructField("export_proto_seqno", LongType),
    StructField("export_proto_version", IntegerType),
    StructField("export_sysid", LongType))

  // -- BGP primitives (pkt_bgp_primitives / legacy, src/network.h:594-618)
  private val bgp = Seq(
    StructField("peer_ip_src", StringType),   // exporter IP
    StructField("peer_ip_dst", StringType),   // next hop
    StructField("peer_as_src", LongType),
    StructField("peer_as_dst", LongType),
    StructField("local_pref", LongType),
    StructField("med", LongType),
    StructField("as_path", StringType),
    StructField("comms", StringType),
    StructField("ecomms", StringType),
    StructField("lcomms", StringType),
    StructField("mpls_vpn_rd", StringType),
    StructField("mpls_vpn_rd_origin", StringType),
    StructField("roa_src", StringType),
    StructField("roa_dst", StringType))

  // -- NAT / firewall (pkt_nat_primitives, src/network.h:620-632)
  private val nat = Seq(
    StructField("post_nat_ip_src", StringType),
    StructField("post_nat_ip_dst", StringType),
    StructField("post_nat_port_src", IntegerType),
    StructField("post_nat_port_dst", IntegerType),
    StructField("nat_event", IntegerType),
    StructField("fw_event", IntegerType),
    StructField("fwd_status", IntegerType))

  // -- MPLS / tunnel (src/network.h:634-660)
  private val mpls = Seq(
    StructField("mpls_label_top", LongType),
    StructField("mpls_label_bottom", LongType),
    StructField("mpls_label_stack", ArrayType(StringType)),
    StructField("srv6_seg_ipv6_list", ArrayType(StringType)),
    StructField("tunnel_ip_src", StringType),
    StructField("tunnel_ip_dst", StringType),
    StructField("tunnel_proto", StringType),
    StructField("tunnel_tos", IntegerType),
    StructField("tunnel_port_src", IntegerType),
    StructField("tunnel_port_dst", IntegerType),
    StructField("vxlan_vni", LongType),
    StructField("nvgre_tni", LongType))

  // -- names learned from option templates (src/pkt_handlers.c:2099-2200)
  private val names = Seq(
    StructField("iface_in_name", StringType),
    StructField("iface_out_name", StringType),
    StructField("vrf_name", StringType),
    StructField("vrf_id_ingress", LongType),
    StructField("vrf_id_egress", LongType))

  // -- counters + times (struct pkt_data, src/network.h:483-493)
  private val counters = Seq(
    StructField("packets", LongType),
    StructField("bytes", LongType),
    StructField("flows", LongType),
    StructField("flow_type", IntegerType),
    StructField("tcp_flags", IntegerType),
    StructField("timestamp_start", TimestampType),
    StructField("timestamp_end", TimestampType),
    StructField("timestamp_arrival", TimestampType),
    StructField("timestamp_export", TimestampType))

  // -- user-defined primitives (aggregate_primitives, CONFIG-KEYS:174-180)
  private val custom = Seq(
    StructField("custom_primitives", MapType(StringType, StringType)))

  val schema: StructType =
    StructType(core ++ bgp ++ nat ++ mpls ++ names ++ counters ++ custom)

  val fieldNames: Seq[String] = schema.fieldNames.toSeq
}
