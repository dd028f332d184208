package graft.maps

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic enrichment dimension fixtures (SURVEY §2.6; FIXTURES.md F5).
  *
  * pmacct loads its lookup maps (networks_file, sampling_map, bgp_agent_map,
  * GeoIP, RPKI roas) from config files at startup; here each map is a literal
  * Scala table rendered BOTH as a Spark DataFrame (broadcast dimension) and
  * as a DuckDB `VALUES` CTE, so oracle SQL and engine stay in exact lockstep.
  *
  * The flow "IP space" is [[graft.core.FlowView]]'s 16-bit host ids, so
  * prefixes are (base, len) over 16 bits: ip matches iff
  * `ip >> (16-len) == base >> (16-len)` (base stored aligned).
  */
object Dims {

  private def df(spark: SparkSession, cols: Seq[String],
                 rows: Seq[Seq[Any]]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val fields = cols.zip(rows.head).map {
      case (n, _: Long) => StructField(n, LongType, nullable = false)
      case (n, _: String) => StructField(n, StringType, nullable = false)
      case (n, _) => StructField(n, LongType, nullable = false)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), 1),
      StructType(fields))
  }

  /** Render rows as a DuckDB VALUES CTE (public: oracle SQL for queries
    * with query-local fixtures, e.g. the RTR-fed ROA set, uses it too). */
  def values(name: String, cols: Seq[String],
             rows: Seq[Seq[Any]]): String = {
    val lits = rows.map(_.map {
      case s: String => "'" + s + "'"
      case v => v.toString
    }.mkString("(", ", ", ")")).mkString(", ")
    s"$name(${cols.mkString(", ")}) AS (SELECT * FROM (VALUES $lits) " +
      s"AS t(${cols.mkString(", ")}))"
  }

  // ---- networks_file (CONFIG-KEYS:1046-1061; src/net_aggr.c:40) ----------
  // [AS,]prefix/len over the 16-bit flow space, bases aligned to len.
  // Overlapping prefixes exercise longest-match-wins; no default route so
  // misses are observable (networks_file_filter semantics).
  private val netCols = Seq("asn", "base", "len")
  private val netRows: Seq[Seq[Any]] = Seq(
    Seq(65001L, 0L, 2L),          // 0..16383/2
    Seq(65002L, 16384L, 2L),      // 16384..32767/2
    Seq(65101L, 8192L, 4L),       // inside 65001, longer match
    Seq(65102L, 20480L, 4L),      // inside 65002
    Seq(65201L, 9216L, 6L),       // inside 65101, longer still
    Seq(65202L, 40960L, 3L),      // 40960..49151
    Seq(65301L, 43008L, 8L),
    Seq(65302L, 43520L, 10L),
    Seq(65401L, 65024L, 10L),
    Seq(65402L, 65280L, 16L))     // a /32-equivalent host route
  def networks(s: SparkSession): DataFrame = df(s, netCols, netRows)
  val networksSql: String = values("networks", netCols, netRows)
  /** Distinct mask lengths present, descending — the LPM probe order. */
  val networkLens: Seq[Int] =
    netRows.map(_(2).asInstanceOf[Long].toInt).distinct.sorted.reverse
  /** (base, len, asn) triples for building an [[graft.plans.Lpm.Table]]. */
  val networkPrefixes: Seq[(Long, Int, Long)] = netRows.map(r =>
    (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long].toInt,
      r(0).asInstanceOf[Long]))

  // ---- sampling_map (CONFIG-KEYS:2368; src/pkt_handlers.c:3706) ----------
  // exporter id -> sampling rate override (renormalize bytes*rate).
  private val sampCols = Seq("exporter", "rate")
  private val sampRows: Seq[Seq[Any]] =
    (0L until 16L).map(e => Seq(e, 1L + (e % 4L) * 99L)) // 1, 100, 199, 298
  def samplingMap(s: SparkSession): DataFrame = df(s, sampCols, sampRows)
  val samplingSql: String = values("sampling_map", sampCols, sampRows)

  // ---- allow list (nfacctd_allow_file, CONFIG-KEYS:2003) -----------------
  private val allowCols = Seq("exporter")
  private val allowRows: Seq[Seq[Any]] = Seq(0L, 1L, 2L, 3L, 5L, 8L, 13L)
    .map(Seq(_))
  def allowList(s: SparkSession): DataFrame = df(s, allowCols, allowRows)
  val allowSql: String = values("allow_list", allowCols, allowRows)

  // ---- GeoIP-style range table (CONFIG-KEYS:3363-3371) -------------------
  // Contiguous [ip_lo, ip_hi] ranges -> country. Covers part of the space;
  // misses yield NULL country (pmacct leaves the field empty).
  // lat/lon as 1e-4-degree scaled integers (src/network.h:465-468 keeps
  // doubles; integer scaling keeps the fixtures engine-lockstep exact).
  private val geoCols = Seq("ip_lo", "ip_hi", "country", "lat_e4", "lon_e4")
  private val geoRows: Seq[Seq[Any]] = Seq(
    Seq(0L, 9999L, "US", 389000L, -770000L),
    Seq(10000L, 19999L, "DE", 525200L, 134000L),
    Seq(20000L, 29999L, "FR", 488566L, 23522L),
    Seq(30000L, 44999L, "JP", 356762L, 1396503L),
    Seq(45000L, 52999L, "BR", -158000L, -478000L),
    Seq(53000L, 59999L, "IN", 286139L, 772090L))
  def geo(s: SparkSession): DataFrame = df(s, geoCols, geoRows)
  val geoSql: String = values("geo", geoCols, geoRows)
  /** Bucket width for the scale-path bucketed range join (power of two). */
  val geoBucket: Long = 4096L

  // ---- bgp_agent_map (CONFIG-KEYS:2986) + per-peer RIB -------------------
  // exporter -> bgp peer; RIB rows are (peer, base, len, origin_as, med).
  private val btaCols = Seq("exporter", "peer")
  private val btaRows: Seq[Seq[Any]] =
    (0L until 16L).map(e => Seq(e, e % 2L)) // two peers
  def bgpAgentMap(s: SparkSession): DataFrame = df(s, btaCols, btaRows)
  val bgpAgentSql: String = values("bgp_agent_map", btaCols, btaRows)

  private val ribCols = Seq("peer", "base", "len", "origin_as", "med")
  private val ribRows: Seq[Seq[Any]] = Seq(
    Seq(0L, 0L, 1L, 64512L, 10L),
    Seq(0L, 32768L, 1L, 64513L, 20L),
    Seq(0L, 49152L, 4L, 64514L, 30L),
    Seq(1L, 0L, 1L, 64612L, 11L),
    Seq(1L, 32768L, 2L, 64613L, 21L),
    Seq(1L, 49152L, 2L, 64614L, 31L),
    Seq(1L, 61440L, 4L, 64615L, 41L))
  def rib(s: SparkSession): DataFrame = df(s, ribCols, ribRows)
  val ribSql: String = values("rib", ribCols, ribRows)
  val ribLens: Seq[Int] =
    ribRows.map(_(2).asInstanceOf[Long].toInt).distinct.sorted.reverse
  /** Keyed LPM over the (peer, ip) product space: peer in the high bit(s)
    * above the 16 ip bits, so a per-peer RIB lookup is ONE lpm probe over a
    * 17-bit space — prefix (peer*2^16 + base, 1+len) → origin_as. */
  val ribPrefixes17: Seq[(Long, Int, Long)] = ribRows.map(r =>
    (r(0).asInstanceOf[Long] * 65536L + r(1).asInstanceOf[Long],
      1 + r(2).asInstanceOf[Long].toInt, r(3).asInstanceOf[Long]))

  // ---- RPKI ROAs (rpki_roas_file, CONFIG-KEYS:3306-3330) -----------------
  // (base, len, max_len, asn): a route (prefix,as) is VALID if a covering
  // ROA exists with matching asn and len <= max_len; INVALID if covered
  // only by mismatching ROAs; UNKNOWN when no ROA covers it.
  private val roaCols = Seq("base", "len", "max_len", "asn")
  private val roaRows: Seq[Seq[Any]] = Seq(
    Seq(0L, 2L, 6L, 65001L),
    Seq(16384L, 2L, 4L, 65002L),
    Seq(40960L, 3L, 10L, 65202L),
    Seq(65024L, 10L, 16L, 65401L))
  def roas(s: SparkSession): DataFrame = df(s, roaCols, roaRows)
  val roasSql: String = values("roas", roaCols, roaRows)

  /** RPKI validation precomputed per networks_file entry (pmacct validates
    * routes, not packets — src/rpki/): 1=valid, 2=invalid, 3=unknown.
    * A ROA covers a route iff roa.len <= route.len and the route prefix
    * falls inside the ROA prefix; valid needs asn match and
    * route.len <= max_len.
    */
  val roaStateByNetwork: Seq[(Long, Int, Long)] =
    roaStatesFor(roaRows.map(ro => (ro(0).asInstanceOf[Long],
      ro(1).asInstanceOf[Long].toInt, ro(2).asInstanceOf[Long].toInt,
      ro(3).asInstanceOf[Long])))

  /** Same validation fold against an ARBITRARY ROA set — the RTR-session
    * variant (q111) validates routes against the set a live RFC 8210
    * session produced rather than the static roas file. Tuples are
    * (base, len, max_len, asn) over the 16-bit flow space. */
  def roaStatesFor(roaSet: Seq[(Long, Int, Int, Long)])
      : Seq[(Long, Int, Long)] = netRows.map { r =>
    val (asn, base, len) = (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
      r(2).asInstanceOf[Long].toInt)
    val covering = roaSet.filter { case (rb, rl, _, _) =>
      rl <= len && ((base >> (16 - rl)) << (16 - rl)) == rb
    }
    val state =
      if (covering.isEmpty) 3L
      else if (covering.exists { case (_, _, maxLen, roAsn) =>
        roAsn == asn && len <= maxLen }) 1L
      else 2L
    (base, len, state)
  }

  // ---- NetFlow option-record stream (FIXTURES F3) ------------------------
  // Sampling-rate option records per exporter over time (epoch micros):
  // three epochs 10 days apart starting 2024-01-01 (the data range start).
  private val day10Us = 864000000000L
  private val t0Us = 1704067200000000L // 2024-01-01T00:00:00Z
  private val optCols = Seq("exporter", "tu", "rate")
  private val optRows: Seq[Seq[Any]] = for {
    e <- 0L until 16L; k <- 0L until 3L
  } yield Seq(e, t0Us + k * day10Us, 1L + ((e + k) % 4L) * 50L)
  def optionRates(s: SparkSession): DataFrame = df(s, optCols, optRows)
  val optionRatesSql: String = values("option_rates", optCols, optRows)

  // ---- bgp_follow_nexthop (CONFIG-KEYS:3022-3058) ------------------------
  // next-hop resolution table: nh -> nh' chains, depth <= 3.
  private val nhCols = Seq("nh", "nh_next")
  private val nhRows: Seq[Seq[Any]] = Seq(
    Seq(10L, 20L), Seq(20L, 30L), Seq(30L, 31L), // 3-hop chain
    Seq(40L, 41L),                               // 1 hop
    Seq(50L, 50L))                               // self-loop (must terminate)
  def nexthops(s: SparkSession): DataFrame = df(s, nhCols, nhRows)
  val nexthopsSql: String = values("nexthops", nhCols, nhRows)
}
