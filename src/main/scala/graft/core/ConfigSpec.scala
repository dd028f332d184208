package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.BpfFilter

/** pmacct config-file veneer (SURVEY §7 "Config-file compatibility is the
  * API veneer, not the core"): parse the aggregation-relevant subset of a
  * pmacct plugin config into a [[FlowPlan]] and run it through
  * [[AggregatePlanner]]. A reference user's `aggregate:` spec drives the
  * Spark engine unchanged.
  *
  * Supported keys (CONFIG-KEYS): `aggregate` (primitive list, comma=AND),
  * `aggregate_filter` (BPF subset via [[BpfFilter]]), `*_history`
  * (`N[smhd]` epoch bins or `w`/`M` calendar bins), `preprocess`
  * (`minb=N,minp=N,maxb=N,maxp=N` HAVING gates), `pre_tag_map`
  * (`;`-separated first-match rules `set_tag=N [ip=X] [filter='bpf']`,
  * CONFIG-KEYS:2234), `pre_tag_filter` (`[-]t1,t2,...`, CONFIG-KEYS:2312),
  * `sampling_rate` (counter renormalization ×N, CONFIG-KEYS:2358).
  */
object ConfigSpec {

  /** Flow-record primitive name → column (pmacct vocabulary). */
  def defaultFields: Map[String, Column] = Map(
    "src_host" -> col("ip_src"), "dst_host" -> col("ip_dst"),
    "src_port" -> col("port_src"), "dst_port" -> col("port_dst"),
    "proto" -> col("ip_proto"), "tag" -> col("tag"),
    "peer_src_ip" -> (col("ip_src") % 16), "none" -> lit(0))

  final case class ParseError(msg: String) extends RuntimeException(msg)

  def parse(conf: String,
            fields: Map[String, Column] = defaultFields): FlowPlan = {
    val kv = conf.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("!") && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf(':')
        if (i < 0) throw ParseError(s"bad config line: $l")
        (l.take(i).trim, l.drop(i + 1).trim)
      }.toMap

    val bpfFields = BpfFilter.Fields(
      col("ip_src"), col("ip_dst"), col("port_src"), col("port_dst"),
      col("ip_proto"), col("bytes"), col("packets"))

    // pre_tag_map: first-match rule chain; `ip=` matches the exporter
    // (modeled as ip_src % 16, as everywhere in this corpus)
    val tagRules = kv.get("pre_tag_map").toSeq.flatMap {
      _.split(";").map(_.trim).filter(_.nonEmpty)
        .map(parseTagRule(_, bpfFields))
    }
    val effFields =
      if (tagRules.isEmpty) fields
      else fields + ("tag" -> graft.maps.PreTagMap.tagColumn(tagRules))

    val keys: Seq[(String, Column)] = kv.get("aggregate") match {
      case None | Some("none") => Nil
      case Some(list) => list.split(",").map(_.trim).filter(_.nonEmpty)
        .map { p =>
          p -> effFields.getOrElse(p,
            throw ParseError(s"unknown primitive '$p'"))
        }.toSeq
    }

    val bpf = kv.get("aggregate_filter")
      .map(f => BpfFilter.compile(f, bpfFields))
    val preTag = kv.get("pre_tag_filter").map { spec =>
      val (neg, body) =
        if (spec.startsWith("-")) (true, spec.drop(1)) else (false, spec)
      graft.maps.PreTagMap.tagFilter(
        effFields.getOrElse("tag", col("tag")),
        body.split(",").map(_.trim.toLong).toSeq, neg)
    }
    val filter = (bpf.toSeq ++ preTag.toSeq).reduceOption(_ && _)

    // sampling_rate: renormalize counters ×N at projection time
    // (counters_renormalize_handler, src/pkt_handlers.c:1773)
    val rate = kv.get("sampling_rate").map(_.trim.toLong).getOrElse(1L)

    val history = kv.collectFirst {
      case (k, v) if k.endsWith("_history") => parseHistory(v)
    }

    val havings: Seq[Column] = kv.get("preprocess").toSeq.flatMap {
      _.split(",").map(_.trim).filter(_.nonEmpty).map { spec =>
        spec.split("=") match {
          case Array("minb", n) => col("bytes") >= n.trim.toLong
          case Array("maxb", n) => col("bytes") <= n.trim.toLong
          case Array("minp", n) => col("packets") >= n.trim.toLong
          case Array("maxp", n) => col("packets") <= n.trim.toLong
          case Array("minf", n) => col("flows") >= n.trim.toLong
          case _ => throw ParseError(s"bad preprocess spec '$spec'")
        }
      }
    }

    FlowPlan(
      keys = keys,
      counters = AggregatePlanner.flowCounters(
        col("bytes") * rate, col("packets") * rate,
        col("tcp_flags"), col("t0u"), col("t1u")),
      filter = filter,
      history = history.map("bin_start" -> _.binOfMicros(col("t0u"))),
      havings = havings)
  }

  private val SetTag = """set_tag=(\d+)""".r
  private val IpMatch = """\bip=(\d+)""".r
  private val FilterMatch = """filter='([^']*)'""".r

  private def parseTagRule(entry: String,
                           f: BpfFilter.Fields): graft.maps.PreTagMap.TagRule = {
    val tag = SetTag.findFirstMatchIn(entry)
      .getOrElse(throw ParseError(s"bad pre_tag_map entry '$entry'"))
      .group(1).toLong
    val preds =
      IpMatch.findFirstMatchIn(entry)
        .map(m => (col("ip_src") % 16) === m.group(1).toLong).toSeq ++
      FilterMatch.findFirstMatchIn(entry)
        .map(m => BpfFilter.compile(m.group(1), f)).toSeq
    graft.maps.PreTagMap.TagRule(
      preds.reduceOption(_ && _).getOrElse(lit(true)), tag)
  }

  private def parseHistory(spec: String): History = spec match {
    case "w" => CalendarHistory("week")
    case "M" => CalendarHistory("month")
    case s if s.nonEmpty && s.last.isDigit => SecondsHistory(s.toLong)
    case s =>
      val n = s.init.toLong
      s.last match {
        case 's' => SecondsHistory(n)
        case 'm' => SecondsHistory(n * 60)
        case 'h' => SecondsHistory(n * 3600)
        case 'd' => SecondsHistory(n * 86400)
        case u => throw ParseError(s"bad history unit '$u'")
      }
  }

  /** Parse + plan in one step over a flow-record frame. */
  def run(flows: DataFrame, conf: String,
          fields: Map[String, Column] = defaultFields): DataFrame =
    AggregatePlanner.plan(flows, parse(conf, fields))
}
