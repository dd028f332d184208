package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.graft.ColumnBridge

import graft.plans.{Lpm, LpmLookup}

/** SQL-surface registration of the graft function library (SURVEY §2.11
  * + §4): every formatter becomes a native Catalyst function callable
  * from `spark.sql(...)`, and `graft_lpm(ip, 'table')` exposes the LPM
  * expression against named, pre-registered prefix tables.
  *
  * Two injection paths:
  *  - [[GraftExtensions]] for sessions built with
  *    `.withExtensions(new GraftExtensions)` (config-driven deployments:
  *    `spark.sql.extensions=graft.functions.GraftExtensions`);
  *  - [[GraftFunctions.register]] for an existing session (the driver
  *    hands us one).
  *
  * Formatter functions are built by parsing the SAME SQL templates the
  * DataFrame API uses ([[Formatters]]) and grafting the call's argument
  * expression into the placeholder — one definition site, three surfaces
  * (Column API, SQL text, DuckDB oracle).
  */
object GraftFunctions {

  private val lpmTables = new ConcurrentHashMap[String, Lpm.Table]()
  private val lpm6Tables = new ConcurrentHashMap[String, Lpm.Table6]()

  /** Name a prefix table for `graft_lpm(ip, 'name')`. */
  def registerLpmTable(name: String, table: Lpm.Table): Unit =
    lpmTables.put(name, table)

  /** Name a v6 prefix table for `graft_lpm6(hi, lo, 'name')`. */
  def registerLpm6Table(name: String, table: Lpm.Table6): Unit =
    lpm6Tables.put(name, table)

  private val Arg0 = "__graft_arg0"

  private def fromTemplate(template: String): Seq[Expression] => Expression = {
    val parsed = CatalystSqlParser.parseExpression(template)
    args => parsed.transformUp {
      case a: UnresolvedAttribute if a.name == Arg0 => args.head
    }
  }

  private def lpmBuilder: Seq[Expression] => Expression = { args =>
    require(args.size == 2, "graft_lpm(ip, 'table_name')")
    val name = args(1) match {
      case e if e.foldable => String.valueOf(e.eval(null))
      case other =>
        throw new IllegalArgumentException(
          s"graft_lpm table name must be a literal, got $other")
    }
    val table = lpmTables.get(name)
    require(table != null, s"no LPM table registered under '$name'")
    LpmLookup(args.head, table)
  }

  private def lpm6Builder: Seq[Expression] => Expression = { args =>
    require(args.size == 3, "graft_lpm6(hi, lo, 'table_name')")
    val name = args(2) match {
      case e if e.foldable => String.valueOf(e.eval(null))
      case other =>
        throw new IllegalArgumentException(
          s"graft_lpm6 table name must be a literal, got $other")
    }
    val table = lpm6Tables.get(name)
    require(table != null, s"no v6 LPM table registered under '$name'")
    graft.plans.LpmLookup6(args(0), args(1), table)
  }

  private def misraGriesBuilder: Seq[Expression] => Expression = { args =>
    require(args.size == 2, "misra_gries(col, k)")
    val k = args(1) match {
      case e if e.foldable => String.valueOf(e.eval(null)).toInt
      case other =>
        throw new IllegalArgumentException(
          s"misra_gries k must be a literal, got $other")
    }
    graft.plans.MisraGriesAgg(args.head, k).toAggregateExpression()
  }

  private def qdigestBuilder: Seq[Expression] => Expression = { args =>
    require(args.size == 3 || args.size == 4,
      "qdigest_quantile(col, q, k[, bits])")
    def lit(e: Expression, what: String): String = e match {
      case x if x.foldable => String.valueOf(x.eval(null))
      case other => throw new IllegalArgumentException(
        s"qdigest_quantile $what must be a literal, got $other")
    }
    val bits =
      if (args.size == 4) lit(args(3), "bits").toInt else 20
    graft.plans.QDigestAgg(args.head,
      lit(args(1), "q").toDouble, lit(args(2), "k").toInt, bits)
      .toAggregateExpression()
  }

  private def tdigestBuilder: Seq[Expression] => Expression = { args =>
    require(args.size == 3, "tdigest_quantile(col, q, delta)")
    def lit(e: Expression, what: String): String = e match {
      case x if x.foldable => String.valueOf(x.eval(null))
      case other => throw new IllegalArgumentException(
        s"tdigest_quantile $what must be a literal, got $other")
    }
    graft.plans.TDigestAgg(args.head,
      lit(args(1), "q").toDouble, lit(args(2), "delta").toInt)
      .toAggregateExpression()
  }

  private def kmvBuilder: Seq[Expression] => Expression = { args =>
    require(args.size == 2, "kmv_sketch(col, k)")
    val k = args(1) match {
      case e if e.foldable => String.valueOf(e.eval(null)).toInt
      case other =>
        throw new IllegalArgumentException(
          s"kmv_sketch k must be a literal, got $other")
    }
    graft.plans.KmvAgg(args.head, k).toAggregateExpression()
  }

  private def hllBuilder: Seq[Expression] => Expression = { args =>
    require(args.size == 2, "hll_distinct(col, p)")
    val p = args(1) match {
      case e if e.foldable => String.valueOf(e.eval(null)).toInt
      case other =>
        throw new IllegalArgumentException(
          s"hll_distinct p must be a literal, got $other")
    }
    graft.plans.HllAgg(args.head, p).toAggregateExpression()
  }

  private def toksBuilder: Seq[Expression] => Expression = { args =>
    require(args.size == 1, "graft_toks(loweredText)")
    graft.plans.TokensAz09(args.head)
  }

  private def hash60Builder: Seq[Expression] => Expression = { args =>
    require(args.size == 1, "graft_hash60(token)")
    graft.plans.Hash60(args.head)
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case x if x.foldable => String.valueOf(x.eval(null)).toInt
    case other => throw new IllegalArgumentException(
      s"$what must be a literal, got $other")
  }

  private def argminL2Builder: Seq[Expression] => Expression = { args =>
    require(args.size == 2, "graft_argmin_l2(v, cb)")
    graft.plans.ArgminL2(args(0), args(1))
  }

  private def pqCodesBuilder: Seq[Expression] => Expression = { args =>
    require(args.size == 3, "graft_pq_codes(v, cb, sub)")
    graft.plans.PqCodes(args(0), args(1),
      litInt(args(2), "graft_pq_codes sub"))
  }

  private def opqCodesBuilder: Seq[Expression] => Expression = { args =>
    require(args.size == 3, "graft_opq_codes(v, cb, msub)")
    graft.plans.OpqCodes(args(0), args(1),
      litInt(args(2), "graft_opq_codes msub"))
  }

  /** (name, builder) for every injected function. */
  def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_toks" -> toksBuilder,
    "graft_hash60" -> hash60Builder,
    "graft_argmin_l2" -> argminL2Builder,
    "graft_pq_codes" -> pqCodesBuilder,
    "graft_opq_codes" -> opqCodesBuilder,
    "graft_proto_name" -> fromTemplate(Formatters.protoName(Arg0)),
    "graft_ip_ntoa" -> fromTemplate(Formatters.ipNtoa(Arg0)),
    "graft_tcpflags" -> fromTemplate(Formatters.tcpFlagsDecode(Arg0)),
    "graft_fwd_status" -> fromTemplate(Formatters.fwdStatus(Arg0)),
    "graft_ts_compose" -> fromTemplate(Formatters.tsCompose(Arg0)),
    "graft_mac" -> fromTemplate(Formatters.macFormat(Arg0)),
    "graft_lpm" -> lpmBuilder,
    "graft_lpm6" -> lpm6Builder,
    "misra_gries" -> misraGriesBuilder,
    "qdigest_quantile" -> qdigestBuilder,
    "tdigest_quantile" -> tdigestBuilder,
    "hll_distinct" -> hllBuilder,
    "kmv_sketch" -> kmvBuilder)

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit = {
    val reg = ColumnBridge.functionRegistry(spark)
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}

/** `spark.sql.extensions`-compatible injector. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name), b))
    }
}
