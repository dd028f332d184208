package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Longest-prefix-match lookup — the enrichment join pmacct does against the
  * networks_file table and the BGP RIB (`search_src_host`
  * src/net_aggr.c:895, `bgp_srcdst_lookup` src/bgp/bgp_lookup.c:33).
  *
  * Spark has no LPM operator, so this is the engine's first custom Catalyst
  * piece (SURVEY §4 "custom Catalyst inventory"). Two physical strategies:
  *
  *  1. [[LpmLookup]] — a native `Expression` holding the prefix table
  *    (per-mask-length hash maps, the same shape as pmacct's `maps_index`
  *    bitmap-hash). O(#distinct masks) per row, participates in whole-stage
  *    codegen via `doGenCode`, NO join and NO shuffle: at 100 TB the table
  *    ships once per executor inside the serialized plan, like a broadcast.
  *    Right whenever the prefix table fits in memory (networks_file and
  *    full-internet RIBs — ~1M prefixes ≈ tens of MB — both do).
  *
  *  2. [[Lpm.joinLongestMatch]] — chained broadcast LEFT joins, one per
  *    distinct mask length (longest first), coalesced first-match. Stays
  *    fully declarative (Catalyst sees ordinary joins) for when the dim
  *    must live as a table (e.g. time-versioned RIB in Delta). Also
  *    shuffle-free: every join side is broadcast.
  */
object Lpm {

  /** Immutable LPM table over a `width`-bit address space. */
  final class Table(val width: Int,
                    prefixes: Seq[(Long, Int, Long)]) extends Serializable {
    val lens: Array[Int] =
      prefixes.map(_._2).distinct.sorted(Ordering.Int.reverse).toArray
    private val maps: Array[java.util.HashMap[java.lang.Long, java.lang.Long]] =
      lens.map { len =>
        val m = new java.util.HashMap[java.lang.Long, java.lang.Long]()
        prefixes.filter(_._2 == len).foreach { case (base, _, v) =>
          m.put(mask(base, len), v)
        }
        m
      }
    private def mask(ip: Long, len: Int): Long = {
      val shift = width - len
      if (shift >= 64) 0L else (ip >>> shift) << shift
    }
    /** Longest-match value or Long.MinValue sentinel on miss. */
    def lookup(ip: Long): Long = {
      var i = 0
      while (i < lens.length) {
        val v = maps(i).get(mask(ip, lens(i)))
        if (v != null) return v.longValue()
        i += 1
      }
      Long.MinValue
    }
  }

  /** Column API: `lpm(col("ip_dst"), table)` → matched value or NULL. */
  def lpm(ip: Column, table: Table): Column =
    ColumnBridge.column(LpmLookup(ColumnBridge.expression(ip), table))

  /** Immutable 128-bit LPM table: prefixes as (hi, lo, len, value) with
    * the address as two big-endian 64-bit limbs — the same v6 walk
    * pmacct runs in `bgp_srcdst_lookup`/`bgp_node_match_ipv6`
    * (src/bgp/bgp_lookup.c). Per-mask-length hash maps over the masked
    * limb pair, probed longest-first. */
  final class Table6(prefixes: Seq[(Long, Long, Int, Long)])
      extends Serializable {
    val lens: Array[Int] =
      prefixes.map(_._3).distinct.sorted(Ordering.Int.reverse).toArray
    private val maps: Array[java.util.HashMap[(Long, Long), java.lang.Long]] =
      lens.map { len =>
        val m = new java.util.HashMap[(Long, Long), java.lang.Long]()
        prefixes.filter(_._3 == len).foreach { case (hi, lo, _, v) =>
          m.put(mask6(hi, lo, len), v)
        }
        m
      }
    private def mask6(hi: Long, lo: Long, len: Int): (Long, Long) =
      if (len <= 0) (0L, 0L)
      else if (len < 64) (((hi >>> (64 - len)) << (64 - len)), 0L)
      else if (len == 64) (hi, 0L)
      else if (len < 128) (hi, (lo >>> (128 - len)) << (128 - len))
      else (hi, lo)
    /** Longest-match value or Long.MinValue sentinel on miss. */
    def lookup(hi: Long, lo: Long): Long = {
      var i = 0
      while (i < lens.length) {
        val v = maps(i).get(mask6(hi, lo, lens(i)))
        if (v != null) return v.longValue()
        i += 1
      }
      Long.MinValue
    }
  }

  /** Column API over the two-limb v6 address: matched value or NULL. */
  def lpm6(hi: Column, lo: Column, table: Table6): Column =
    ColumnBridge.column(LpmLookup6(ColumnBridge.expression(hi),
      ColumnBridge.expression(lo), table))

  /** Strategy 2: longest-match via one broadcast LEFT join per distinct
    * mask length, coalesced longest-first. `dim` must have columns
    * (base, len); `valueCols` are the dim columns to carry over.
    */
  def joinLongestMatch(df: DataFrame, dim: DataFrame, ip: Column,
                       lens: Seq[Int], width: Int, valueCols: Seq[String],
                       out: String => String = identity): DataFrame = {
    val lensDesc = lens.sorted(Ordering.Int.reverse)
    val joined = lensDesc.foldLeft(df) { (acc, len) =>
      val d = dim.filter(col("len") === len)
        .select(col("base") +: valueCols.map(c =>
          col(c).as(s"__${c}_$len")): _*)
      val shift = width - len
      val masked = if (shift >= 64) lit(0L)
        else shiftleft(shiftright(ip, shift), shift)
      acc.join(broadcast(d), masked === col("base"), "left").drop("base")
    }
    valueCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(out(c),
        coalesce(lensDesc.map(l => col(s"__${c}_$l")): _*))
    }.drop(valueCols.flatMap(c => lensDesc.map(l => s"__${c}_$l")): _*)
  }
}

/** Native LPM expression: `child` (LongType ip) → longest-match value, NULL
  * on miss. The table rides inside the plan (one copy per executor), and
  * `doGenCode` keeps the lookup inside whole-stage codegen.
  */
case class LpmLookup(child: Expression, table: Lpm.Table)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "lpm_lookup"
  // analyzer casts narrower integral SQL literals/columns up to long
  // (type inferred: AbstractDataType is private[sql])
  override def inputTypes = Seq(LongType)

  protected override def nullSafeEval(ip: Any): Any = {
    val r = table.lookup(ip.asInstanceOf[Long])
    if (r == Long.MinValue) null else r
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("lpmTable", table,
      classOf[Lpm.Table].getName)
    // fresh local per expression instance — two lookups fused into one
    // whole-stage-codegen scope must not collide on the variable name
    val r = ctx.freshName("lpmR")
    nullSafeCodeGen(ctx, ev, ip => s"""
      long $r = $tableRef.lookup($ip);
      if ($r == Long.MIN_VALUE) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $r;
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): LpmLookup =
    copy(child = newChild)
}

/** Native 128-bit LPM expression over (hi, lo) limb columns — same
  * plan-resident-table design as [[LpmLookup]], codegen'd. */
case class LpmLookup6(left: Expression, right: Expression,
    table: Lpm.Table6)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "lpm_lookup6"
  override def inputTypes = Seq(LongType, LongType)

  protected override def nullSafeEval(hi: Any, lo: Any): Any = {
    val r = table.lookup(hi.asInstanceOf[Long], lo.asInstanceOf[Long])
    if (r == Long.MinValue) null else r
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("lpm6Table", table,
      classOf[Lpm.Table6].getName)
    val r = ctx.freshName("lpm6R")
    nullSafeCodeGen(ctx, ev, (hi, lo) => s"""
      long $r = $tableRef.lookup($hi, $lo);
      if ($r == Long.MIN_VALUE) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $r;
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LpmLookup6 =
    copy(left = newLeft, right = newRight)
}
