package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native argmin kernels for the PQ / k-means assign family
  * (optimization r18, VERDICT r17 #1b/#5).
  *
  * The r17 row-local rewrite removed the corpus×M×K join intermediates
  * by collapsing each codebook to a ONE-ROW broadcast array and running
  * the (dist asc, cid asc) argmin inside each vector's row as a
  * higher-order expression. That was the right 100 TB shape, but the
  * replacement was a ~200-node interpreted HOF tree
  * (`aggregate(transform(filter(cb, …), …), …)` — CodegenFallback),
  * instantiated 2-4× per lane: the driver's cold-JVM protocol billed
  * its parse/analyze/optimize/first-eval cost every run and the
  * q331/q335/q339/q343 lanes regressed 13-22 %.
  *
  * These kernels compute the IDENTICAL selection as one compact
  * codegen-friendly Catalyst expression each (a single static-call
  * node, like [[TextKernels]]):
  *
  *  - [[ArgminL2]] `graft_argmin_l2(v, cb)` — cb is
  *    `array<struct<cid: bigint, cv: array<bigint>>>`; returns
  *    `struct<bd: bigint, bc: bigint>`: the minimal exact-integer
  *    squared-L2 distance over the entries and the entry id selecting
  *    it, ties broken by lower id. Init is (Long.MaxValue,
  *    Long.MaxValue), exactly the HOF accumulator.
  *  - [[PqCodes]] `graft_pq_codes(v, cb, sub)` — cb is
  *    `array<struct<m: bigint, cid: bigint, cms: array<bigint>>>`
  *    with pos-ordered centroid slices of length `sub`; returns
  *    `array<bigint>` of the per-subspace argmin cids for
  *    mm = 0 .. len(v)/sub - 1, distance over the contiguous slice
  *    v[mm*sub .. mm*sub+sub).
  *  - [[OpqCodes]] `graft_opq_codes(v, cb, msub)` — the q343 OPQ
  *    variant: entries carry POSITION-CARRYING centroids
  *    `pcs: array<struct<pos: int, cm: bigint>>` because the learned
  *    permutation scatters a subspace's dims across v; distance
  *    gathers v[pos] per carried position.
  *
  * Parity with the HOF spelling is exact, including the null/shape
  * edge semantics the lambda forms imply: a codebook entry whose
  * centroid array mismatches the slice length (zip_with null-pads →
  * null distance), contains a null cell, or gathers an out-of-range
  * position contributes a NULL distance in the HOF form, and
  * `CASE WHEN null THEN … ELSE acc` keeps the accumulator — here such
  * entries are skipped, which is the same outcome. A subspace with no
  * entries returns the init bc (Long.MaxValue) in both spellings.
  * Proven cell-for-cell by PqKernelsSpec on engineered exact ties plus
  * a seeded random corpus, and end-to-end by the 343-query oracle.
  */
object PqKernels {

  /** (bd, bc) argmin over full-vector codebook entries. */
  def argminL2(v: ArrayData, cb: ArrayData): InternalRow = {
    val nv = v.numElements()
    var bd = Long.MaxValue
    var bc = Long.MaxValue
    val ncb = cb.numElements()
    var i = 0
    while (i < ncb) {
      if (!cb.isNullAt(i)) {
        val e = cb.getStruct(i, 2)
        if (!e.isNullAt(0) && !e.isNullAt(1)) {
          val cid = e.getLong(0)
          val cv = e.getArray(1)
          if (cv.numElements() == nv) {
            var d = 0L
            var ok = true
            var j = 0
            while (ok && j < nv) {
              if (v.isNullAt(j) || cv.isNullAt(j)) ok = false
              else {
                val diff = v.getLong(j) - cv.getLong(j)
                d += diff * diff
              }
              j += 1
            }
            if (ok && (d < bd || (d == bd && cid < bc))) {
              bd = d; bc = cid
            }
          }
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](bd, bc))
  }

  /** Per-subspace argmin cids, contiguous-slice centroids. */
  def pqCodes(v: ArrayData, cb: ArrayData, sub: Int): GenericArrayData = {
    val nv = v.numElements()
    val nSub = nv / sub
    val ncb = cb.numElements()
    val out = new Array[Any](nSub)
    var mm = 0
    while (mm < nSub) {
      var bd = Long.MaxValue
      var bc = Long.MaxValue
      val off = mm * sub
      var i = 0
      while (i < ncb) {
        if (!cb.isNullAt(i)) {
          val e = cb.getStruct(i, 3)
          if (!e.isNullAt(0) && e.getLong(0) == mm && !e.isNullAt(1) &&
              !e.isNullAt(2)) {
            val cid = e.getLong(1)
            val cms = e.getArray(2)
            if (cms.numElements() == sub) {
              var d = 0L
              var ok = true
              var j = 0
              while (ok && j < sub) {
                if (v.isNullAt(off + j) || cms.isNullAt(j)) ok = false
                else {
                  val diff = v.getLong(off + j) - cms.getLong(j)
                  d += diff * diff
                }
                j += 1
              }
              if (ok && (d < bd || (d == bd && cid < bc))) {
                bd = d; bc = cid
              }
            }
          }
        }
        i += 1
      }
      out(mm) = bc
      mm += 1
    }
    new GenericArrayData(out)
  }

  /** Per-subspace argmin cids, position-carrying centroids (OPQ). */
  def opqCodes(v: ArrayData, cb: ArrayData, msub: Int): GenericArrayData = {
    val nv = v.numElements()
    val ncb = cb.numElements()
    val out = new Array[Any](msub)
    var mm = 0
    while (mm < msub) {
      var bd = Long.MaxValue
      var bc = Long.MaxValue
      var i = 0
      while (i < ncb) {
        if (!cb.isNullAt(i)) {
          val e = cb.getStruct(i, 3)
          if (!e.isNullAt(0) && e.getLong(0) == mm && !e.isNullAt(1) &&
              !e.isNullAt(2)) {
            val cid = e.getLong(1)
            val pcs = e.getArray(2)
            val np = pcs.numElements()
            var d = 0L
            var ok = true
            var j = 0
            while (ok && j < np) {
              if (pcs.isNullAt(j)) ok = false
              else {
                val pc = pcs.getStruct(j, 2)
                if (pc.isNullAt(0) || pc.isNullAt(1)) ok = false
                else {
                  val pos = pc.getInt(0)
                  if (pos < 0 || pos >= nv || v.isNullAt(pos)) ok = false
                  else {
                    val diff = v.getLong(pos) - pc.getLong(1)
                    d += diff * diff
                  }
                }
              }
              j += 1
            }
            if (ok && (d < bd || (d == bd && cid < bc))) {
              bd = d; bc = cid
            }
          }
        }
        i += 1
      }
      out(mm) = bc
      mm += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_argmin_l2(v, cb)` — see [[PqKernels.argminL2]]. */
case class ArgminL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("bd", LongType, nullable = false),
    StructField("bc", LongType, nullable = false)))
  override def prettyName: String = "graft_argmin_l2"

  protected override def nullSafeEval(v: Any, cb: Any): Any =
    PqKernels.argminL2(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, cb) =>
      s"graft.plans.PqKernels.argminL2($v, $cb)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgminL2 =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_codes(v, cb, sub)` — see [[PqKernels.pqCodes]]. */
case class PqCodes(left: Expression, right: Expression, sub: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  protected override def nullSafeEval(v: Any, cb: Any): Any =
    PqKernels.pqCodes(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      sub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, cb) =>
      s"graft.plans.PqKernels.pqCodes($v, $cb, $sub)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCodes =
    copy(left = newLeft, right = newRight)
}

/** `graft_opq_codes(v, cb, msub)` — see [[PqKernels.opqCodes]]. */
case class OpqCodes(left: Expression, right: Expression, msub: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_opq_codes"

  protected override def nullSafeEval(v: Any, cb: Any): Any =
    PqKernels.opqCodes(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      msub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, cb) =>
      s"graft.plans.PqKernels.opqCodes($v, $cb, $msub)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): OpqCodes =
    copy(left = newLeft, right = newRight)
}
