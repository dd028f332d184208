package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Parity gate for the r18 native PQ argmin kernels: graft_argmin_l2 /
  * graft_pq_codes / graft_opq_codes must select exactly what the r17
  * higher-order-function spellings selected — including the (dist asc,
  * cid asc) tie-break and the empty-subspace Long.MaxValue sentinel —
  * on a fixture engineered with exact distance TIES (a duplicated
  * centroid) and on a seeded low-entropy random corpus, plus null
  * propagation.
  */
class PqKernelsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val sub = 2 // dims per subspace; 4 dims => M = 2

  // the r17 HOF spelling, verbatim from the similarity lanes
  private val hofCodes =
    s"""transform(sequence(0, ${4 / sub - 1}), mm ->
       aggregate(
         transform(filter(cb, e -> e.m = mm), e -> named_struct(
           'd', aggregate(zip_with(
                  slice(v, mm * $sub + 1, $sub), e.cms,
                  (a, b) -> (a - b) * (a - b)),
                CAST(0 AS BIGINT), (s, z) -> s + z),
           'c', e.cid)),
         named_struct(
           'bd', CAST(9223372036854775807 AS BIGINT),
           'bc', CAST(9223372036854775807 AS BIGINT)),
         (acc, p) -> CASE WHEN p.d < acc.bd
             OR (p.d = acc.bd AND p.c < acc.bc)
           THEN named_struct('bd', p.d, 'bc', p.c)
           ELSE acc END).bc)"""

  private val hofBest =
    """aggregate(
       transform(cb, e -> named_struct(
         'd', aggregate(zip_with(v, e.cv,
                (a, b) -> (a - b) * (a - b)),
              CAST(0 AS BIGINT), (s, z) -> s + z),
         'c', e.cid)),
       named_struct(
         'bd', CAST(9223372036854775807 AS BIGINT),
         'bc', CAST(9223372036854775807 AS BIGINT)),
       (acc, p) -> CASE WHEN p.d < acc.bd
           OR (p.d = acc.bd AND p.c < acc.bc)
         THEN named_struct('bd', p.d, 'bc', p.c)
         ELSE acc END)"""

  private val hofOpq =
    s"""transform(sequence(0, ${4 / sub - 1}), mm ->
       aggregate(
         transform(filter(cb, e -> e.m = mm), e -> named_struct(
           'd', aggregate(e.pcs, CAST(0 AS BIGINT), (s, pc) ->
             s + (element_at(v, CAST(pc.pos + 1 AS INT)) - pc.cm)
               * (element_at(v, CAST(pc.pos + 1 AS INT)) - pc.cm)),
           'c', e.cid)),
         named_struct(
           'bd', CAST(9223372036854775807 AS BIGINT),
           'bc', CAST(9223372036854775807 AS BIGINT)),
         (acc, p) -> CASE WHEN p.d < acc.bd
             OR (p.d = acc.bd AND p.c < acc.bc)
           THEN named_struct('bd', p.d, 'bc', p.c)
           ELSE acc END).bc)"""

  private def vecs(nv: Int, seed: Int): Seq[(Long, Seq[Long])] = {
    val r = new scala.util.Random(seed)
    (0L until nv).map(i => (i, Seq.fill(4)(r.nextInt(7).toLong - 3)))
  }

  // centroids engineered so cid 2 EXACTLY duplicates cid 0: every
  // vector ties between them and the tie-break is the thing under test
  private val cents = Seq(
    (0L, Seq(0L, 0L, 0L, 0L)),
    (1L, Seq(0L, 0L, 1L, -1L)),
    (2L, Seq(0L, 0L, 0L, 0L)),
    (3L, Seq(2L, -2L, 1L, -1L)))

  private def pqCb = {
    val longC = cents.toDF("cid", "cv")
      .selectExpr("cid", "posexplode(cv) AS (pos, cm)")
      .selectExpr(s"pos DIV $sub AS m", "cid", "pos", "cm")
    longC.groupBy("m", "cid")
      .agg(expr("transform(sort_array(collect_list(struct(pos, cm)))," +
        " e -> e.cm)").as("cms"))
      .groupBy()
      .agg(collect_list(struct(col("m"), col("cid"), col("cms")))
        .as("cb"))
  }

  test("graft_pq_codes == HOF per-subspace argmin, ties included") {
    val n = vecs(300, 7).toDF("vec_id", "v")
    val both = n.crossJoin(broadcast(pqCb))
      .selectExpr("vec_id", s"($hofCodes) AS oldc",
        s"graft_pq_codes(v, cb, $sub) AS newc")
    val rows = both.as[(Long, Seq[Long], Seq[Long])].collect()
    rows.foreach { case (id, o, nw) =>
      assert(o == nw, s"vec $id diverged: $o vs $nw")
    }
    // ties resolve to the LOWEST cid: cid 2 never selected
    assert(!rows.exists(_._3.contains(2L)), "tie picked higher cid")
  }

  test("graft_pq_codes: empty-subspace sentinel matches HOF") {
    // codebook covering subspace 0 only -> subspace 1 yields MaxValue
    val longC = cents.take(2).toDF("cid", "cv")
      .selectExpr("cid", "posexplode(cv) AS (pos, cm)")
      .selectExpr(s"pos DIV $sub AS m", "cid", "pos", "cm")
      .where("m = 0")
    val cb0 = longC.groupBy("m", "cid")
      .agg(expr("transform(sort_array(collect_list(struct(pos, cm)))," +
        " e -> e.cm)").as("cms"))
      .groupBy()
      .agg(collect_list(struct(col("m"), col("cid"), col("cms")))
        .as("cb"))
    val r = vecs(20, 3).toDF("vec_id", "v").crossJoin(broadcast(cb0))
      .selectExpr(s"($hofCodes) AS oldc",
        s"graft_pq_codes(v, cb, $sub) AS newc")
      .as[(Seq[Long], Seq[Long])].collect()
    r.foreach { case (o, nw) =>
      assert(o == nw && nw(1) == Long.MaxValue)
    }
  }

  test("graft_argmin_l2 == HOF full-vector argmin (bd and bc)") {
    val n = vecs(300, 13).toDF("vec_id", "v")
    val cb = cents.toDF("cid", "cv").groupBy()
      .agg(collect_list(struct(col("cid"), col("cv"))).as("cb"))
    val rows = n.crossJoin(broadcast(cb))
      .selectExpr("vec_id", s"($hofBest).bd AS obd", s"($hofBest).bc AS obc",
        "graft_argmin_l2(v, cb).bd AS nbd",
        "graft_argmin_l2(v, cb).bc AS nbc")
      .as[(Long, Long, Long, Long, Long)].collect()
    rows.foreach { case (id, obd, obc, nbd, nbc) =>
      assert(obd == nbd && obc == nbc, s"vec $id: ($obd,$obc) vs ($nbd,$nbc)")
    }
    assert(!rows.exists(_._5 == 2L), "tie picked higher cid")
  }

  test("graft_opq_codes == HOF position-carrying argmin") {
    // scatter the dims: permutation pos -> m = pos % 2 (interleaved,
    // NOT contiguous), exactly the q343 shape
    val longC = cents.toDF("cid", "cv")
      .selectExpr("cid", "posexplode(cv) AS (pos, cm)")
      .selectExpr("pos % 2 AS m", "cid", "pos", "cm")
    val cb = longC.groupBy("m", "cid")
      .agg(expr("sort_array(collect_list(struct(pos, cm)))").as("pcs"))
      .groupBy()
      .agg(collect_list(struct(col("m").cast("long").as("m"),
        col("cid"), col("pcs"))).as("cb"))
    val rows = vecs(300, 29).toDF("vec_id", "v").crossJoin(broadcast(cb))
      .selectExpr("vec_id", s"($hofOpq) AS oldc",
        s"graft_opq_codes(v, cb, ${4 / sub}) AS newc")
      .as[(Long, Seq[Long], Seq[Long])].collect()
    rows.foreach { case (id, o, nw) =>
      assert(o == nw, s"vec $id diverged: $o vs $nw")
    }
    assert(!rows.exists(_._3.contains(2L)), "tie picked higher cid")
  }

  test("PlanAudit BNLJ pin: global-agg build passes, corpus build flags") {
    // the pinned shape: crossJoin of a ONE-ROW global collect_list agg
    val n = vecs(50, 5).toDF("vec_id", "v")
    val good = n.crossJoin(broadcast(pqCb))
    val goodB = PlanAudit.bnljNodes(good.queryExecution.executedPlan)
    assert(goodB.nonEmpty, "expected a BNLJ in the crossJoin plan")
    assert(goodB.forall(b => PlanAudit.isModelBuild(
      b.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
        case _ => b.right
      })), "one-row global-agg build must satisfy the pin")
    // the shape the pin must CATCH: a nested loop whose build side is
    // a raw (non-aggregated) frame — a corpus-sized build at scale
    val bad = n.crossJoin(broadcast(spark.range(3).toDF("cid")))
    val badB = PlanAudit.bnljNodes(bad.queryExecution.executedPlan)
    assert(badB.nonEmpty, "expected a BNLJ in the bad plan")
    assert(badB.exists(b => !PlanAudit.isModelBuild(
      b.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
        case _ => b.right
      })), "non-aggregate build must NOT satisfy the pin")
  }

  test("null vector/codebook propagates null") {
    val r = Seq((1L)).toDF("vec_id")
      .selectExpr("CAST(NULL AS ARRAY<BIGINT>) AS v")
      .crossJoin(broadcast(pqCb))
      .selectExpr(s"graft_pq_codes(v, cb, $sub) AS c",
        "graft_argmin_l2(v, cb) AS a")
      .collect()
    assert(r.head.isNullAt(0) && r.head.isNullAt(1))
  }
}
