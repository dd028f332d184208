package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Parity gate for the r17 row-local assign rewrite in the PQ/k-means
  * lanes: the in-row higher-order argmin over a ONE-ROW broadcast
  * codebook array must select exactly the rows the former
  * join + min(struct(dist, cid)) aggregation selected — including the
  * (dist asc, cid asc) tie-break and the empty-subspace sentinel —
  * on a fixture engineered to contain exact distance TIES and on a
  * seeded random corpus.
  */
class RowLocalArgminSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val sub = 2 // dims per subspace; 4 dims => M = 2

  // the row-local form, exactly as the similarity lanes build it
  private val codesExpr =
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

  private def vecs(nv: Int, seed: Int): Seq[(Long, Seq[Long])] = {
    val r = new scala.util.Random(seed)
    (0L until nv).map(i => (i, Seq.fill(4)(r.nextInt(7).toLong - 3)))
  }

  test("row-local argmin == join + struct-min agg, ties included") {
    // centroid pairs deliberately EQUAL within subspaces so that many
    // vectors are equidistant to several cids — the tie-break is the
    // thing under test. Low-entropy coords (-3..3) force collisions.
    val n = vecs(200, 7).toDF("vec_id", "v")
    val cents = Seq(
      (0L, Seq(0L, 0L, 0L, 0L)),
      (1L, Seq(0L, 0L, 1L, -1L)),
      (2L, Seq(0L, 0L, 0L, 0L)), // duplicate of cid 0: every vector ties
      (3L, Seq(2L, -2L, 1L, -1L)))
    val longC = cents.toDF("cid", "cv")
      .selectExpr("cid", "posexplode(cv) AS (pos, cm)")
      .selectExpr(s"pos DIV $sub AS m", "cid", "pos", "cm")
    val longF = n.selectExpr("vec_id", "posexplode(v) AS (pos, x)")
      .withColumn("m", expr(s"pos DIV $sub"))
    // the former formulation (join + two-level agg with struct-min)
    val oldAsg = longF.join(broadcast(longC), Seq("m", "pos"))
      .groupBy("vec_id", "m", "cid")
      .agg(sum(expr("(x - cm) * (x - cm)")).as("dist"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("cid"))).as("mn"))
      .selectExpr("vec_id", "m", "mn.cid AS cid")
    // the r17 row-local formulation
    val cbArr = longC.groupBy("m", "cid")
      .agg(expr("transform(sort_array(collect_list(struct(pos, cm)))," +
        " e -> e.cm)").as("cms"))
      .groupBy()
      .agg(collect_list(struct(col("m"), col("cid"), col("cms")))
        .as("cb"))
    val newAsg = n.crossJoin(broadcast(cbArr))
      .selectExpr("vec_id", s"posexplode($codesExpr) AS (m, cid)")
    val old = oldAsg.as[(Long, Long, Long)].collect().toSet
    val neu = newAsg.as[(Long, Long, Long)].collect().toSet
    assert(neu == old, s"selection diverged: ${neu.diff(old)} vs " +
      s"${old.diff(neu)}")
    // every tie must resolve to the LOWEST cid: cid 2 duplicates cid 0,
    // so cid 2 must never be selected by either form
    assert(!neu.exists(_._3 == 2L), "tie-break picked the higher cid")
  }

  test("update step from in-row codes == join-back update") {
    val n = vecs(120, 11).toDF("vec_id", "v")
    val cents = Seq((0L, Seq(1L, 1L, -1L, -1L)),
      (1L, Seq(-1L, -1L, 1L, 1L)))
    val longC = cents.toDF("cid", "cv")
      .selectExpr("cid", "posexplode(cv) AS (pos, cm)")
      .selectExpr(s"pos DIV $sub AS m", "cid", "pos", "cm")
    val longF = n.selectExpr("vec_id", "posexplode(v) AS (pos, x)")
      .withColumn("m", expr(s"pos DIV $sub"))
    val oldAsg = longF.join(broadcast(longC), Seq("m", "pos"))
      .groupBy("vec_id", "m", "cid")
      .agg(sum(expr("(x - cm) * (x - cm)")).as("dist"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("cid"))).as("mn"))
      .selectExpr("vec_id", "m", "mn.cid AS cid")
    val oldUpd = oldAsg.join(longF, Seq("vec_id", "m"))
      .groupBy("m", "cid", "pos")
      .agg(sum("x").as("sx"), count(lit(1)).as("c"))
      .selectExpr("m", "cid", "pos",
        "(sx - ((sx % c) + c) % c) DIV c AS cm")
    val cbArr = longC.groupBy("m", "cid")
      .agg(expr("transform(sort_array(collect_list(struct(pos, cm)))," +
        " e -> e.cm)").as("cms"))
      .groupBy()
      .agg(collect_list(struct(col("m"), col("cid"), col("cms")))
        .as("cb"))
    val newUpd = n.crossJoin(broadcast(cbArr))
      .selectExpr("v", s"posexplode($codesExpr) AS (m, cid)")
      .selectExpr("m", "cid",
        s"posexplode(slice(v, m * $sub + 1, $sub)) AS (p, x)")
      .selectExpr("m", "cid", s"m * $sub + p AS pos", "x")
      .groupBy("m", "cid", "pos")
      .agg(sum("x").as("sx"), count(lit(1)).as("c"))
      .selectExpr("m", "cid", "pos",
        "(sx - ((sx % c) + c) % c) DIV c AS cm")
    val old = oldUpd.as[(Long, Long, Long, Long)].collect().toSet
    val neu = newUpd.as[(Long, Long, Long, Long)].collect().toSet
    assert(neu == old,
      s"update diverged: ${neu.diff(old)} vs ${old.diff(neu)}")
  }
}
