package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SQ8 scalar-quantization semantics: code math, degenerate dims,
  * bounds round-trip through table properties, append-without-retrain
  * clamping, recall against the exact baseline, and the plan shape. */
class SqSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")

  private def qv: Seq[Double] = emb.filter(col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0).map(_.toDouble)

  test("codes: explicit half-up against trained bounds; extremes hit 0/255") {
    val df = Seq(
      (1L, Array(0.0f, -2.0f)),
      (2L, Array(10.0f, 2.0f)),
      (3L, Array(5.0f, 0.0f))).toDF("vec_id", "embedding")
    val b = Sq.trainBounds(df)
    assert(b.mins == Seq(0.0, -2.0) && b.maxs == Seq(10.0, 2.0))
    val got = Sq.encode(df, b).orderBy("vec_id")
      .select("codes").as[Seq[Int]].collect().toSeq
    // dim0: (0,10) -> 0, 255, floor(5/10*255+.5)=128; dim1: (-2,2) -> 0, 255, 128
    assert(got == Seq(Seq(0, 0), Seq(255, 255), Seq(128, 128)))
  }

  test("degenerate dim (max == min) codes 0 and reconstructs its constant") {
    val df = Seq((1L, Array(7.0f, 1.0f)), (2L, Array(7.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val b = Sq.trainBounds(df)
    val codes = Sq.encode(df, b)
    assert(codes.orderBy("vec_id").select("codes").as[Seq[Int]]
      .collect().toSeq.map(_.head) == Seq(0, 0))
    // search must not NaN on the constant dim
    val got = Sq.sqTopK(codes, b, Seq(7.0, 1.0), 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
  }

  test("bounds survive the table-property round-trip byte-for-byte") {
    val t = Sq.build(emb, scratch("sq_rt"))
    val cold = graft.tables.GraftTable.load(spark, t.path)
    assert(Sq.bounds(cold) == Sq.trainBounds(emb))
  }

  test("quantized top-10 recalls >= 9/10 of the exact baseline; rerank recovers it fully") {
    val exact = VectorOps.cosineTopK(emb, qv, 10)
      .select("vec_id").as[Long].collect().toSet
    val t = Sq.build(emb, scratch("sq_recall"))
    val approx = Sq.topK(t, qv, 10).select("vec_id").as[Long].collect().toSet
    assert((exact & approx).size >= 9,
      s"SQ8 should barely perturb a 64-d cosine ordering: ${(exact & approx).size}/10")
    val reranked = Sq.topKRerank(t, emb, qv, 10, fetch = 50)
      .select("vec_id").as[Long].collect().toSet
    assert(reranked == exact, "exact rerank over the shortlist must recover the baseline")
  }

  test("append encodes under STORED bounds and clamps out-of-range values") {
    val t = Sq.build(emb, scratch("sq_append"))
    val b = Sq.bounds(t)
    val wild = Seq((900001L,
      Array.fill(b.dims)(1e6f))).toDF("vec_id", "embedding")
    Sq.append(t, wild)
    val codes = t.read().filter(col("vec_id") === 900001L)
      .select("codes").as[Seq[Int]].head()
    assert(codes.forall(_ == 255), "out-of-range appends clamp at the extremes")
    // and the stored bounds did NOT move (no silent retrain)
    assert(Sq.bounds(graft.tables.GraftTable.load(spark, t.path)) == b)
  }

  test("reconstruction error is bounded by half a code step per dimension") {
    val b = Sq.trainBounds(emb)
    val codes = Sq.encode(emb, b)
    // join codes back to vectors and check |recon - x| <= width/510 + eps
    val withVec = emb.join(codes, Seq("vec_id"))
    val rows = withVec.limit(200).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](r.fieldIndex("embedding"))
      val cs = r.getSeq[Int](r.fieldIndex("codes"))
      v.indices.foreach { j =>
        val (mn, mx) = (b.mins(j), b.maxs(j))
        val recon =
          if (mx > mn) mn + cs(j) / 255.0 * (mx - mn) else mn
        val bound = if (mx > mn) (mx - mn) / 510.0 + 1e-9 else 1e-9
        assert(math.abs(recon - v(j)) <= bound,
          s"dim $j: |$recon - ${v(j)}| > $bound")
      }
    }
  }

  test("encode and search are zero-shuffle projections; top-k is TakeOrdered") {
    val b = Sq.trainBounds(emb)
    val pe = Sq.encode(emb, b).queryExecution.executedPlan.toString
    assert(!pe.contains("Exchange"), s"encode must not shuffle:\n$pe")
    val df = Sq.sqTopK(Sq.encode(emb, b), b, qv, 10)
    df.collect()
    val ps = df.queryExecution.executedPlan.toString
    assert(ps.contains("TakeOrderedAndProject"), s"top-k must not sort:\n$ps")
    assert(!ps.contains("Exchange rangepartitioning"), s"no global sort:\n$ps")
  }
}
