package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** ClusterSample semantics: per-cell quota, centrality ordering on
  * planted clusters, determinism across runs, zero-norm safety. */
class ClusterSampleSpec extends SparkTestBase {
  import spark.implicits._

  /** Two well-separated planted clusters in 4-d: ids 0..9 hug (1,0,0,0),
    * ids 10..19 hug (0,1,0,0); within each, vector (base + i) drifts
    * further from the cluster center as i grows. */
  private def planted = (0 until 20).map { i =>
    val drift = 0.02f * (i % 10)
    if (i < 10) (i.toLong, Seq(1f, drift, 0f, 0f))
    else (i.toLong, Seq(drift, 1f, 0f, 0f))
  }.toDF("vec_id", "embedding")

  test("per-cell quota is ceil(fraction * n_cell), most-central first") {
    val got = ClusterSample.clusterBalancedSample(planted, k = 2, fraction = 0.3)
      .orderBy("cell", "rank_in_cell")
      .select("vec_id", "cell", "n_cell", "rank_in_cell")
      .as[(Long, Int, Long, Int)].collect().toSeq
    // two cells of 10 → ceil(3) = 3 reps each, ranks 1..3
    assert(got.map(_._2).distinct.size == 2)
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct == Seq(10L))
      assert(rows.map(_._4).sorted == Seq(1, 2, 3))
    }
    // cluster membership respected: ids 0-9 share a cell, 10-19 the other
    val cellOf = got.map(r => r._1 -> r._2).toMap
    assert(got.filter(_._1 < 10).map(_._2).distinct.size == 1)
    assert(got.filter(_._1 >= 10).map(_._2).distinct.size == 1)
    assert(cellOf.keys.exists(_ < 10) && cellOf.keys.exists(_ >= 10))
  }

  test("centrality rank 1 is the vector closest to its centroid") {
    val rows = ClusterSample.clusterBalancedSample(planted, k = 2, fraction = 1.0)
      .select("vec_id", "cell", "rank_in_cell", "centroid_sim")
      .as[(Long, Int, Int, Double)].collect().toSeq
    rows.groupBy(_._2).foreach { case (_, cellRows) =>
      val byRank = cellRows.sortBy(_._3)
      assert(byRank.map(_._4) == byRank.map(_._4).sorted.reverse,
        "centroid_sim must be non-increasing in rank")
    }
  }

  test("fraction = 1.0 keeps every row; sample is deterministic across runs") {
    val a = ClusterSample.clusterBalancedSample(planted, k = 2, fraction = 1.0)
    assert(a.count() == 20)
    val b = ClusterSample.clusterBalancedSample(planted, k = 2, fraction = 0.3)
      .orderBy("cell", "rank_in_cell").collect().toSeq
    val c = ClusterSample.clusterBalancedSample(planted, k = 2, fraction = 0.3)
      .orderBy("cell", "rank_in_cell").collect().toSeq
    assert(b == c)
  }

  test("zero-norm vectors score 0 and never produce NaN") {
    val withZero = planted.unionAll(
      Seq((99L, Seq(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding"))
    val got = ClusterSample.clusterBalancedSample(withZero, k = 2, fraction = 1.0)
      .select("vec_id", "centroid_sim").as[(Long, Double)].collect().toMap
    assert(got.size == 21)
    assert(!got.values.exists(_.isNaN))
    assert(math.abs(got(99L)) < 1e-9)
  }

  test("invalid fraction is rejected") {
    intercept[IllegalArgumentException](
      ClusterSample.clusterBalancedSample(planted, k = 2, fraction = 0.0))
    intercept[IllegalArgumentException](
      ClusterSample.clusterBalancedSample(planted, k = 2, fraction = 1.5))
  }
}
