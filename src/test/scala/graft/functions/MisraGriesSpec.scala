package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MisraGriesSpec extends SparkTestBase {
  import org.scalatest.matchers.should.Matchers._

  test("heavy hitters survive eviction under capacity pressure") {
    // 40 distinct items but capacity 8: MG must evict, yet every item
    // with freq > N/(capacity+1) is guaranteed to remain a candidate.
    import spark.implicits._
    val rows = (1 to 2000).map(_ => "hot") ++
      (1 to 800).map(_ => "warm") ++
      (1 to 38).flatMap(i => (1 to 20).map(_ => s"cold$i"))
    val df = rows.toDF("w").repartition(7) // force partial+merge path
    val n = rows.size
    val mg = udaf(new MisraGries(8))
    val summary = df.agg(mg(col("w"))).head().getMap[String, Long](0)
    summary.size should be <= 8
    val floor = n / 9.0
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong)
    exact.filter(_._2 > floor).keys.foreach { k =>
      assert(summary.contains(k), s"guaranteed heavy hitter $k evicted")
    }
    // kept counts under-estimate by at most N/(capacity+1)
    summary.foreach { case (k, est) =>
      val truth = exact.getOrElse(k, 0L)
      assert(est <= truth, s"$k over-counted: $est > $truth")
      assert(truth - est <= floor + 1, s"$k under-counted past the bound")
    }
  }

  test("merge of partial summaries equals a bigger single-pass summary's guarantee") {
    val agg = new MisraGries(4)
    val a = "x x x y y z".split(" ").foldLeft(agg.zero)(agg.reduce)
    val b = "x w w w v".split(" ").foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(a, b)
    m.size should be <= 4
    // x has true count 4 of 11 > 11/5: must survive any merge order
    assert(m.contains("x"))
    assert(agg.merge(b, a).contains("x"))
  }

  test("capacity at or above vocabulary keeps exact counts") {
    val agg = new MisraGries(10)
    val s = "a a a b b c".split(" ").foldLeft(agg.zero)(agg.reduce)
    assert(s === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }
}
