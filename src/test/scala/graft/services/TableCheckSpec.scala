package graft.services

import graft.SparkTestBase

/** Constraint-suite semantics on hand-computed tables: metric math per
  * check kind, the non-null range denominator, threshold verdicts, and
  * degenerate inputs. */
class TableCheckSpec extends SparkTestBase {
  import spark.implicits._
  import TableCheck._

  private val df = Seq(
    (1L, Some(10.0), "a"),
    (2L, Some(20.0), "a"),
    (3L, None, "b"),
    (4L, Some(999.0), "c")).toDF("id", "v", "k")

  private def metrics(checks: Seq[Check]) =
    report(df, checks).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getBoolean(4))).toMap

  test("completeness, uniqueness, range: metrics and verdicts") {
    val m = metrics(Seq(
      Completeness("id"), Completeness("v", 0.9),
      Uniqueness("id"), Uniqueness("k", 0.9),
      InRange("v", 0.0, 100.0, 0.5)))
    assert(m(("completeness", "id")) == ((1.0, true)))
    assert(m(("completeness", "v")) == ((0.75, false)))
    assert(m(("uniqueness", "id")) == ((1.0, true)))
    assert(m(("uniqueness", "k"))._1 == 0.75)
    assert(!m(("uniqueness", "k"))._2)
    // range denominator is NON-NULL values: 2 of 3 in [0,100]
    assert(m(("in_range", "v")) == ((0.666667, true)))
  }

  test("containment against a dimension; missing keys fail the ratio") {
    val dim = Seq("a", "b").toDF("kk")
    val m = metrics(Seq(Containment("k", dim, "kk", 0.8)))
    // 3 of 4 values ('a','a','b') contained; 'c' is not
    assert(m(("containment", "k")) == ((0.75, false)))
    val ok = metrics(Seq(Containment("k", dim, "kk", 0.7)))
    assert(ok(("containment", "k"))._2)
  }

  test("empty table: every ratio reads 1.0 (vacuously conformant)") {
    val empty = df.filter("id < 0")
    val got = report(empty, Seq(Completeness("id"), Uniqueness("id")))
      .collect()
    got.foreach(r => assert(r.getDouble(2) == 1.0 && r.getBoolean(4)))
  }

  test("range check without a paired completeness check divides by row count") {
    val m = metrics(Seq(InRange("v", 0.0, 100.0, 0.4)))
    // no Completeness("v") in the suite -> denominator is n=4: 2/4
    assert(m(("in_range", "v")) == ((0.5, true)))
  }
}
