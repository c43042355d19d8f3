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

  test("range denominator is the column's own non-null count, whatever " +
      "else is in the suite") {
    // an InRange-ONLY suite must read the same metric as one that happens
    // to also carry a Completeness check for the column: 2 of 3 NON-NULL
    // values in [0,100] — never 2/4 with the NULL in the denominator
    // (review finding: a check's metric is a function of the data, not of
    // suite composition)
    val alone = metrics(Seq(InRange("v", 0.0, 100.0, 0.5)))
    assert(alone(("in_range", "v")) == ((0.666667, true)))
    val paired = metrics(Seq(Completeness("v", 0.9), InRange("v", 0.0, 100.0, 0.5)))
    assert(paired(("in_range", "v"))._1 == alone(("in_range", "v"))._1)
  }

  test("range check over an all-null column reads vacuously conformant") {
    val m = metrics(Seq(InRange("v", 0.0, 100.0, 0.5)))
    assert(m(("in_range", "v"))._1 == 0.666667)
    val allNull = df.withColumn("v",
      org.apache.spark.sql.functions.lit(null).cast("double"))
    val got = report(allNull, Seq(InRange("v", 0.0, 100.0, 0.5))).collect()
    assert(got.head.getDouble(2) == 1.0 && got.head.getBoolean(4))
  }
}
