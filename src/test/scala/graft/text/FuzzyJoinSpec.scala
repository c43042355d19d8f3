package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** FuzzyJoin must equal the naive all-pairs levenshtein join — the
  * segment filter is a candidate generator, never a result filter. */
class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (i1, s1) <- rows; (i2, s2) <- rows
      if i1 < i2
      e = ed(s1, s2) if e <= k
    } yield (i1, i2, e.toLong)).toSet
  }

  private def run(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] =
    FuzzyJoin.selfPairs(rows.toDF("doc_id", "s"), k)
      .as[(Long, Long, Long)].collect().toSet

  test("equals naive all-pairs on mixed edits (sub, insert, delete)") {
    val rows = Seq[(Long, String)](
      (1L, "hello world"), (2L, "hellp world"), (3L, "hello wrld"),
      (4L, "help word"), (5L, "completely different"), (6L, "hello world!"),
      (7L, "ello world"), (8L, "hxllo wyrld"))
    for (k <- 1 to 3)
      assert(run(rows, k) == naive(rows, k), s"k=$k mismatch")
  }

  test("short strings (len <= k) still pair correctly") {
    val rows = Seq[(Long, String)](
      (1L, "ab"), (2L, "a"), (3L, "b"), (4L, "abcd"), (5L, "xy"))
    for (k <- 2 to 3)
      assert(run(rows, k) == naive(rows, k), s"k=$k mismatch")
  }

  test("no matches beyond the threshold") {
    val rows = Seq[(Long, String)]((1L, "aaaaaaaa"), (2L, "bbbbbbbb"))
    assert(run(rows, 3).isEmpty)
  }
}
