package graft.tables

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Row type for [[DmlModelSpec]] — top-level so Spark can build its
  * encoder without an outer-instance scope. */
case class DmlModelRow(id: Long, v: Long, s: String)

/** Model-based DML property: random operation sequences (append / DELETE
  * / UPDATE / OPTIMIZE / TRUNCATE / RESTORE) applied to a [[GraftTable]]
  * — with deletion vectors randomly on or off — must agree with a plain
  * in-memory multiset model after EVERY operation, and `VERSION AS OF`
  * at every recorded version must reproduce the model's snapshot at that
  * point. Hand-written DML specs pin one scripted scenario each; this
  * explores interleavings (delete-after-restore, update-on-DV-table,
  * optimize-then-time-travel, truncate-then-restore) no script
  * enumerates. */
class DmlModelSpec extends SparkTestBase {
  import spark.implicits._

  private type R = DmlModelRow
  private def R(id: Long, v: Long, s: String): R = DmlModelRow(id, v, s)
  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType),
    StructField("s", StringType)))

  private sealed trait Op
  private case class Append(seed: Int) extends Op
  private case class Delete(m: Int) extends Op
  private case class Update(k: Int) extends Op
  private case object Optimize extends Op
  private case object Truncate extends Op
  private case class Restore(back: Int) extends Op

  private def rowsOf(seed: Int): Seq[R] = (0 until 12).map { i =>
    R((seed * 7 + i) % 30L, (seed + i) % 5L, if ((seed + i) % 2 == 0) "a" else "b")
  }

  private val opGen: Gen[Op] = Gen.frequency(
    5 -> Gen.choose(0, 1000).map(Append),
    3 -> Gen.choose(0, 6).map(Delete),
    3 -> Gen.choose(1, 9).map(Update),
    1 -> Gen.const(Optimize),
    1 -> Gen.const(Truncate),
    2 -> Gen.choose(1, 4).map(Restore))

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    var seed = Seed(1337L)
    (1 to n).flatMap { _ =>
      val v = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
  }

  private def sortedRows(rs: Seq[R]): Seq[R] = rs.sortBy(r => (r.id, r.v, r.s))

  test("random DML sequences agree with the reference model at every version") {
    val cases = samples(Gen.listOfN(8, opGen), 4)
    assert(cases.size >= 2)
    cases.zipWithIndex.foreach { case (ops, ci) =>
      val dv = ci % 2 == 0 // both DV and CoW variants always exercised
      val t = GraftTable.create(spark, scratch(s"dmlmodel$ci"), schema,
        Map("graft.deletionVectors" -> dv.toString))
      var model = Vector.empty[R]
      var snaps = Map.empty[Long, Vector[R]]
      def record(): Unit = snaps += t.commits.last.version -> model
      record() // the CREATE version: empty table
      ops.foreach { op =>
        op match {
          case Append(seed) =>
            t.append(rowsOf(seed).toDF())
            model = model ++ rowsOf(seed)
          case Delete(m) =>
            MergeOps.delete(t, s"id % 7 = $m")
            model = model.filterNot(_.id % 7 == m)
          case Update(k) =>
            MergeOps.update(t, Map("v" -> s"v + $k"), "id % 3 = 0")
            model = model.map(r => if (r.id % 3 == 0) r.copy(v = r.v + k) else r)
          case Optimize =>
            Maintenance.optimize(t)
          case Truncate =>
            t.truncate()
            model = Vector.empty
          case Restore(back) =>
            val versions = snaps.keys.toSeq.sorted
            val target = versions(math.max(0, versions.size - 1 - back))
            t.restoreTo(target)
            model = snaps(target)
        }
        record()
        val got = sortedRows(t.read().as[R].collect().toSeq)
        assert(got == sortedRows(model),
          s"case $ci dv=$dv diverged after $op: got ${got.take(8)}... vs " +
            s"model ${sortedRows(model).take(8)}... (ops: $ops)")
      }
      // time travel: every recorded version must replay its snapshot
      snaps.toSeq.sortBy(_._1).foreach { case (ver, m) =>
        val got = sortedRows(t.read(versionAsOf = ver).as[R].collect().toSeq)
        assert(got == sortedRows(m),
          s"case $ci dv=$dv VERSION AS OF $ver mismatch (ops: $ops)")
      }
    }
  }
}
