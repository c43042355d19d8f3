package graft.tables

import org.apache.spark.sql.functions.{col, count, lit, sum}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Row type for [[DmlModelSpec]] — top-level so Spark can build its
  * encoder without an outer-instance scope. */
case class DmlModelRow(id: Long, v: Long, s: String)

/** CDC event row for the APPLY CHANGES sequencing property. */
case class DmlCdcRow(k: Long, v: Long, seq: Long, op: String)

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

  // ---- COPY INTO idempotency ---------------------------------------------

  test("COPY INTO: random re-copy orders are idempotent; force re-loads exactly once more") {
    // the ingest ledger contract: however arrival batches overlap (files
    // re-presented in later batches, duplicate copy calls), each file
    // loads exactly once — and force loads everything exactly once more
    val cases = samples(Gen.listOfN(6, Gen.choose(0, 2)), 3)
    cases.zipWithIndex.foreach { case (batchOf, ci) =>
      val srcDir = java.nio.file.Paths.get(scratch(s"copysrc$ci"))
      java.nio.file.Files.createDirectories(srcDir)
      // three source files, written once
      (0 until 3).foreach { f =>
        rowsOf(ci * 10 + f).toDF().coalesce(1).write.mode("overwrite")
          .parquet(srcDir.resolve(s"f$f").toString)
      }
      val t = GraftTable.create(spark, scratch(s"copydst$ci"), schema)
      // random sequence of copy calls, each over the WHOLE dir (so later
      // calls always re-present earlier files) — batchOf only varies how
      // many calls happen before the final full pass
      (0 to batchOf.count(_ > 0)).foreach { _ =>
        Ingest.copyInto(t, srcDir.toString)
      }
      val want = sortedRows((0 until 3).flatMap(f => rowsOf(ci * 10 + f)))
      val got = sortedRows(t.read().as[R].collect().toSeq)
      assert(got == want, s"case $ci: re-copies must be idempotent")
      // force: every file loads exactly once more
      Ingest.copyInto(t, srcDir.toString, force = true)
      val got2 = sortedRows(t.read().as[R].collect().toSeq)
      assert(got2 == sortedRows(want ++ want),
        s"case $ci: force must re-load each file exactly once")
    }
  }

  // ---- clone independence + vacuum retention ------------------------------

  test("clones are independent and vacuum keeps every retained version readable") {
    val cases = samples(Gen.listOfN(4, Gen.choose(0, 1000)), 3)
    cases.zipWithIndex.foreach { case (seeds, ci) =>
      val t = GraftTable.create(spark, scratch(s"vacmodel$ci"), schema)
      // history with a rewrite in it so vacuum has unreferenced files
      t.append(rowsOf(seeds(0)).toDF())
      t.append(rowsOf(seeds(1)).toDF())
      MergeOps.delete(t, s"id % 7 = ${seeds(2) % 7}")
      Maintenance.optimize(t)
      t.append(rowsOf(seeds(3)).toDF())
      val before = sortedRows(t.read().as[R].collect().toSeq)
      val prev = sortedRows(
        t.read(versionAsOf = t.currentVersion - 1).as[R].collect().toSeq)

      // deep clone: equal content, then fully independent
      val c = t.cloneTo(scratch(s"vacclone$ci"))
      assert(sortedRows(c.read().as[R].collect().toSeq) == before,
        s"case $ci: clone content differs")
      c.append(rowsOf(seeds(0) + 1).toDF())
      assert(sortedRows(t.read().as[R].collect().toSeq) == before,
        s"case $ci: writing the clone mutated the source")

      // vacuum retaining one prior version: current and prior reads
      // survive byte-identical; something older was actually reclaimed
      val removed = t.vacuum(retainVersions = 1)
      assert(removed.nonEmpty,
        s"case $ci: a history with a full rewrite must have vacuumable files")
      assert(sortedRows(t.read().as[R].collect().toSeq) == before,
        s"case $ci: vacuum changed the current snapshot")
      assert(sortedRows(
        t.read(versionAsOf = t.currentVersion - 1).as[R].collect().toSeq) == prev,
        s"case $ci: vacuum broke the retained prior version")
    }
  }

  // ---- incremental MV equivalence ----------------------------------------

  test("incremental MV refresh equals the batch aggregate for random histories") {
    // random interleavings of appends, deletes (forcing the full-recompute
    // fallback) and refreshes: after every refresh the view must equal
    // the batch groupBy over the source, and append-only windows must
    // take the incremental path (cost ∝ new data — the 100 TB claim)
    val opsGen = Gen.listOfN(8, Gen.frequency(
      4 -> Gen.choose(0, 1000).map(Append),
      1 -> Gen.choose(0, 6).map(Delete),
      3 -> Gen.const(Optimize))) // reused tag: here it means "refresh"
    val cases = samples(opsGen, 3)
    cases.zipWithIndex.foreach { case (ops, ci) =>
      val src = GraftTable.create(spark, scratch(s"mvmodelsrc$ci"), schema)
      src.append(rowsOf(ci).toDF())
      val view = IncrementalMv.create(spark, scratch(s"mvmodelv$ci"),
        src, Seq("s"), Seq("v"))
      var deleteSinceRefresh = false
      ops.foreach {
        case Append(seed) =>
          src.append(rowsOf(seed).toDF())
        case Delete(m) =>
          MergeOps.delete(src, s"id % 7 = $m")
          deleteSinceRefresh = true
        case Optimize => // refresh point
          val r = IncrementalMv.refresh(src, view, Seq("s"), Seq("v"))
          if (!deleteSinceRefresh)
            assert(r.incremental,
              s"case $ci: append-only window must refresh incrementally")
          deleteSinceRefresh = false
          val got = view.read().select("s", "cnt", "sum_v")
            .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
            .toSeq.sortBy(_._1)
          val want = src.read().groupBy("s")
            .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"))
            .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
            .toSeq.sortBy(_._1)
          assert(got == want, s"case $ci: MV diverged after refresh (ops: $ops)")
        case _ => ()
      }
    }
  }

  // ---- CDF replay invariant ----------------------------------------------

  test("change feed replay reconstructs the table for random append/delete sequences") {
    // the CDC consumer contract: folding every change row in commit order
    // (insert adds, delete removes by value) over an empty state must
    // land exactly on the current table — a change row missed, doubled,
    // or mis-tagged by any DML path breaks downstream sync silently,
    // so the invariant is pinned over random sequences
    val opsGen = Gen.listOfN(7, Gen.frequency(
      3 -> Gen.choose(0, 1000).map(Append),
      2 -> Gen.choose(0, 6).map(Delete)))
    val cases = samples(opsGen, 3)
    cases.zipWithIndex.foreach { case (ops, ci) =>
      val t = GraftTable.create(spark, scratch(s"cdfmodel$ci"), schema,
        Map("graft.enableChangeDataFeed" -> "true"))
      ops.foreach {
        case Append(seed) => t.append(rowsOf(seed).toDF())
        case Delete(m) => MergeOps.delete(t, s"id % 7 = $m")
        case _ => ()
      }
      val changes = t.changes(fromVersion = 0)
        .select(col("id"), col("v"), col("s"), col("_change_type"),
          col("_commit_version"))
        .collect().toSeq
        .sortBy(_.getLong(4)) // commit order
      var state = Vector.empty[R]
      changes.foreach { r =>
        val row = R(r.getLong(0), r.getLong(1), r.getString(2))
        r.getString(3) match {
          case "insert" => state :+= row
          case "delete" =>
            val i = state.indexOf(row)
            assert(i >= 0, s"case $ci: delete change for absent row $row")
            state = state.patch(i, Nil, 1)
          case other => fail(s"case $ci: unexpected change type $other")
        }
      }
      val got = sortedRows(t.read().as[R].collect().toSeq)
      assert(got == sortedRows(state),
        s"case $ci: CDF replay diverged from the table (ops: $ops)")
    }
  }

  // ---- OPTIMIZE layout property ------------------------------------------

  test("OPTIMIZE preserves content and respects partition dirs for every layout") {
    // random (partitioned?, zorder?) combinations — including the round-9
    // partition-aware clustering path — must never change table content,
    // and partitioned tables must end with files that each live in
    // exactly one partition dir
    val layoutGen = Gen.zip(Gen.choose(0, 1000), Gen.oneOf(0, 1, 2), Gen.oneOf(true, false))
    val cases = samples(layoutGen, 5)
    cases.zipWithIndex.foreach { case ((seed, zn, partitioned), ci) =>
      val props =
        (if (partitioned) Map("graft.partitionBy" -> "s") else Map.empty[String, String]) +
          ("graft.targetFileSize" -> (16 * 1024).toString)
      val t = GraftTable.create(spark, scratch(s"optmodel$ci"), schema, props)
      // several appends → several file sets, all partition dirs populated
      (0 until 3).foreach(b => t.append(rowsOf(seed + b).toDF()))
      val before = sortedRows(t.read().as[R].collect().toSeq)
      val zorder = Seq("id", "v").take(zn)
      Maintenance.optimize(t, zorderBy = zorder)
      val after = sortedRows(t.read().as[R].collect().toSeq)
      assert(after == before,
        s"case $ci (z=$zorder part=$partitioned) content changed")
      if (partitioned) {
        val files = t.filesAt()
        assert(files.forall(_.contains("__part_s=")),
          s"case $ci: optimized file outside a partition dir: $files")
        // bounded: at most ~1 file per partition value per size bucket —
        // never the tasks × partitions explosion
        val perDir = files.groupBy(f => "__part_s=([^/]+)".r.findFirstIn(f).get)
        perDir.foreach { case (d, fs) =>
          assert(fs.size <= 3, s"case $ci: $d holds ${fs.size} files after OPTIMIZE")
        }
      }
    }
  }

  // ---- APPLY CHANGES (SCD1) sequencing vs model --------------------------

  /** Random CDC stream: per-key events with globally unique sequence
    * numbers, ~1/4 deletes, chopped into batches whose ARRIVAL order
    * scrambles the sequence order — late batches carry older events. */
  private val cdcGen = for {
    nEvents <- Gen.choose(8, 30)
    events <- Gen.sequence[List[(Long, Long, Boolean, Int)], (Long, Long, Boolean, Int)](
      (0 until nEvents).map { i =>
        for {
          k <- Gen.choose(0L, 5L)
          v <- Gen.choose(0L, 99L)
          del <- Gen.frequency(3 -> Gen.const(false), 1 -> Gen.const(true))
          batch <- Gen.choose(0, 2)
        } yield (k, v, del, batch)
      })
  } yield events.zipWithIndex.map { case ((k, v, del, b), i) =>
    (DmlCdcRow(k, v, i.toLong, if (del) "del" else "up"), b)
  }

  test("APPLY CHANGES SCD1: scrambled batch arrival equals the per-key argmax model") {
    val cases = samples(cdcGen, 5)
    assert(cases.size >= 3)
    cases.zipWithIndex.foreach { case (tagged, ci) =>
      val cdcSchema = StructType(Seq(
        StructField("k", LongType), StructField("v", LongType),
        StructField("seq", LongType), StructField("op", StringType)))
      val t = GraftTable.create(spark, scratch(s"scdmodel$ci"), cdcSchema)
      (0 to 2).foreach { b =>
        val batch = tagged.filter(_._2 == b).map(_._1)
        if (batch.nonEmpty)
          Scd.applyChangesScd1(t, batch.toDF(), Seq("k"), "seq",
            deleteWhen = Some("op = 'del'"))
      }
      // model: the globally newest event per key wins regardless of which
      // batch carried it; a winning delete removes the key (and a late
      // OLDER upsert must not resurrect it)
      val want = tagged.map(_._1).groupBy(_.k).toSeq.flatMap { case (_, evs) =>
        val newest = evs.maxBy(_.seq)
        if (newest.op == "del") None else Some(newest)
      }.sortBy(_.k)
      val got = t.read().as[DmlCdcRow].collect().toSeq.sortBy(_.k)
      assert(got == want,
        s"case $ci SCD1 diverged: got $got want $want (events: ${tagged.take(12)}...)")
    }
  }

  // ---- randomized MERGE clause matrix vs model ---------------------------

  private sealed trait MA
  private case object MUpdateAll extends MA
  private case object MUpdateSum extends MA
  private case object MDelete extends MA
  private sealed trait NA
  private case object NInsertAll extends NA
  private case object NInsertComputed extends NA

  /** (clause condition as SQL, same condition on the model) — matched
    * conditions may see both sides; not-matched see the source only. */
  private val matchedCondGen: Gen[Option[(String, (R, R) => Boolean)]] =
    Gen.oneOf(
      None,
      Some(("source.v >= 2", (q: R, _: R) => q.v >= 2)),
      Some(("target.v < source.v", (q: R, r: R) => r.v < q.v)))
  private val notMatchedCondGen: Gen[Option[(String, R => Boolean)]] =
    Gen.oneOf(None, Some(("source.v % 2 = 0", (q: R) => q.v % 2 == 0)))

  private val mergeGen = for {
    tSeed <- Gen.choose(0, 1000)
    sSeed <- Gen.choose(0, 1000)
    nMatched <- Gen.choose(0, 2)
    mas <- Gen.listOfN(nMatched,
      Gen.zip(Gen.oneOf[MA](MUpdateAll, MUpdateSum, MDelete), matchedCondGen))
    na <- Gen.option(
      Gen.zip(Gen.oneOf[NA](NInsertAll, NInsertComputed), notMatchedCondGen))
  } yield (tSeed, sSeed, mas, na)

  test("random MERGE clause matrices agree with the reference model") {
    val cases = samples(mergeGen, 6)
    assert(cases.size >= 3)
    cases.zipWithIndex.foreach { case ((tSeed, sSeed, mas, na), ci) =>
      val target = rowsOf(tSeed)
      // unique source keys (the documented multiple-match contract:
      // dedupe the source first, the reference's own DupRank idiom)
      val source = rowsOf(sSeed).groupBy(_.id).map(_._2.head).toSeq
      val t = GraftTable.create(spark, scratch(s"mergemodel$ci"), schema)
      t.append(target.toDF())
      val matched = mas.map { case (a, c) =>
        MergeOps.WhenMatched(c.map(_._1), a match {
          case MUpdateAll => MergeOps.UpdateAll
          case MUpdateSum => MergeOps.UpdateSet(Map("v" -> "source.v + target.v"))
          case MDelete => MergeOps.DeleteAction
        })
      }
      val notMatched = na.toSeq.map { case (a, c) =>
        MergeOps.WhenNotMatched(c.map(_._1), a match {
          case NInsertAll => MergeOps.InsertAll
          case NInsertComputed => MergeOps.InsertValues(
            Map("id" -> "source.id", "v" -> "source.v * 10", "s" -> "'x'"))
        })
      }
      MergeOps.mergeInto(t, source.toDF(), "target.id = source.id",
        matched = matched, notMatched = notMatched)

      val byId = source.map(q => q.id -> q).toMap
      val kept = target.flatMap { r =>
        byId.get(r.id) match {
          case None => Some(r)
          case Some(q) =>
            mas.find { case (_, c) => c.forall(_._2(q, r)) } match {
              case None => Some(r) // no clause fires: row untouched
              case Some((MUpdateAll, _)) => Some(q)
              case Some((MUpdateSum, _)) => Some(r.copy(v = q.v + r.v))
              case Some((MDelete, _)) => None
            }
        }
      }
      val targetIds = target.map(_.id).toSet
      val inserted = source.filterNot(q => targetIds.contains(q.id)).flatMap { q =>
        na.flatMap { case (a, c) =>
          if (!c.forall(_._2(q))) None
          else Some(a match {
            case NInsertAll => q
            case NInsertComputed => R(q.id, q.v * 10, "x")
          })
        }
      }
      val got = sortedRows(t.read().as[R].collect().toSeq)
      val want = sortedRows(kept ++ inserted)
      assert(got == want,
        s"case $ci MERGE diverged (matched=$mas notMatched=$na): " +
          s"got ${got.take(8)}... want ${want.take(8)}...")
    }
  }

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
