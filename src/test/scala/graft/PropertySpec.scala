package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.MisraGries

/** Property-based pins for the operators whose correctness rests on an
  * algorithmic guarantee rather than an example: random inputs explore
  * the space the hand-written specs can't enumerate. Spark-free where
  * possible (pure summary algebra) so hundreds of cases stay fast; the
  * distributed forms of each operator are pinned by their example specs
  * and the DuckDB gate.
  */
class PropertySpec extends SparkTestBase {

  /** Deterministic sampling from a Gen (no scalatest bridge in the
    * offline resolver): fixed seed, n cases per property. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    var seed = Seed(42L)
    (1 to n).flatMap { _ =>
      val v = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
  }

  private def forAllSampled[T](g: Gen[T], n: Int = 60)(body: T => Unit): Unit = {
    val cases = samples(g, n)
    assert(cases.size >= n / 2, "generator produced too few cases")
    cases.foreach(body)
  }

  private val streamGen: Gen[List[Int]] =
    Gen.listOfN(400, Gen.frequency(
      (8, Gen.choose(0, 4)),     // heavy items
      (2, Gen.choose(5, 120)))) // long tail

  test("Misra-Gries: heavy-hitter guarantee and undercount bound hold on random streams") {
    val k = 6
    val agg = new MisraGries(k)
    forAllSampled(streamGen) { xs =>
      val words = xs.map(i => s"w$i")
      val summary = words.foldLeft(agg.zero)(agg.reduce)
      val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = words.size.toDouble / (k + 1)
      assert(summary.size <= k)
      exact.foreach { case (w, n) =>
        if (n > bound) assert(summary.contains(w), s"$w freq $n > $bound evicted")
      }
      summary.foreach { case (w, est) =>
        val truth = exact.getOrElse(w, 0L)
        assert(est <= truth && truth - est <= bound + 1)
      }
    }
  }

  test("Misra-Gries: arbitrary partition merges never break the guarantee") {
    val k = 5
    val agg = new MisraGries(k)
    val partsGen = for {
      xs <- streamGen
      nSplit <- Gen.choose(1, 6)
    } yield (xs.map(i => s"w$i"), nSplit)
    forAllSampled(partsGen) { case (words, nSplit) =>
      val parts = words.grouped(math.max(words.size / nSplit, 1)).toList
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = words.size.toDouble / (k + 1)
      assert(merged.size <= k)
      exact.foreach { case (w, n) =>
        if (n > bound) assert(merged.contains(w),
          s"$w freq $n > $bound lost in a ${parts.size}-way merge")
      }
    }
  }

  test("Bloom filter: no member is ever rejected (random member sets)") {
    import org.apache.spark.util.sketch.BloomFilter
    forAllSampled(Gen.nonEmptyListOf(Gen.long)) { xs =>
      val bf = BloomFilter.create(math.max(xs.size, 1), 0.03)
      xs.foreach(bf.putLong)
      xs.foreach(x => assert(bf.mightContainLong(x)))
    }
  }

  test("connected components match a union-find reference on random graphs") {
    // small random graphs, exhaustive cross-check against sequential
    // union-find — pins the large-star/small-star rewiring, not examples
    val graphGen = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(0, 30)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield (n, edges.distinct)
    import spark.implicits._
    forAllSampled(graphGen, n = 12) { case (n, edges) =>
      // sequential union-find ground truth
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n.toInt)
        .map(i => i.toLong -> {
          // min node id in the component = canonical rep
          val r = find(i)
          (0 until n.toInt).filter(j => find(j) == r).min.toLong
        }).toMap
      val nodes = spark.range(n).select(col("id").as("doc_id"))
      val edgeDf =
        if (edges.isEmpty)
          Seq.empty[(Long, Long)].toDF("d1", "d2")
        else edges.toDF("d1", "d2")
      val got = graft.text.DedupOps.connectedComponents(edgeDf, nodes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected)
    }
  }
}
