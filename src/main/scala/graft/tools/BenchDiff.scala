package graft.tools

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

/** Mechanical cross-round bench comparison: join two Bench JSON lines
  * (`BENCH_r{N}.json`) on query name and flag only the deltas that exceed
  * the measured run-to-run spread — `|Δ| > max(k · max(MAD_a, MAD_b),
  * floor)` — so a regression triage starts from noise-adjusted facts
  * instead of re-litigating every wobble (the q58 lesson: a 2× delta can
  * be pure statistic-change + ambient load, and only the per-query MAD
  * distinguishes that from a code-change fingerprint).
  *
  * Usage: runMain graft.tools.BenchDiff <old.json> <new.json> [k] [floorSec]
  * Output: one line per flagged query (old → new, Δ, spread bound), then a
  * summary. Dev tool — reads the same JSON the driver archives.
  */
object BenchDiff {

  private val M = new ObjectMapper()

  private def queriesOf(path: String, field: String): Map[String, Double] = {
    val n = M.readTree(Files.readAllBytes(Paths.get(path))).get(field)
    if (n == null) Map.empty
    else {
      val it = n.fields()
      val b = Map.newBuilder[String, Double]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
      b.result()
    }
  }

  def diff(oldPath: String, newPath: String, k: Double = 4.0,
      floorSec: Double = 0.5): Seq[(String, Double, Double, Double)] = {
    // a gate's isolated quiet-box number (queries_isolated, present when
    // the in-run MAD flagged it) is measured under a DIFFERENT protocol
    // than the in-run median (state reset + forced GC before every rep —
    // cold-start cost the catalog run amortizes), so the two statistics
    // are only comparable to their own kind: prefer isolated numbers
    // ONLY when BOTH rounds carry one for the gate (comparing one
    // round's isolated 20 s against the other's in-run 29 s would flag
    // the exact neighbor-noise artifact this mechanism exists to
    // suppress — review finding)
    val (isoO, isoN) =
      (queriesOf(oldPath, "queries_isolated"), queriesOf(newPath, "queries_isolated"))
    val both = isoO.keySet & isoN.keySet
    val (qo, qn) =
      (queriesOf(oldPath, "queries") ++ isoO.view.filterKeys(both).toMap,
        queriesOf(newPath, "queries") ++ isoN.view.filterKeys(both).toMap)
    val (mo, mn) =
      (queriesOf(oldPath, "queries_mad") ++
        queriesOf(oldPath, "queries_isolated_mad").view.filterKeys(both).toMap,
        queriesOf(newPath, "queries_mad") ++
          queriesOf(newPath, "queries_isolated_mad").view.filterKeys(both).toMap)
    (qo.keySet & qn.keySet).toSeq.sorted.flatMap { q =>
      val (a, b) = (qo(q), qn(q))
      val bound = math.max(k * math.max(mo.getOrElse(q, 0.0), mn.getOrElse(q, 0.0)),
        floorSec)
      if (math.abs(b - a) > bound) Some((q, a, b, bound)) else None
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchDiff <old.json> <new.json> [k] [floorSec]")
    val k = if (args.length > 2) args(2).toDouble else 4.0
    val floor = if (args.length > 3) args(3).toDouble else 0.5
    val flagged = diff(args(0), args(1), k, floor)
    flagged.foreach { case (q, a, b, bound) =>
      val dir = if (b > a) "REGRESSED" else "improved"
      println(f"$dir%-9s $q%-40s $a%7.2f -> $b%7.2f s  (|d|=${math.abs(b - a)}%.2f > bound $bound%.2f)")
    }
    val regressed = flagged.count { case (_, a, b, _) => b > a }
    println(s"${flagged.size} queries outside their measured spread " +
      s"($regressed regressed, ${flagged.size - regressed} improved; " +
      s"k=$k, floor=${floor}s)")
    // value_quiet totals are only the same statistic when both rounds
    // substituted the SAME gate set (Bench's MAD/divergence triggers
    // vary round to round beyond the fixed pin list); the substitution
    // set is exactly queries_isolated's keys, so drift is mechanical to
    // detect — warn instead of letting a total delta be read as an
    // engine change when it is partly a set change
    val (ga, gb) = (queriesOf(args(0), "queries_isolated").keySet,
      queriesOf(args(1), "queries_isolated").keySet)
    if (ga != gb)
      println(s"WARNING: value_quiet substitution sets differ — " +
        s"only-old=${(ga -- gb).toSeq.sorted.mkString(",")} " +
        s"only-new=${(gb -- ga).toSeq.sorted.mkString(",")}; " +
        "compare value_quiet across these rounds with caution")
  }
}
