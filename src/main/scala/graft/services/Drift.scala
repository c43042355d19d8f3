package graft.services

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift report between two versions of a numeric column —
  * the release-gate check every recurring data pipeline runs before
  * swapping a corpus/feature snapshot: PSI (population stability index,
  * the standard banking/ML-monitoring drift metric) per bin plus the
  * total, where PSI = Σ (curShare − refShare) · ln(curShare/refShare).
  * Rule-of-thumb thresholds: < 0.1 stable, 0.1–0.25 moderate shift,
  * > 0.25 investigate.
  *
  * Bins are EQUI-WIDTH over the reference's [min, max] (one aggregate;
  * current-version values outside the reference range clamp into the
  * edge bins, which is exactly where range drift shows up). The
  * quantile-edged PSI variant needs a total order over the reference —
  * at corpus scale that's either an approximate sketch (not
  * oracle-stable) or a global sort; equi-width keeps the whole report
  * at two map-side-combined bin counts and is the variant monitoring
  * systems actually default to. Shares are Laplace-smoothed
  * ((n + 0.5) / (N + bins/2)) so an empty bin can't divide by zero or
  * ln(0) — deterministic and replayed by the q279 oracle.
  *
  * Scale shape: two scans (ref min/max + the union bin count), all
  * aggregates map-side combined, bin table bounded by `bins` rows.
  */
object Drift {

  /** The reference's [min, max] over `valueCol` — the bin bounds a
    * production monitor derives ONCE and reuses per micro-batch
    * ([[psiWithBounds]]); one map-side-combined aggregate. */
  def bounds(ref: DataFrame, valueCol: String): (Double, Double) = {
    val mm = ref.agg(min(col(valueCol).cast("double")).as("mn"),
      max(col(valueCol).cast("double")).as("mx")).head()
    require(!mm.isNullAt(0), "reference has no non-null values")
    (mm.getDouble(0), mm.getDouble(1))
  }

  /** Per-bin drift rows: bin (0-based), ref_n, cur_n, ref_share,
    * cur_share, psi_term — plus sums give the headline PSI. NULL
    * values are excluded on both sides (completeness drift is
    * TableCheck's job, not a distribution bin). Derives the bin bounds
    * from `ref` (one extra reference aggregate); a monitor scoring many
    * batches against ONE reference should derive [[bounds]] once and
    * call [[psiWithBounds]] per batch instead. */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
      bins: Int = 10): DataFrame = {
    val (mn, mx) = bounds(ref, valueCol)
    psiWithBounds(ref, cur, valueCol, mn, mx, bins)
  }

  /** [[psi]] with the reference bin bounds PINNED by the caller — the
    * production monitoring shape: bounds derived once (at reference
    * registration), each batch pays only its own bin count plus the
    * reference's (values outside [mn, mx] clamp into the edge bins on
    * both sides, identical to [[psi]]'s behavior). */
  def psiWithBounds(ref: DataFrame, cur: DataFrame, valueCol: String,
      mn: Double, mx: Double, bins: Int = 10): DataFrame = {
    require(bins >= 2, "PSI needs at least 2 bins")
    require(mx >= mn, s"bounds inverted: [$mn, $mx]")
    val width = if (mx > mn) (mx - mn) / bins else 1.0
    def binOf(c: Column): Column =
      least(greatest(floor((c.cast("double") - lit(mn)) / lit(width))
        .cast("int"), lit(0)), lit(bins - 1))
    def binned(df: DataFrame, side: String): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select(binOf(col(valueCol)).as("bin"), lit(side).as("side"))
        .groupBy("bin", "side").agg(count(lit(1)).as("n"))
    val counts = binned(ref, "ref").unionByName(binned(cur, "cur"))
    // densify: every bin appears on both sides even at zero count
    val allBins = ref.sparkSession.range(0, bins)
      .select(col("id").cast("int").as("bin"))
      .crossJoin(ref.sparkSession.range(0, 2)
        .select(when(col("id") === 0, "ref").otherwise("cur").as("side")))
    val dense = allBins.join(counts, Seq("bin", "side"), "left")
      .select(col("bin"), col("side"), coalesce(col("n"), lit(0L)).as("n"))
    val withTot = dense.withColumn("tot",
      sum("n").over(org.apache.spark.sql.expressions.Window.partitionBy("side")))
    val share = withTot.select(col("bin"), col("side"),
      col("n"),
      ((col("n") + lit(0.5)) / (col("tot") + lit(bins / 2.0))).as("share"))
    val r = share.filter(col("side") === "ref")
      .select(col("bin"), col("n").as("ref_n"), col("share").as("ref_share"))
    val c = share.filter(col("side") === "cur")
      .select(col("bin"), col("n").as("cur_n"), col("share").as("cur_share"))
    r.join(c, Seq("bin"))
      .select(col("bin"), col("ref_n"), col("cur_n"),
        round(col("ref_share") + lit(1e-9), 6).as("ref_share"),
        round(col("cur_share") + lit(1e-9), 6).as("cur_share"),
        round((col("cur_share") - col("ref_share")) *
          log(col("cur_share") / col("ref_share")) + lit(1e-9), 6)
          .as("psi_term"))
  }

  /** Categorical PSI: the drift report for string/enum columns — bins
    * are the reference's `topK` most frequent categories (ties by
    * category ascending, the vocabCoverage tie rule) plus an `__other__`
    * bucket absorbing the tail AND any category the current version
    * invented (new-category drift lands there, which is exactly the
    * alarm wanted). Same Laplace smoothing and PSI terms as [[psi]].
    * Scale shape: one category count per side (map-side combined),
    * a TakeOrdered top-K on the reference (never a global sort), output
    * bounded by topK + 1 rows. NULL categories are excluded, as in
    * [[psi]]. */
  def psiCategorical(ref: DataFrame, cur: DataFrame, valueCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val spark = ref.sparkSession
    def counted(df: DataFrame): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .groupBy(col(valueCol).cast("string").as("cat"))
        .agg(count(lit(1)).as("n"))
    val refCounts = counted(ref)
    val top = refCounts.orderBy(desc("n"), asc("cat")).limit(topK)
      .select("cat").collect().map(_.getString(0)).toSeq
    val nBuckets = top.size + 1
    def bucketed(df: DataFrame, side: String): DataFrame =
      counted(df)
        .withColumn("bucket",
          when(col("cat").isin(top: _*), col("cat")).otherwise("__other__"))
        .groupBy("bucket").agg(sum("n").as("n"))
        .withColumn("side", lit(side))
    val counts = bucketed(ref, "ref").unionByName(bucketed(cur, "cur"))
    import spark.implicits._
    val allBuckets = (top :+ "__other__").toDF("bucket")
      .crossJoin(Seq("ref", "cur").toDF("side"))
    val dense = allBuckets.join(counts, Seq("bucket", "side"), "left")
      .select(col("bucket"), col("side"), coalesce(col("n"), lit(0L)).as("n"))
    val withTot = dense.withColumn("tot",
      sum("n").over(org.apache.spark.sql.expressions.Window.partitionBy("side")))
    val share = withTot.select(col("bucket"), col("side"), col("n"),
      ((col("n") + lit(0.5)) / (col("tot") + lit(nBuckets / 2.0))).as("share"))
    val r = share.filter(col("side") === "ref")
      .select(col("bucket"), col("n").as("ref_n"), col("share").as("ref_share"))
    val c = share.filter(col("side") === "cur")
      .select(col("bucket"), col("n").as("cur_n"), col("share").as("cur_share"))
    r.join(c, Seq("bucket"))
      .select(col("bucket"), col("ref_n"), col("cur_n"),
        round(col("ref_share") + lit(1e-9), 6).as("ref_share"),
        round(col("cur_share") + lit(1e-9), 6).as("cur_share"),
        round((col("cur_share") - col("ref_share")) *
          log(col("cur_share") / col("ref_share")) + lit(1e-9), 6)
          .as("psi_term"))
  }
}
