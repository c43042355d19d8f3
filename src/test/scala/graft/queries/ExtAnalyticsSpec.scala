package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Sanity checks for the extension analytics batch (as-of join, bucketed
  * range join, sketches, text filters); cross-engine equivalence is the
  * DuckDB gate's job. */
class ExtAnalyticsSpec extends SparkTestBase {

  private def run(name: String) =
    ExtAnalyticsQueries.queries.find(_.name == name).get.run(spark, sf)

  test("q190 as-of join: one row per click, purchase never after the click") {
    val out = run("q190_asof_join").cache()
    val clicks = graft.Tables.t(spark, sf, "events")
      .filter(col("event_type") === "click").count()
    assert(out.count() === clicks)
    assert(out.filter(col("p_ts") > col("ts")).count() === 0)
    assert(out.filter(col("p_ts").isNotNull).count() > 0,
      "some click must have a preceding purchase")
    // carry-forward must agree with a brute-force max-ts lookup on a sample
    val ev = graft.Tables.t(spark, sf, "events")
    val brute = ev.filter(col("event_type") === "click").limit(50).alias("c")
      .join(ev.filter(col("event_type") === "purchase").alias("p"),
        expr("c.user_id = p.user_id AND p.ts <= c.ts"), "left")
      .groupBy(col("c.event_id").as("event_id"))
      .agg(max(col("p.ts")).as("b_p_ts"))
    val joined = out.join(brute, "event_id")
    assert(joined.filter(!(col("p_ts") <=> col("b_p_ts"))).count() === 0)
    out.unpersist()
  }

  test("q191 bucketed range join matches the naive inequality join") {
    val out = run("q191_bucketed_range_join")
    val ev = graft.Tables.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val naive = ev.alias("a").join(ev.alias("b"),
        expr("a.user_id = b.user_id AND a.event_id <> b.event_id " +
          "AND abs(a.us - b.us) <= 3600000000"), "left")
      .groupBy(col("a.event_id").as("event_id"))
      .agg(count(col("b.event_id")).as("naive"))
    val diff = out.join(naive, "event_id")
      .filter(col("neighbors") =!= col("naive")).count()
    assert(diff === 0)
  }

  test("q192/q193 sketch estimates stay inside their error bounds") {
    assert(run("q192_approx_distinct")
      .filter(!col("approx_ok") || !col("hll_ok")).count() === 0)
    assert(run("q193_approx_percentile")
      .filter(!col("median_ok") || !col("p95_ok")).count() === 0)
  }

  test("q197 near-copy docs share nearly all their 8-grams") {
    val out = run("q197_boilerplate_ngrams").cache()
    assert(out.filter(col("shared_ratio") < 0 || col("shared_ratio") > 1).count() === 0)
    // the mutated near-copies (doc_id >= 100000) consist mostly of grams
    // shared with their originals (the appended mutation contributes a few
    // unshared tail grams, more visible on short docs)
    val copies = out.filter(col("doc_id") >= 100000)
    assert(copies.count() > 0)
    val avgShared = copies.agg(avg("shared_ratio")).head().getDouble(0)
    assert(avgShared > 0.5, s"copies should share most grams, got $avgShared")
    out.unpersist()
  }

  test("q198 window extensions: one row per event, frames well-formed") {
    val out = run("q198_window_extensions").cache()
    val n = graft.Tables.t(spark, sf, "events").count()
    assert(out.count() === n)
    assert(out.filter(col("quartile") < 1 || col("quartile") > 4).count() === 0)
    // the trailing 1h sum includes the current row's value, so it is never
    // null and at least one row per user has no predecessor (null lag)
    assert(out.filter(col("hour_sum").isNull).count() === 0)
    assert(out.filter(col("prev_value").isNull).count() > 0)
    out.unpersist()
  }

  test("q194 ratios well-formed; q195 one top term per doc") {
    val rep = run("q194_repetition_filter")
    assert(rep.filter(col("distinct_ratio") <= 0 || col("distinct_ratio") > 1 ||
      col("top_word_ratio") <= 0 || col("top_word_ratio") > 1).count() === 0)
    val docs = graft.Tables.t(spark, sf, "documents").count()
    assert(rep.count() === docs)
    val tfidf = run("q195_tfidf_topterm")
    assert(tfidf.count() === docs)
    assert(tfidf.filter(col("tfidf") < 0).count() === 0)
  }
}
