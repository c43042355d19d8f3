package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Extension analytics beyond the reference's own surface (SURVEY.md §2.3
  * "no as-of / interval joins appear in the reference"; BASELINE north-star
  * LLM-pipeline scope): as-of joins, bucketed range joins, sketch-based
  * approximate aggregates, and two more training-data text filters. Every
  * implementation is the shape that survives 100 TB — single keyed shuffle
  * for the as-of carry-forward, bucket-bounded candidate generation for the
  * range join (never an unbounded inequality join), mergeable sketches for
  * the approximate aggregates.
  */
object ExtAnalyticsQueries extends QueryBatch {

  /** q228's tokenize stream — shared with PlanAuditSpec so the
    * partial-aggregation audit drives the SAME pipeline the gate runs
    * (an inline copy in the test would silently drift). */
  private[queries] def corpusWords(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.t(s, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)

  /** q228's one-pass sketch + N aggregate over [[corpusWords]]. */
  private[queries] def mgSketchAgg(
      w: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val mg = udaf(new graft.functions.MisraGries(64))
    w.agg(mg(col("word")).as("summary"), count(lit(1)).as("n"))
  }

  private def ev(s: SparkSession, dir: String) = Tables.t(s, dir, "events")

  /** As-of join: for each click, the latest purchase of the same user at or
    * before the click. Implemented as a union + carry-forward window — ONE
    * shuffle on the join key, linear in input (the classic scalable as-of
    * plan; a naive inequality join would be quadratic per user). Purchases
    * are pre-deduped per (user, ts) so tie-breaking is deterministic in
    * both engines.
    */
  private val q190 = GQ(
    "q190_asof_join",
    (s, dir) => {
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("value").as("p_value"))
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      // role 0 sorts purchases before clicks at identical ts (ASOF is <=)
      val tagged = purchases
        .select(col("user_id"), col("ts"), lit(0).as("__role"),
          col("p_value"), lit(null).cast("long").as("event_id"))
        .unionByName(clicks.select(col("user_id"), col("ts"),
          lit(1).as("__role"), lit(null).cast("double").as("p_value"),
          col("event_id")))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("__role"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("p_ts",
          last(when(col("__role") === 0, col("ts")), ignoreNulls = true).over(w))
        .withColumn("p_value_c", last(col("p_value"), ignoreNulls = true).over(w))
        .filter(col("__role") === 1)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("p_ts"), col("p_value_c").as("p_value"))
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT user_id, ts, max(value) AS p_value
                       FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
                 c AS (SELECT event_id, user_id, ts
                       FROM events WHERE event_type = 'click')
            SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts,
                   CAST(p.ts AS TIMESTAMP) AS p_ts, p.p_value
            FROM c ASOF LEFT JOIN p
              ON c.user_id = p.user_id AND p.ts <= c.ts
            ORDER BY event_id""")
  )

  /** Bucketed range join: per event, how many events of the same user fall
    * within ±1 hour. The build side is exploded to its 3 adjacent hour
    * buckets and the join is EQUI on (user, bucket) + a residual band
    * filter — candidate sets are bounded by bucket population, never the
    * full per-user history, so the plan stays shuffle-hash-joinable at any
    * scale (same pigeonhole idea the dedup family uses).
    */
  private val q191 = GQ(
    "q191_bucketed_range_join",
    (s, dir) => {
      val HourUs = 3600L * 1000 * 1000
      val e = ev(s, dir).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("epoch"))
      val probe = e.withColumn("hb", floor(col("epoch") / HourUs))
      val build = e.select(col("user_id").as("u2"), col("event_id").as("eid2"),
          col("epoch").as("epoch2"))
        .withColumn("hb", explode(array(
          floor(col("epoch2") / HourUs) - 1,
          floor(col("epoch2") / HourUs),
          floor(col("epoch2") / HourUs) + 1)))
      probe.join(build,
          probe("user_id") === build("u2") && probe("hb") === build("hb") &&
            abs(probe("epoch") - build("epoch2")) <= HourUs &&
            probe("event_id") =!= build("eid2"),
          "left")
        .groupBy("event_id").agg(count(col("eid2")).as("neighbors"))
        .orderBy("event_id")
    },
    Some("""SELECT e1.event_id, count(e2.event_id) AS neighbors
            FROM events e1 LEFT JOIN events e2
              ON e1.user_id = e2.user_id AND e2.event_id <> e1.event_id
             AND abs(epoch_us(e2.ts) - epoch_us(e1.ts)) <= 3600000000
            GROUP BY 1 ORDER BY 1""")
  )

  /** Approximate distinct counts: HLL++ (`approx_count_distinct`) and an
    * Apache DataSketches HLL sketch (`hll_sketch_agg` — partial-mergeable,
    * the 100-TB path: sketches combine across partitions/days without
    * re-scanning). Gate asserts both estimates land within 5% of the exact
    * count — the oracle states the property, Spark must satisfy it.
    */
  private val q192 = GQ(
    "q192_approx_distinct",
    (s, dir) => {
      val e = ev(s, dir)
      // exact side as distinct→count (two plain hash aggs; mixing exact
      // countDistinct INTO the sketch agg forces an EXPAND over the wide
      // HLL buffers — measured 5-10× slower), sketch side as one
      // ObjectHashAggregate, then a 5-row join
      val exact = e.select("event_type", "user_id").distinct()
        .groupBy("event_type").agg(count(lit(1)).as("exact_users"))
      val sk = e.groupBy("event_type").agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("__acd"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("__hll"))
      exact.join(sk, "event_type")
        .select(col("event_type"), col("exact_users"),
          (abs(col("__acd") - col("exact_users")) <=
            col("exact_users") * 0.05).as("approx_ok"),
          (abs(col("__hll") - col("exact_users")) <=
            col("exact_users") * 0.05).as("hll_ok"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
                   true AS approx_ok, true AS hll_ok
            FROM events GROUP BY 1 ORDER BY 1""")
  )

  /** Approximate percentiles: `percentile_approx` (KLL-style mergeable
    * quantile sketch) vs the exact interpolated percentile, asserted within
    * 0.5% relative error. Exact values are the hash-compared output; the
    * sketch quality is the gated property.
    */
  private val q193 = GQ(
    "q193_approx_percentile",
    (s, dir) => {
      val li = Tables.t(s, dir, "lineitem")
      // one exact + one sketch aggregation buffer (array percentiles),
      // not four separate ones
      li.groupBy("l_returnflag").agg(
          expr("percentile(l_extendedprice, array(0.5, 0.95))").as("__e"),
          expr("percentile_approx(l_extendedprice, array(0.5, 0.95), 10000)").as("__a"))
        .select(col("l_returnflag"),
          round(element_at(col("__e"), 1) + 1e-9, 2).as("median_price"),
          round(element_at(col("__e"), 2) + 1e-9, 2).as("p95_price"),
          (abs(element_at(col("__a"), 1) - element_at(col("__e"), 1)) <=
            element_at(col("__e"), 1) * 0.005).as("median_ok"),
          (abs(element_at(col("__a"), 2) - element_at(col("__e"), 2)) <=
            element_at(col("__e"), 2) * 0.005).as("p95_ok"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.5) + 1e-9, 2) AS median_price,
                   round(quantile_cont(l_extendedprice, 0.95) + 1e-9, 2) AS p95_price,
                   true AS median_ok, true AS p95_ok
            FROM lineitem GROUP BY 1 ORDER BY 1""")
  )

  /** Frequent-items sketch (`MisraGries`): heavy-hitter words of the
    * corpus via a bounded mergeable summary (the third mergeable sketch
    * next to q192 HLL and q193 percentile), then the two-pass exact
    * top-k — recount only the ≤capacity sketch candidates (broadcast
    * semi-join) so the emitted counts are exact and oracle-hashable.
    * MG guarantees every word with frequency > N/(capacity+1) is a
    * candidate — a DATA-dependent guarantee, so the gate AUDITS it
    * against the corpus it actually ran on (the driver regenerates
    * testdata per round): the 10th recounted frequency must exceed
    * N/(capacity+1), else a true top-10 word could have been evicted
    * and the "exact top-k" claim would be void — fail loudly instead.
    * Eviction-under-pressure behavior is pinned in MisraGriesSpec. */
  private val q228 = GQ(
    "q228_freq_items",
    (s, dir) => {
      import s.implicits._
      val w = corpusWords(s, dir)
      // ONE tokenize pass yields both the sketch and N (the audit bound);
      // the ≤capacity candidate set rides to the driver inside the row
      val row = mgSketchAgg(w).head()
      val cand = row.getMap[String, Long](0).keys.toSeq
      val n = row.getLong(1)
      // recount pass: exact counts for the bounded candidate set only
      // (isin literal — no join, no second driver round-trip); collected
      // so the audit AND the harness's consumption reuse the same rows
      // instead of re-running the pipeline per action
      val top = w.filter(col("word").isin(cand: _*))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("word")).limit(10)
        .as[(String, Long)].collect().toSeq
      // guarantee audit: every word above N/(capacity+1) is provably a
      // candidate, so the exact top-10 is safe iff the 10th recounted
      // count clears that bound on THIS corpus
      require(top.nonEmpty,
        "MG top-k audit needs a non-empty corpus (no words after tokenize)")
      val bound = n / 65.0
      val kth = top.map(_._2).min
      require(kth > bound,
        f"MG capacity 64 cannot guarantee exact top-10 on this corpus: " +
          f"10th frequency $kth <= N/(cap+1) = $bound%.1f — raise capacity")
      top.toDF("word", "cnt")
    },
    Some("""WITH w AS (SELECT UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS word
                       FROM documents)
            SELECT word, count(*) AS cnt FROM w WHERE word <> ''
            GROUP BY word ORDER BY cnt DESC, word LIMIT 10""")
  )

  /** Persisted sketch-rollup table: hourly HLL sketches of distinct
    * users materialized as a GraftTable (binary sketch column + event
    * count), then REOPENED and union-merged to daily estimates — the
    * pre-aggregation pattern that answers distinct-count questions over
    * any hour range without rescanning raw events. This is what makes
    * COUNT(DISTINCT) tractable at 100 TB: the raw table is read once at
    * rollup-build time; every later query touches only
    * rows ∝ hours × groups of kilobyte sketches, and sketches from new
    * hours append without rebuilding (mergeability = incremental
    * maintenance, the same contract as [[graft.tables.IncrementalMv]]
    * but for a non-distributive aggregate). Exact daily counts are the
    * hashed output; the merged estimate must land within HLL's 5%
    * (gated per row, q192 idiom). */
  private val q229 = GQ(
    "q229_sketch_rollup",
    (s, dir) => {
      val e = ev(s, dir)
      def hourly(part: DataFrame) =
        part.groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"), count(lit(1)).as("n"))
      // incremental maintenance: the rollup is built from the first part
      // of the stream and a later ingest APPENDS only its own hours'
      // sketches — mergeability means the union-merge over both batches
      // answers exactly as a from-scratch rollup (events are never
      // re-scanned; the cutoff is an event_id hash so both batches span
      // all hours and the merge genuinely combines sketches per day)
      val early = e.filter(pmod(col("event_id"), lit(5)) < 4)
      val late = e.filter(pmod(col("event_id"), lit(5)) === 4)
      val path = graft.queries.Scratch.dir("sketchroll")
      val t = graft.tables.GraftTable.create(s, path, hourly(early).schema)
      t.append(hourly(early), "SKETCH ROLLUP BUILD")
      t.append(hourly(late), "SKETCH ROLLUP INCREMENT")
      val daily = graft.tables.GraftTable.load(s, path).read()
        .groupBy(to_date(col("h")).as("day"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("__est"),
          sum(col("n")).as("n_events"))
      val exact = e.groupBy(to_date(col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      exact.join(daily, "day")
        .select(col("day"), col("exact_users"), col("n_events"),
          (abs(col("__est") - col("exact_users")) <=
            col("exact_users") * 0.05).as("rollup_ok"))
        .orderBy("day")
    },
    Some("""SELECT CAST(ts AS DATE) AS day,
                   count(DISTINCT user_id) AS exact_users,
                   count(*) AS n_events, true AS rollup_ok
            FROM events GROUP BY 1 ORDER BY 1""")
  )

  /** Within-document repetition filter (Gopher/C4-style quality rule):
    * distinct-word ratio and top-single-word frequency ratio per document.
    * Pure explode + two keyed aggregations — linear, no driver loops.
    */
  private val q194 = GQ(
    "q194_repetition_filter",
    (s, dir) => {
      val d = Tables.t(s, dir, "documents")
      val words = d.select(col("doc_id"),
          explode(split(col("text"), " ")).as("word"))
      val perWord = words.groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
      perWord.groupBy("doc_id").agg(
          sum("c").as("n_words"),
          count(lit(1)).as("n_distinct"),
          max("c").as("top_c"))
        .select(col("doc_id"), col("n_words"),
          round(col("n_distinct") / col("n_words") + 1e-9, 4).as("distinct_ratio"),
          round(col("top_c") / col("n_words") + 1e-9, 4).as("top_word_ratio"),
          (col("top_c") / col("n_words") > 0.1 ||
            col("n_distinct") / col("n_words") < 0.3).as("repetitious"))
        .orderBy("doc_id")
    },
    Some("""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                       FROM documents),
                 pw AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
                 agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                                count(*) AS n_distinct, max(c) AS top_c
                         FROM pw GROUP BY 1)
            SELECT doc_id, n_words,
                   round(n_distinct / n_words::DOUBLE + 1e-9, 4) AS distinct_ratio,
                   round(top_c / n_words::DOUBLE + 1e-9, 4) AS top_word_ratio,
                   (top_c / n_words::DOUBLE > 0.1
                     OR n_distinct / n_words::DOUBLE < 0.3) AS repetitious
            FROM agg ORDER BY doc_id""")
  )

  /** TF-IDF top term per document: explode → tf per (doc, term), df per
    * term, score = tf · ln(N/df), window top-1 (score desc, term asc).
    * Two shuffles (term agg + doc window); df table is broadcast-sized
    * relative to the corpus and the join key is the term — scales as a
    * standard map-side-combined aggregation pipeline.
    */
  private val q195 = GQ(
    "q195_tfidf_topterm",
    (s, dir) => {
      val d = Tables.t(s, dir, "documents")
      val n = d.count()
      val words = d.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf.join(df, "term")
        .withColumn("score", col("tf") * log(lit(n.toDouble) / col("df")))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term").asc)
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("term").as("top_term"),
          round(col("score") + 1e-9, 4).as("tfidf"))
        .orderBy("doc_id")
    },
    Some("""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                       FROM documents),
                 tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
                 df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
                 n AS (SELECT count(*)::DOUBLE AS n FROM documents),
                 scored AS (SELECT doc_id, term, tf * ln(n.n / df.df) AS score
                            FROM tf JOIN df USING (term), n),
                 ranked AS (SELECT doc_id, term, score, row_number() OVER
                              (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn
                            FROM scored)
            SELECT doc_id, term AS top_term, round(score + 1e-9, 4) AS tfidf
            FROM ranked WHERE rn = 1 ORDER BY doc_id""")
  )

  /** Cross-document boilerplate detection (substring-level dedup): the
    * fraction of a document's distinct 8-grams that appear in at least one
    * OTHER document. Gram-hash shuffle + two keyed aggregations — the
    * linear-scan alternative to suffix-array dedup, and the standard
    * "remove shared boilerplate spans" pass in training-data pipelines.
    * Corpus = documents ∪ mutated near-copies (as the dedup family gates). */
  private val q197 = GQ(
    "q197_boilerplate_ngrams",
    (s, dir) => {
      val d = Tables.t(s, dir, "documents").select("doc_id", "text")
      val corpus = d.unionAll(
        d.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" extra token extra2")).as("text")))
      val words = corpus
        .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("w"))
        .filter(size(col("w")) >= 8)
      // grams hashed to int64 at birth (as DedupOps.shingleTable): the
      // distinct, the doc-frequency group-by, and the join all move 8-byte
      // longs instead of ~40-byte strings — counts/ratios are unchanged up
      // to 64-bit collisions
      val grams = words.select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(w) - 8), i -> xxhash64(concat_ws(' ', slice(w, i + 1, 8))))"))
          .as("g"))
        .distinct()
      val docFreq = grams.groupBy("g").agg(countDistinct(col("doc_id")).as("nd"))
      grams.join(docFreq, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("nd") >= 2, 1).otherwise(0)).cast("long").as("n_shared"))
        .select(col("doc_id"), col("n_grams"), col("n_shared"),
          round(col("n_shared") / col("n_grams") + 1e-9, 4).as("shared_ratio"))
        .orderBy("doc_id")
    },
    Some("""WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text || ' extra token extra2'
              FROM documents WHERE doc_id % 20 = 0),
            words AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') w
                      FROM corpus),
            grams AS (SELECT DISTINCT doc_id,
                        w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' ||
                        w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] || ' ' || w[i+8] AS g
                      FROM words, UNNEST(range(greatest(len(w) - 7, 0))) AS t(i)),
            sh AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY 1)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
                   round(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*) + 1e-9, 4)
                     AS shared_ratio
            FROM grams JOIN sh USING (g)
            GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Window-function extension coverage (SURVEY.md §2.6 "RANGE frames /
    * ntile / lead / lag: not used — available natively"): lag/lead
    * neighbors, an interval RANGE frame (trailing 1-hour sum, integer
    * epoch bounds so both engines frame identically), and ntile quartiles
    * within each user's timeline. */
  private val q198 = GQ(
    "q198_window_extensions",
    (s, dir) => {
      val HourUs = 3600L * 1000 * 1000
      val e = ev(s, dir)
        .select(col("event_id"), col("user_id"), col("value"),
          unix_micros(col("ts")).as("us"))
      val wOrd = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val wRange = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-HourUs, 0)
      e.select(col("event_id"),
          lag("value", 1).over(wOrd).as("prev_value"),
          lead("value", 1).over(wOrd).as("next_value"),
          round(sum("value").over(wRange) + 1e-9, 2).as("hour_sum"),
          ntile(4).over(wOrd).as("quartile"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
              lag(value) OVER w AS prev_value,
              lead(value) OVER w AS next_value,
              round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) + 1e-9, 2)
                AS hour_sum,
              CAST(ntile(4) OVER w AS INTEGER) AS quartile
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            ORDER BY event_id""")
  )

  /** Deterministic train/val/test split: multiplicative (Knuth) hash of the
    * stable document id → bucket 0-99 → 80/10/10 split. Hash-based (not
    * random) so the assignment is reproducible across reprocessing runs and
    * engines, needs no coordination, and stays stable when the corpus
    * grows — the standard split discipline for training corpora. Pure
    * projection: zero shuffle at any scale. */
  private val q199 = GQ(
    "q199_hash_split",
    (s, dir) => Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        (((col("doc_id") * lit(2654435761L)) % lit(4294967296L)) % 100).as("bucket"))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
              ((doc_id * 2654435761) % 4294967296) % 100 AS bucket,
              CASE WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
                   WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
                   ELSE 'test' END AS split
            FROM documents ORDER BY doc_id""")
  )

  /** Eval-set decontamination: flag training documents sharing any 5-gram
    * with the held-out eval slice (doc_id % 50 = 0). Gram containment —
    * not similarity — is the published decontamination rule (n-gram overlap
    * with benchmark data). Grams ride the int64-hashed shingle table, the
    * eval gram set is distinct-reduced before the join (broadcastable:
    * eval sets are tiny next to the corpus), so cost is one keyed join on
    * an 8-byte key, linear in corpus grams. */
  private val q200 = GQ(
    "q200_decontamination",
    (s, dir) => {
      val grams = graft.text.DedupOps.shingleTable(
        Tables.t(s, dir, "documents").select("doc_id", "text"), 5)
      val evalGrams = grams.filter(col("doc_id") % 50 === 0)
        .select("shingle").distinct()
      val train = grams.filter(col("doc_id") % 50 =!= 0)
      val hits = train.join(evalGrams, Seq("shingle"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("__nc"))
      train.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("__nc"), lit(0L)).as("n_shared"),
          round(coalesce(col("__nc"), lit(0L)) / col("n_grams") + lit(1e-9), 4)
            .as("contamination"),
          (coalesce(col("__nc"), lit(0L)) > 0).as("contaminated"))
        .orderBy("doc_id")
    },
    Some("""WITH words AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') w
                           FROM documents),
                 grams AS (SELECT DISTINCT doc_id,
                             w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' '
                               || w[i+4] || ' ' || w[i+5] AS g
                           FROM words, UNNEST(range(greatest(len(w) - 4, 0))) AS t(i)),
                 ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
                 tr AS (SELECT * FROM grams WHERE doc_id % 50 <> 0),
                 tot AS (SELECT doc_id, count(*) AS n_grams FROM tr GROUP BY 1),
                 hit AS (SELECT doc_id, count(*) AS nc
                         FROM tr WHERE g IN (SELECT g FROM ev) GROUP BY 1)
            SELECT t.doc_id, t.n_grams,
                   CAST(coalesce(h.nc, 0) AS BIGINT) AS n_shared,
                   round(coalesce(h.nc, 0) / t.n_grams::DOUBLE + 1e-9, 4)
                     AS contamination,
                   coalesce(h.nc, 0) > 0 AS contaminated
            FROM tot t LEFT JOIN hit h USING (doc_id) ORDER BY doc_id""")
  )

  /** Domain-mixture weighting: temperature-scaled (α = 0.5) sampling
    * weights per language — w_d ∝ n_d^α — with the resulting up/down-
    * sampling factor vs the natural proportion. One tiny aggregate (rows =
    * number of domains) joined back against its own grand total: the
    * domain table is always driver-size, so the whole computation is two
    * map-side-combined aggregations regardless of corpus size. */
  private val q201 = GQ(
    "q201_domain_mixture",
    (s, dir) => {
      val counts = Tables.t(s, dir, "documents")
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      val tot = counts.agg(
        sum(sqrt(col("n_docs"))).as("__z"), sum(col("n_docs")).as("__n"))
      counts.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"),
          round(sqrt(col("n_docs")) / col("__z") + lit(1e-9), 6).as("weight"),
          round((sqrt(col("n_docs")) / col("__z")) /
            (col("n_docs") / col("__n")) + lit(1e-9), 4).as("sampling_factor"))
        .orderBy("lang")
    },
    Some("""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
                 t AS (SELECT sum(sqrt(n_docs)) AS z, sum(n_docs)::DOUBLE AS n FROM c)
            SELECT lang, n_docs,
                   round(sqrt(n_docs) / z + 1e-9, 6) AS weight,
                   round((sqrt(n_docs) / z) / (n_docs / n) + 1e-9, 4)
                     AS sampling_factor
            FROM c, t ORDER BY lang""")
  )

  /** Sequence packing (`CorpusOps.packSequences`): concat-and-chunk token
    * spans via a distributed prefix sum — quantile-bucketed running sums
    * plus broadcast bucket offsets, never a global single-partition
    * window. The oracle IS the global window (fine at DuckDB scale). */
  private val q205 = GQ(
    "q205_pack_sequences",
    (s, dir) => {
      val d = Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          graft.text.TextOps.tokenCountWs(col("text")).as("n_tokens"))
      graft.text.CorpusOps.packSequences(d, 1000).orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id,
                         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
                       FROM documents),
                 p AS (SELECT doc_id, n_tokens,
                         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                           AS tok_start
                       FROM d)
            SELECT doc_id, n_tokens, tok_start,
                   tok_start // 1000 AS seq_first,
                   (tok_start + n_tokens - 1) // 1000 AS seq_last,
                   (tok_start + n_tokens - 1) // 1000 - tok_start // 1000 + 1 AS n_seqs
            FROM p ORDER BY doc_id""")
  )

  /** Stratified sampling (`CorpusOps.stratifiedSample`): the xxhash64
    * selection itself is engine-specific, so the gate checks the sampling
    * CONTRACT — every stratum yields exactly ceil(fraction * size) rows —
    * while determinism/type handling is spec-covered (CorpusOpsSpec). */
  private val q206 = GQ(
    "q206_stratified_sample",
    (s, dir) => graft.text.CorpusOps.stratifiedSample(
        Tables.t(s, dir, "documents"), "lang", 0.2)
      .groupBy("lang")
      .agg(max("n_stratum").as("n_stratum"), count(lit(1)).as("n_sampled"))
      .orderBy("lang"),
    Some("""SELECT lang, count(*) AS n_stratum,
                   CAST(ceil(count(*) * 0.2) AS BIGINT) AS n_sampled
            FROM documents GROUP BY lang ORDER BY lang""")
  )

  /** Vocabulary coverage (`CorpusOps.vocabCoverage`): top-50 word
    * frequencies with rank and cumulative token share. */
  private val q207 = GQ(
    "q207_vocab_coverage",
    (s, dir) => graft.text.CorpusOps.vocabCoverage(
      Tables.t(s, dir, "documents"), "text", 50).orderBy("rank"),
    Some("""WITH w AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
                       FROM documents),
                 c AS (SELECT word, count(*) AS n FROM w
                       WHERE len(word) > 0 GROUP BY 1),
                 r AS (SELECT word, n,
                         CAST(row_number() OVER (ORDER BY n DESC, word) AS INTEGER) AS rank,
                         CAST(sum(n) OVER (ORDER BY n DESC, word
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum,
                         CAST(sum(n) OVER () AS DOUBLE) AS tot
                       FROM c)
            SELECT word, n, rank, round(cum / tot + 1e-9, 6) AS cum_share
            FROM r WHERE rank <= 50 ORDER BY rank""")
  )

  /** Overlapping token-window chunking (`CorpusOps.chunkTokens`): the
    * RAG-ingestion / long-document pretraining primitive — window 20,
    * stride 15, tail chunk kept short, chunk content pinned by md5. The
    * oracle replays tokenize → window arithmetic → slice → rejoin → md5
    * in SQL, so an off-by-one in the window math, a dropped tail, or a
    * slice misalignment hash-mismatches. Pure narrow projection
    * (no shuffle) — spec-pinned edge cases in ChunkSpec. */
  private val q219 = GQ(
    "q219_doc_chunks",
    (s, dir) => graft.text.CorpusOps.chunkTokens(
        Tables.t(s, dir, "documents"), window = 20, stride = 15)
      .orderBy("doc_id", "chunk_idx"),
    Some("""WITH toks AS (SELECT doc_id,
                            string_split_regex(text, '\s+') AS w
                          FROM documents),
                 n AS (SELECT doc_id, w, len(w) AS n FROM toks),
                 c AS (SELECT doc_id, w,
                         CAST(t.i AS INTEGER) AS chunk_idx
                       FROM n, UNNEST(range((greatest(n - 20, 0) + 14) // 15 + 1)) AS t(i))
            SELECT doc_id, chunk_idx,
                   chunk_idx * 15 AS chunk_start,
                   CAST(len(w[chunk_idx * 15 + 1 : chunk_idx * 15 + 20]) AS INTEGER)
                     AS n_chunk_tokens,
                   md5(array_to_string(w[chunk_idx * 15 + 1 : chunk_idx * 15 + 20], ' '))
                     AS chunk_hash
            FROM c ORDER BY doc_id, chunk_idx""")
  )

  /** Token-budget mixture materialization (`CorpusOps.sampleToBudget`):
    * the q201 temperature-scaled weights sized to a 50k-token run, then
    * per-domain deterministic hash-order selection until each domain's
    * budget is crossed. The oracle replays the whole chain — weight
    * computation, floor-sized budgets, the multiplicative-hash selection
    * order, the running token sum, and the keep-the-crossing-doc rule —
    * so a drifted weight, a reordered pick, or an off-by-one at the
    * budget line changes the selected set and hash-mismatches. */
  private val q224 = GQ(
    "q224_budget_mixture",
    (s, dir) => {
      val d = Tables.t(s, dir, "documents")
      val counts = d.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      val tot = counts.agg(sum(sqrt(col("n_docs"))).as("__z"))
      val budgets = counts.crossJoin(broadcast(tot))
        .select(col("lang"),
          floor(round(sqrt(col("n_docs")) / col("__z") + lit(1e-9), 6)
            * 50000).cast("long").as("budget"))
      graft.text.CorpusOps.sampleToBudget(d, budgets)
        .orderBy("lang", "cum_tokens", "doc_id")
    },
    Some("""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
                 t AS (SELECT sum(sqrt(n_docs)) AS z FROM c),
                 b AS (SELECT lang,
                         CAST(floor(round(sqrt(n_docs) / z + 1e-9, 6) * 50000)
                           AS BIGINT) AS budget
                       FROM c, t),
                 d AS (SELECT doc_id, lang,
                         CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                           AS BIGINT) AS n_tokens,
                         (doc_id * 2654435761) % 4294967296 AS h
                       FROM documents),
                 r AS (SELECT d.doc_id, d.lang, d.n_tokens, b.budget,
                         CAST(sum(n_tokens) OVER (PARTITION BY d.lang
                           ORDER BY h, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS BIGINT) AS cum_tokens
                       FROM d JOIN b USING (lang))
            SELECT doc_id, lang, n_tokens, cum_tokens
            FROM r WHERE cum_tokens - n_tokens < budget
            ORDER BY lang, cum_tokens, doc_id""")
  )

  /** Corpus statistical-health report (`CorpusOps.corpusHealth`): the
    * per-domain release dashboard — token/type counts, type-token ratio,
    * the Zipf slope (OLS of ln(freq) on ln(rank) over the top-100
    * words; template spam collapses it toward 0, degenerate vocabulary
    * dives past −2), and exact interpolated p50/p95 document lengths.
    * One token scan feeds everything; the word-count shuffle is
    * vocabulary-bounded; percentiles use the q37 rank-window straddle
    * (spillable) instead of Spark's buffering percentile aggregate. The
    * oracle recomputes counts, ranks, the regression, and quantile_cont
    * in SQL. */
  private val q264 = GQ(
    "q264_corpus_health",
    (s, dir) => graft.text.CorpusOps.corpusHealth(
        Tables.t(s, dir, "documents")).orderBy("lang"),
    Some("""WITH docs AS (SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS ws
                          FROM documents),
            tok AS (SELECT lang, doc_id, ws[CAST(t.i AS INT) + 1] AS word
                    FROM docs, UNNEST(range(len(ws))) AS t(i)
                    WHERE len(ws[CAST(t.i AS INT) + 1]) > 0),
            c AS (SELECT lang, word, count(*) AS n FROM tok GROUP BY 1, 2),
            r AS (SELECT lang, n, row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rank
                  FROM c),
            z AS (SELECT lang, regr_slope(ln(n), ln(rank)) AS slope
                  FROM r WHERE rank <= 100 GROUP BY 1),
            s AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens,
                         CAST(count(*) AS BIGINT) AS n_types
                  FROM c GROUP BY 1),
            dl AS (SELECT lang, doc_id, count(*) AS dn FROM tok GROUP BY 1, 2),
            q AS (SELECT lang, quantile_cont(dn, 0.5) AS p50, quantile_cont(dn, 0.95) AS p95
                  FROM dl GROUP BY 1)
            SELECT s.lang, s.n_tokens, s.n_types,
                   round(CAST(s.n_types AS DOUBLE) / s.n_tokens + 1e-9, 6) AS ttr,
                   round(z.slope + 1e-9, 4) AS zipf_slope,
                   round(q.p50 + 1e-9, 4) AS p50_len,
                   round(q.p95 + 1e-9, 4) AS p95_len
            FROM s JOIN z ON z.lang = s.lang JOIN q ON q.lang = s.lang
            ORDER BY s.lang""")
  )

  /** Weighted sampling without replacement (`CorpusOps.weightedSample`,
    * Efraimidis–Spirakis exponential race): docs drawn proportional to
    * `n_chars`. The uniform derives from md5 of the id — engine-portable
    * — so the oracle recomputes the EXACT race keys and the same top-50
    * must fall out of both engines: a biased key, a dropped
    * zero-weight guard, or a broken hex→uniform mapping changes the
    * selected set and hash-mismatches. Plans as TakeOrderedAndProject
    * (plan-audited), never a global sort. */
  private val q274 = GQ(
    "q274_weighted_sample",
    (s, dir) => graft.text.CorpusOps.weightedSample(
        Tables.t(s, dir, "documents").select("doc_id", "n_chars"),
        "n_chars", 50)
      .select(col("doc_id"), col("n_chars"),
        round(col("sample_key") + lit(1e-9), 6).as("sample_key"))
      .orderBy(desc("sample_key"), col("doc_id")),
    Some("""WITH keyed AS (
              SELECT doc_id, n_chars,
                     ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 0.5)
                        / 4294967296.0) / n_chars AS k
              FROM documents WHERE n_chars > 0)
            SELECT doc_id, n_chars, round(k + 1e-9, 6) AS sample_key
            FROM keyed ORDER BY k DESC, doc_id LIMIT 50""")
  )

  /** Quality-threshold calibration against a token budget
    * (`CorpusOps.qualityCutoff`): the highest quality cutoff whose kept
    * documents carry ≥ 10,000 tokens — deriving the filter constant
    * FROM the budget instead of hand-tuning it. The oracle replays
    * score quantization (q71's expression), the per-score rollup, the
    * descending cumulative sums, and the crossing-point pick; a
    * fencepost anywhere (≥ vs >, cumsum alignment, budget > total
    * clamping) shifts the one output row. */
  private val q276 = GQ(
    "q276_quality_budget_cutoff",
    (s, dir) => graft.text.CorpusOps.qualityCutoff(
      Tables.t(s, dir, "documents").select(
        graft.text.TextOps.qualityScore(col("text")).as("q"),
        graft.text.TextOps.tokenCountWs(col("text")).cast("long").as("ntok")),
      "q", "ntok", budget = 10000L),
    Some("""WITH d AS (SELECT
              round(
                least(len(string_split_regex(lower(trim(text)), '\s+')) / 50.0, 1.0) * 0.4
              + (1.0 - least(((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                              / greatest(length(text)::DOUBLE, 1.0)) * 10.0, 1.0)) * 0.3
              + ((CASE WHEN ' '||lower(text)||' ' LIKE '% the %' THEN 1 ELSE 0 END
                + CASE WHEN ' '||lower(text)||' ' LIKE '% and %' THEN 1 ELSE 0 END
                + CASE WHEN ' '||lower(text)||' ' LIKE '% of %' THEN 1 ELSE 0 END
                + CASE WHEN ' '||lower(text)||' ' LIKE '% to %' THEN 1 ELSE 0 END
                + CASE WHEN ' '||lower(text)||' ' LIKE '% in %' THEN 1 ELSE 0 END) / 5.0) * 0.3
              + 1e-9, 4) AS q,
              len(string_split_regex(lower(trim(text)), '\s+')) AS ntok
            FROM documents),
            b AS (SELECT q AS score, count(*) AS n_docs, sum(ntok) AS n_tokens
                  FROM d GROUP BY 1),
            c AS (SELECT score,
                         sum(n_docs) OVER w AS cum_docs,
                         sum(n_tokens) OVER w AS cum_tokens
                  FROM b
                  WINDOW w AS (ORDER BY score DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            t AS (SELECT max(cum_tokens) AS total FROM c)
            SELECT c.score AS cutoff,
                   CAST(c.cum_docs AS BIGINT) AS kept_docs,
                   CAST(c.cum_tokens AS BIGINT) AS kept_tokens,
                   CAST(t.total AS BIGINT) AS total_tokens
            FROM c, t
            WHERE c.cum_tokens >= least(10000, t.total)
            ORDER BY c.score DESC LIMIT 1""")
  )

  override def queries: Seq[GQ] =
    Seq(q190, q191, q192, q193, q194, q195, q197, q198, q199, q200, q201,
      q205, q206, q207, q219, q224, q228, q229, q264, q274, q276)
}
