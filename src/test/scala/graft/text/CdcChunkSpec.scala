package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Content-defined chunking semantics: boundary rule, span math,
  * re-synchronization after an edit, degenerate docs, and the shared-
  * chunk pair report. */
class CdcChunkSpec extends SparkTestBase {
  import spark.implicits._

  private def chunksOf(text: String): Seq[(Int, String)] =
    CdcChunk.chunks(Seq((1L, text)).toDF("doc_id", "text"))
      .orderBy("chunk_id")
      .select("chunk_id", "chunk").as[(Int, String)].collect().toSeq

  /** The engine's own boundary rule, recomputed locally. */
  private def isBoundary(tok: String, every: Int = 8, residue: Int = 3): Boolean = {
    var h = 0L
    tok.getBytes("UTF-8").foreach(b => h = (h * 31L + (b & 0xffL)) & ((1L << 56) - 1))
    h % every == residue
  }

  test("chunks split exactly at boundary tokens; concatenation reconstructs the doc") {
    val words = (1 to 60).map(i => s"tok$i")
    val text = words.mkString(" ")
    val got = chunksOf(text)
    assert(got.map(_._2).mkString(" ") == text, "chunks must tile the doc")
    // every chunk's LAST token is a boundary, except possibly the final
    // chunk's; no interior token is
    got.dropRight(1).foreach { case (_, c) =>
      val toks = c.split(" ")
      assert(isBoundary(toks.last), s"chunk '$c' must end at a boundary")
      toks.dropRight(1).foreach(t =>
        assert(!isBoundary(t), s"interior token '$t' must not be a boundary"))
    }
    assert(got.map(_._1) == got.indices.map(identity), "chunk ids dense from 0")
  }

  test("prepending one token only perturbs chunks up to the first boundary") {
    val words = (1 to 60).map(i => s"tok$i")
    val base = chunksOf(words.mkString(" ")).map(_._2)
    val shifted = chunksOf(("zzshifted" +: words).mkString(" ")).map(_._2)
    // everything after the first boundary re-synchronizes
    if (isBoundary("zzshifted"))
      assert(shifted == "zzshifted" +: base,
        "a boundary edit token cuts immediately; every base chunk survives")
    else
      assert(shifted.head == s"zzshifted ${base.head}" &&
        shifted.tail == base.tail,
        "the edit is absorbed by the first chunk only")
  }

  test("degenerate docs: no boundary = one chunk; trailing boundary drops the empty span; null/blank yield no rows") {
    val nonB = (1 to 5).map(i => s"tok$i").filterNot(isBoundary(_))
    assert(chunksOf(nonB.mkString(" ")).map(_._2) == Seq(nonB.mkString(" ")))
    val b = (1 to 200).map(i => s"tok$i").find(isBoundary(_)).get
    // doc ending exactly at a boundary: no empty trailing chunk
    val got = chunksOf(s"${nonB.head} $b")
    assert(got.map(_._2) == Seq(s"${nonB.head} $b"))
    val empty = CdcChunk.chunks(
      Seq((1L, null: String), (2L, "   ")).toDF("doc_id", "text"))
    assert(empty.isEmpty)
  }

  test("sharedChunks pairs docs by distinct shared hashes with totals") {
    val words = (1 to 60).map(i => s"tok$i")
    val df = Seq(
      1L -> words.mkString(" "),
      2L -> ("zzshifted " + words.mkString(" ")),
      3L -> "lonely doc entirely different").toDF("doc_id", "text")
    val ch = CdcChunk.chunks(df)
    val pairs = CdcChunk.sharedChunks(ch, minShared = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)), s"got $pairs")
    val n1 = ch.filter(col("doc_id") === 1).count()
    assert(pairs.head._3 == n1 - 1, "all but the absorbed first chunk shared")
  }

  test("hot-chunk ceiling drops mega-template chunks from the pair join") {
    // a planted template chunk shared by EVERY doc (the boilerplate
    // header hazard: f docs sharing one chunk is f·(f−1)/2 pairs) plus
    // genuinely-shared tails between docs 1 and 2 only. The template
    // ENDS AT A BOUNDARY token so it chunks identically in every doc;
    // docs 3/4 get disjoint all-non-boundary bodies (one chunk each,
    // never shared).
    val words = (1 to 60).map(i => s"tok$i")
    val hdrB = (1 to 200).map(i => s"hdr$i").find(isBoundary(_)).get
    val hdrNb = (1 to 200).map(i => s"hdr$i").filterNot(isBoundary(_)).take(3)
    val template = (hdrNb :+ hdrB).mkString(" ")
    val body3 = (1 to 200).map(i => s"ca$i").filterNot(isBoundary(_)).take(4).mkString(" ")
    val body4 = (1 to 200).map(i => s"fi$i").filterNot(isBoundary(_)).take(4).mkString(" ")
    val df = Seq(
      1L -> s"$template ${words.mkString(" ")}",
      2L -> s"$template zz ${words.mkString(" ")}",
      3L -> s"$template $body3",
      4L -> s"$template $body4").toDF("doc_id", "text")
    val ch = CdcChunk.chunks(df)
    // find the hash(es) every doc shares — the template head chunk(s)
    val hot = CdcChunk.hotChunks(ch, maxDocsPerChunk = 3)
    assert(hot.count() >= 1, "the planted template chunk must be hot")
    // ceiling 3 < 4 docs: template-only pairs (1,3),(1,4),(2,3),(2,4),
    // (3,4) vanish; the tok-tail overlap keeps (1,2) alive
    val capped = CdcChunk.sharedChunks(ch, minShared = 1, maxDocsPerChunk = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(capped.map(p => (p._1, p._2)) == Seq((1L, 2L)), s"got $capped")
    // totals keep counting the FULL chunk inventory (pre-ceiling)
    val n1 = ch.filter(col("doc_id") === 1).count()
    assert(capped.head._4 == n1, "n_chunks_1 must count the doc's full inventory")
    // default ceiling (10000) leaves small corpora untouched: same pairs
    // as an uncapped report, template pairs included
    val dflt = CdcChunk.sharedChunks(ch, minShared = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(dflt.map(p => (p._1, p._2)).toSet ==
      Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("sharedChunks construction is lazy: no job runs until an action") {
    // the hot-chunk exclusion used to run an eager count() at
    // DataFrame-construction time (review finding) — build the report
    // over a source that THROWS when scanned: construction must
    // succeed (no action), and only the later action surfaces the error
    val boom = udf((s: String) => {
      if (s != null) throw new RuntimeException("boom"); s })
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
      .withColumn("text", boom(col("text")))
    val pairs = CdcChunk.sharedChunks(CdcChunk.chunks(docs)) // must not throw
    val e = intercept[Exception](pairs.count())
    assert(e.getMessage != null)
  }

  test("chunking is a shuffle-free scan projection") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val p = CdcChunk.chunks(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }
}
