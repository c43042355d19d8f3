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

  test("chunking is a shuffle-free scan projection") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val p = CdcChunk.chunks(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }
}
