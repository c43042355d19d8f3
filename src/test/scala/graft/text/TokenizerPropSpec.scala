package graft.text

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Randomized properties for the round-15 text operators, exploring the
  * input space the scripted specs and the synthetic-corpus gates can't
  * enumerate: Aho–Corasick counts vs a brute-force position scan,
  * tokenizer concatenation identities, and BPE encode/training
  * agreement on random dictionaries. */
class TokenizerPropSpec extends SparkTestBase {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // small alphabet so matches, overlaps, and shared prefixes are dense
  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  test("Blocklist counts equal brute-force position enumeration (200 random cases)") {
    for (seed <- 0 until 200) {
      val phrases = sample(Gen.choose(1, 6)
        .flatMap(k => Gen.listOfN(k, word)), seed).distinct
      val text = sample(Gen.choose(0, 40)
        .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' '))), seed + 1000)
        .mkString
      val a = Blocklist.build(phrases)
      val got = a.phrases.zip(a.countMatches(text)).toMap
      phrases.foreach { p =>
        val brute = (0 to text.length - p.length)
          .count(i => text.regionMatches(i, p, 0, p.length)).toLong
        assert(got(p) == brute,
          s"seed=$seed phrase='$p' text='$text': got ${got(p)}, brute $brute")
      }
    }
  }

  test("subword greedy tokens always concatenate back to the word") {
    for (seed <- 0 until 200) {
      val w = sample(word, seed)
      val vocab = sample(Gen.listOfN(5, Gen.choose(2, 4)
        .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))),
        seed + 5000).toSet
      val toks = Subword.tokenizeWord(w, vocab)
      assert(toks.mkString == w, s"seed=$seed '$w' -> $toks")
      assert(toks.forall(t => t.length == 1 || vocab.contains(t)))
    }
  }

  test("BPE: encode tokens concatenate back; training segmentation reachable") {
    for (seed <- 0 until 100) {
      val dict = sample(Gen.choose(2, 8)
        .flatMap(k => Gen.listOfN(k, word)), seed)
        .distinct.map(w => w -> (1L + seed % 5))
      val merges = Bpe.trainFromDict(dict, nMerges = 4)
      val ranks = merges.zipWithIndex
        .map { case (m, i) => (m.left, m.right) -> i }.toMap
      // training replay word-by-word
      var segs = dict.map { case (w, _) => w -> w.map(_.toString).toVector }
      merges.foreach { m =>
        segs = segs.map { case (w, s) => w -> Bpe.mergePass(s, m.left, m.right) }
      }
      segs.foreach { case (w, trained) =>
        val enc = Bpe.applyToWord(w, ranks)
        assert(enc.mkString == w, s"seed=$seed '$w' -> $enc")
        assert(trained.mkString == w)
        // on 4-merge tables over a 3-char alphabet the rank-order encode
        // and the training segmentation must agree (the divergence case
        // needs a later merge re-creating an earlier pair's token string,
        // impossible at this depth with distinct merges)
        assert(enc == trained, s"seed=$seed '$w': enc $enc vs trained $trained")
      }
    }
  }

  test("BPE: incremental trainer equals the recount reference on random dicts") {
    // the delta-update bookkeeping (pair counts, pair->words index,
    // stale-entry removal) has exactly the failure modes random dicts
    // surface: shared subwords, overlap chains, pairs whose counts hit
    // zero mid-training
    for (seed <- 0 until 150) {
      val dict = sample(Gen.choose(2, 10)
        .flatMap(k => Gen.listOfN(k, word)), seed)
        .distinct.map(w => w -> (1L + (seed * 7 + w.length) % 5))
      val n = 1 + seed % 12
      assert(Bpe.trainFromDict(dict, n) == Bpe.trainFromDictRecount(dict, n),
        s"seed=$seed dict=$dict nMerges=$n")
    }
  }

  test("CDC chunks tile every random document and re-synchronize after a prepend") {
    for (seed <- 0 until 60) {
      import spark.implicits._
      val words = sample(Gen.choose(1, 40)
        .flatMap(n => Gen.listOfN(n, word)), seed + 9000)
      val text = words.mkString(" ")
      val chunks = CdcChunk.chunks(Seq((1L, text)).toDF("doc_id", "text"))
        .orderBy("chunk_id").select("chunk").as[String].collect().toSeq
      assert(chunks.mkString(" ") == text.toLowerCase,
        s"seed=$seed chunks must tile '$text'")
      val shifted = CdcChunk.chunks(
          Seq((1L, "zz " + text)).toDF("doc_id", "text"))
        .orderBy("chunk_id").select("chunk").as[String].collect().toSeq
      // all chunks after the first boundary survive the one-token edit
      assert(chunks.tail.forall(shifted.contains),
        s"seed=$seed resync failed: $chunks vs $shifted")
    }
  }
}
