package graft

import graft.pipeline.Unigram
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  def corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the rat"),
    (3L, "a cat and a rat sat"),
    (4L, "the the the cat cat")
  ).toDF("doc_id", "text")

  test("seedPieces: hand-computed substring counts weighted by type frequency") {
    val pc = Unigram.seedPieces(corpus, maxPieceLen = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // word occurrences: the×7, cat×5, sat×2, on×1, mat×1, ate×1,
    // rat×2, a×2, and×1
    assert(pc("the") == 7L)
    assert(pc("cat") == 5L)
    assert(pc("at") == 5L + 2L + 1L + 1L + 2L) // cat sat mat ate rat
    assert(pc("a") == 5L + 2L + 1L + 1L + 2L + 2L + 1L) // + the word "a", and
    assert(pc("t") == 7L + 5L + 2L + 1L + 1L + 2L) // the cat sat mat ate rat
  }

  test("seedVocab: coverage chars always kept, multi-char top-K deterministic, scores integral") {
    val v = Unigram.seedVocab(corpus, vocabSize = 12, maxPieceLen = 3, minFreq = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val chars = v.filter(_._1.length == 1).map(_._1).toSet
    // every character of the corpus survives pruning
    assert(chars == "thecasonmtrd".toSet.map((c: Char) => c.toString))
    val multi = v.filter(_._1.length > 1)
    assert(v.length == 12 && multi.length == 12 - chars.size)
    // multi pieces are the global top by (cnt desc, piece asc)
    val all = Unigram.seedPieces(corpus, 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .filter(p => p._1.length > 1 && p._2 >= 2)
      .sortBy(p => (-p._2, p._1)).take(multi.length).toSet
    assert(multi.map(p => (p._1, p._2)).toSet == all)
    // integral scores: floor(Scale*cnt/total) exactly
    val total = v.map(_._2).sum
    v.foreach { case (p, c, s) =>
      val expect = (BigInt(c) * Unigram.Scale / total).toLong
      assert(s == (if (p.length == 1) math.max(1L, expect) else expect),
        s"piece $p cnt $c score $s expect $expect")
    }
  }

  test("train: deterministic across runs and parallelism; vocab bounded; chars survive EM") {
    val a = Unigram.train(corpus, vocabSize = 14, rounds = 2, maxPieceLen = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Unigram.train(corpus.repartition(7), vocabSize = 14, rounds = 2, maxPieceLen = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b), "training not partition-independent")
    assert(a.length <= 14)
    val chars = a.filter(_._1.length == 1).map(_._1).toSet
    assert(chars == "thecasonmtrd".toSet.map((c: Char) => c.toString),
      s"EM dropped coverage chars: $chars")
  }

  test("encode: pieces concatenate back to the words; memo path consistent") {
    val model = Unigram.vocabSeq(
      Unigram.train(corpus, vocabSize = 15, rounds = 1, maxPieceLen = 3))
    val out = corpus
      .select(col("doc_id"), Unigram.encode(model, col("text"), 3).as("pieces"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    corpus.collect().foreach { r =>
      val words = r.getString(1).trim.toLowerCase.split("\\W+").filter(_.nonEmpty)
      assert(out(r.getLong(0)).mkString == words.mkString,
        s"doc ${r.getLong(0)}: pieces don't rebuild the text")
    }
  }

  test("encode: unknown characters become their own piece instead of failing") {
    val model = Unigram.vocabSeq(Unigram.train(corpus, vocabSize = 10, rounds = 1))
    val got = spark.range(1).select(
      Unigram.encode(model, lit("zebra! cat"), 4).as("p"))
      .head().getSeq[String](0)
    assert(got.mkString == "zebracat", s"got $got")
  }

  test("high-frequency multi-char pieces win the segmentation over chars") {
    // 'the' dominates the corpus; a trained model should tokenize
    // "the" as the single piece, not t-h-e
    val model = Unigram.vocabSeq(
      Unigram.train(corpus, vocabSize = 15, rounds = 2, maxPieceLen = 3))
    assert(model.exists(_._1 == "the"))
    val got = spark.range(1).select(
      Unigram.encode(model, lit("the"), 3).as("p")).head().getSeq[String](0)
    assert(got == Seq("the"), s"got $got")
  }
}
