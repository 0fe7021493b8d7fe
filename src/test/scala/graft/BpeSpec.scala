package graft

import graft.pipeline.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("train learns the hand-derived merge sequence and stops when pairs dry up") {
    // types: aaab ×3, ab ×1. Pair counts (all adjacent positions,
    // weighted by word freq):
    //   round 1: (a,a)=6 (two positions × 3), (a,b)=4       -> merge (a,a)
    //            aaab -> [aa,a,b] (left-to-right non-overlap), ab -> [a,b]
    //   round 2: (aa,a)=3, (a,b)=3+1=4                      -> merge (a,b)
    //            aaab -> [aa,ab], ab -> [ab]
    //   round 3: (aa,ab)=3                                  -> merge (aa,ab)
    //   round 4: no adjacent pairs anywhere                  -> early stop
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, numMerges = 10, minPairFreq = 1L)
    assert(merges == Seq("a" -> "a", "a" -> "b", "aa" -> "ab"), s"got $merges")
  }

  test("train breaks frequency ties lexicographically; minPairFreq gates") {
    val docs = Seq((1L, "xy yx")).toDF("doc_id", "text")
    // (x,y) and (y,x) both appear once -> lexicographic tie-break
    assert(Bpe.train(docs, numMerges = 1, minPairFreq = 1L).head == ("x" -> "y"))
    // below the default minPairFreq=2 nothing merges at all
    assert(Bpe.train(docs, numMerges = 5).isEmpty)
  }

  test("batched training: M=1-equal lists on separated counts; conflicts defer") {
    // distinct-letter words with well-separated pair counts: every top-M
    // batch is symbol-disjoint and no new-symbol pair can out-rank the
    // batch, so batched == sequential exactly
    val docs = Seq((1L, ("ab " * 9) + ("cd " * 7) + ("ef " * 5) + ("gh " * 3)))
      .toDF("doc_id", "text")
    val seqList = Bpe.train(docs, numMerges = 4, minPairFreq = 1L)
    assert(seqList == Seq("a" -> "b", "c" -> "d", "e" -> "f", "g" -> "h"))
    for (m <- Seq(2, 3, 8))
      assert(Bpe.train(docs, numMerges = 4, minPairFreq = 1L, batchMerges = m)
        == seqList, s"batchMerges=$m diverged")
    // conflicting pairs share a symbol: (a,a) then (a,b) both touch 'a',
    // so a batch accepts only the first and defers the rest to the next
    // counting round — same final list as sequential on this corpus
    val overlap = Seq((1L, "aaab aaab"), (2L, "aaab ab")).toDF("doc_id", "text")
    assert(Bpe.train(overlap, numMerges = 10, minPairFreq = 1L, batchMerges = 4)
      == Bpe.train(overlap, numMerges = 10, minPairFreq = 1L))
    // batch cap respected: numMerges bounds total accepted merges
    assert(Bpe.train(docs, numMerges = 3, minPairFreq = 1L, batchMerges = 8).length == 3)
  }

  test("encode applies merges in order; unseen words fall back to characters") {
    val merges = Seq("a" -> "a", "a" -> "b", "aa" -> "ab")
    val out = Seq((1L, "aaabab zq Aaab"), (2L, ""), (3L, "ab"))
      .toDF("doc_id", "text")
      .select($"doc_id", Bpe.encode(merges, $"text").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // aaabab: a,a,a,b,a,b -(a,a)-> aa,a,b,a,b -(a,b)-> aa,ab,ab -(aa,ab)-> aaab,ab
    // "Aaab" lowercases to aaab -> single token; zq has no merges -> chars
    assert(out(1L) == Seq("aaab", "ab", "z", "q", "aaab"), s"got ${out(1L)}")
    assert(out(2L).isEmpty)
    assert(out(3L) == Seq("ab"))
    // token concatenation always reconstructs the normalized words
    assert(out(1L).mkString == "aaababzqaaab")
  }

  test("vocabulary ids are lexicographic ranks; encodeIds round-trips and flags OOV") {
    val merges = Seq("a" -> "a", "a" -> "b", "aa" -> "ab")
    val docs = Seq((1L, "aaabab ab"), (2L, "ab aaabab")).toDF("doc_id", "text")
    val vocab = Bpe.vocabulary(merges, docs)
    val v = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // emitted tokens across the corpus: aaab, ab -> ranks 1, 2
    assert(v == Map("aaab" -> 1L, "ab" -> 2L), s"got $v")
    val ids = Bpe.encodeIds(merges, vocab, docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(ids(1L) == ((3L, "1 2 2")), s"got ${ids(1L)}") // aaab ab | ab
    assert(ids(2L) == ((3L, "2 1 2")), s"got ${ids(2L)}")
    // a token the vocab has never seen resolves to -1, position intact
    val oov = Bpe.encodeIds(merges, vocab, Seq((9L, "ab zz ab")).toDF("doc_id", "text"))
      .collect().head
    assert(oov.getString(2) == "2 -1 -1 2") // zz falls back to chars z,z
  }

  test("trained model encodes its own corpus consistently; sampled training runs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.train(docs, numMerges = 12)
    assert(merges.length == 12)
    val enc = docs.select($"doc_id", Bpe.encode(merges, $"text").as("toks"))
      .select($"doc_id", size($"toks").as("n"))
    // merges only ever shrink the token count vs raw characters, and at
    // 12 merges it must sit strictly below the character count
    val nBpe = enc.agg(sum($"n")).head().getLong(0)
    val nChars = docs.select(sum(length(regexp_replace(lower(trim($"text")), "\\W+", "")))).head().getLong(0)
    assert(nBpe < nChars, s"bpe tokens $nBpe must undercut char count $nChars")
    // deterministic: retrain = same merges
    assert(Bpe.train(docs, numMerges = 12) == merges)
    // sampled training (maxTrainRows) still yields a full-length model
    assert(Bpe.train(docs, numMerges = 5, maxTrainRows = 100L).length == 5)
  }
}
