package graft

import graft.pipeline.Dedup
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Differential checks for the round-10 curation ops against plain
  * in-memory models: containment (bottom-m probes vs an exact shingle-set
  * model, incl. docs built as token-slices of other docs — the case the
  * operator exists for) and the exact n-gram contamination report (both
  * execution paths vs a brute-force gram-multiset model). Spark trials
  * are expensive; adversarial shapes beat volume. */
object ContainmentPropSpec extends Properties("Dedup.containment/ngram") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters = p.withMinSuccessfulTests(12)

  private lazy val spark = SparkTestBase.session

  private val vocab = Vector("ab", "cd", "ef", "gh", "ij", "kl", "mn")

  /** Model tokenization = the kernel contract (lowercase, \W+ split). */
  private def shingleSet(toks: List[String], w: Int = 3): Set[String] =
    if (toks.isEmpty) Set.empty
    else if (toks.length <= w) Set(toks.mkString(" "))
    else toks.sliding(w).map(_.mkString(" ")).toSet

  private def containment(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty) 0.0 else (a & b).size.toDouble / a.size

  // corpus: a few random base docs plus docs that are contiguous token
  // slices of a base (true containment cases), over a tiny vocab so
  // random shingle overlap happens too
  private val corpusGen: Gen[List[(Long, List[String])]] = for {
    nBase <- Gen.choose(2, 4)
    bases <- Gen.listOfN(nBase,
      Gen.choose(0, 12).flatMap(k => Gen.listOfN(k, Gen.oneOf(vocab))))
    nDeriv <- Gen.choose(0, 3)
    derivs <- Gen.listOfN(nDeriv, for {
      b <- Gen.oneOf(bases)
      from <- Gen.choose(0, math.max(0, b.length - 1))
      len <- Gen.choose(1, math.max(1, b.length))
    } yield b.slice(from, from + len))
  } yield (bases ++ derivs).zipWithIndex.map { case (ts, i) => (i.toLong, ts) }

  property("reported containments match the exact set model; full " +
    "containments are always found (loose AND strict prefilter)") =
    forAll(corpusGen) { corpus =>
      import org.apache.spark.sql.functions.col
      val sets = corpus.map { case (id, ts) => id -> shingleSet(ts) }.toMap
      val sqlc = spark
      import sqlc.implicits._
      val df = corpus.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val threshold = 0.7
      def run(hmin: Int): Map[(Long, Long), Double] =
        Dedup.containmentVerify(
            Dedup.containmentCandidates(df, m = 8, maxDocFreq = corpus.size + 1,
              minProbeHits = hmin),
            df, threshold = threshold)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val loose = run(1)
      val strict = run(8)
      val sound = loose.forall { case ((a, b), c) =>
        c >= threshold && math.abs(c - containment(sets(a), sets(b))) < 1e-12
      }
      val fullPairs = (for {
        (a, sa) <- sets; (b, sb) <- sets
        if a != b && sa.nonEmpty && sa.subsetOf(sb)
      } yield (a, b)).toSet
      val looseFindsFull = fullPairs.forall(p => loose.get(p).contains(1.0))
      val strictFindsFull = fullPairs.forall(p => strict.get(p).contains(1.0))
      val strictSubset = strict.keySet.subsetOf(loose.keySet)
      sound && looseFindsFull && strictFindsFull && strictSubset
    }

  property("incremental containment == batch containment restricted to " +
    "cross-side pairs (uncapped)") =
    forAll(corpusGen, corpusGen) { (corpusC0, deltaC0) =>
      // disjoint id spaces for the batch-side comparison (the operator
      // itself side-tags; the BATCH reference needs one id space)
      val corpusC = corpusC0.map { case (id, ts) => (id * 2, ts) }
      val deltaC = deltaC0.map { case (id, ts) => (id * 2 + 1, ts) }
      val sqlc = spark
      import sqlc.implicits._
      def toDf(c: List[(Long, List[String])]) =
        c.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
      val corpus = toDf(corpusC)
      val delta = toDf(deltaC)
      val n = corpusC.size + deltaC.size + 1
      val threshold = 0.7
      val inc = Dedup.incrementalContainment(
          Dedup.shingleIndex(corpus), delta, threshold = threshold,
          m = 8, maxDocFreq = n, minProbeHits = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)) -> r.getDouble(3))
        .toMap
      val batch = Dedup.containmentVerify(
          Dedup.containmentCandidates(corpus.unionAll(delta), m = 8,
            maxDocFreq = n, minProbeHits = 1),
          corpus.unionAll(delta), threshold = threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val deltaIds = deltaC.map(_._1).toSet
      val corpusIds = corpusC.map(_._1).toSet
      val batchCross = batch.collect {
        case ((a, b), c) if deltaIds(a) && corpusIds(b) =>
          (a, b, "delta_in_corpus") -> c
        case ((a, b), c) if corpusIds(a) && deltaIds(b) =>
          (b, a, "corpus_in_delta") -> c
      }.toMap
      inc == batchCross
    }

  /** Brute-force gram multiset model of the contamination report. */
  private def grams(toks: List[String], n: Int): List[String] =
    if (toks.length < n) Nil else toks.sliding(n).map(_.mkString(" ")).toList

  property("ngram report matches the gram-multiset model on both paths") =
    forAll(corpusGen, corpusGen) { (trainC, evalC) =>
      val n = 3
      val sqlc = spark
      import sqlc.implicits._
      val train = trainC.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val evalDocs = evalC.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val evalSet = evalC.flatMap { case (_, ts) => grams(ts, n) }.toSet
      val expect = trainC.map { case (id, ts) =>
        val gs = grams(ts, n)
        id -> ((gs.length.toLong, gs.count(evalSet).toLong))
      }.toMap
      def asMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      val bc = asMap(Dedup.ngramOverlapReport(train, evalDocs, n = n))
      val bl = asMap(Dedup.ngramOverlapReport(train, evalDocs, n = n,
        broadcastEval = false))
      bc == expect && bl == expect
    }
}
