package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE semantics the oracle can't pin alone: hand-checked merges on the
  * classic corpus, the leftmost-nonoverlap rule, early exhaustion, the
  * tokenize conservation law, and full learn+tokenize equivalence
  * against a pure-Scala reference implementation on random corpora.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // ---- pure-Scala reference BPE (Sennrich-style, word histogram) ----

  private def refLearn(words: Seq[String], numMerges: Int):
      (Seq[(String, String, Long)], Map[String, Seq[String]]) = {
    val freq = words.filter(_.nonEmpty).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    var hist: Map[String, Seq[String]] =
      freq.keys.map(w => w -> w.split("").toSeq).toMap
    val merges = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- hist; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + freq(w)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        merges += ((a, b, c))
        hist = hist.map { case (w, syms) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> out.toSeq
        }
        k += 1
      }
    }
    (merges.result(), hist)
  }

  private def learnOn(texts: Seq[String], n: Int): Bpe.Model =
    Bpe.learn(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text"), "text", n)

  test("learn picks the hand-checked merges on the classic corpus") {
    // freqs: low×5, lower×2, newest×6, widest×3
    val texts = Seq(
      "low low low low low",
      "lower lower widest widest widest",
      "newest newest newest newest newest newest")
    val m = learnOn(texts, 4).merges
    // pair counts round 1: (e,s)=9 (newest 6 + widest 3), (s,t)=9,
    // (l,o)=7, (o,w)=7, (n,e)=6, (e,w)=6, (w,e)=8(newest)+2(lower)=8?
    //   newest: n e w e s t -> (n,e),(e,w),(w,e),(e,s),(s,t) ×6
    //   widest: w i d e s t -> (w,i),(i,d),(d,e),(e,s),(s,t) ×3
    //   low: l o w ×5 -> (l,o),(o,w)
    //   lower: l o w e r ×2 -> (l,o),(o,w),(w,e),(e,r)
    // (e,s)=9 ties (s,t)=9 -> lexicographic picks (e,s)
    assert(m(0).leftSym == "e" && m(0).rightSym == "s" && m(0).pairCount == 9)
    // round 2: (es,t)=9 now the max
    assert(m(1).leftSym == "es" && m(1).rightSym == "t" && m(1).pairCount == 9)
    // round 3: (l,o)=7=(o,w) -> lexicographic (l,o)
    assert(m(2).leftSym == "l" && m(2).rightSym == "o" && m(2).pairCount == 7)
    // round 4: (lo,w)=7
    assert(m(3).leftSym == "lo" && m(3).rightSym == "w" && m(3).pairCount == 7)
  }

  test("merge application is leftmost-nonoverlapping (aaa + (a,a) -> aa a)") {
    val m = learnOn(Seq("aaa aaa"), 1)
    val vocab = m.vocab.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // (a,a) counted twice per word but merges once, leftmost
    assert(m.merges.head.pairCount == 4)
    assert(vocab("aaa") == "aa a")
  }

  test("learn stops early when every word is a single symbol") {
    val m = learnOn(Seq("a b c a b"), 5)
    assert(m.merges.isEmpty)
    assert(m.vocab.count() == 3)
  }

  test("tokenize conserves characters and maps every word (conservation law)") {
    val texts = Seq("low lower", "newest low widest", "aaa")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Bpe.tokenize(docs, "doc_id", "text", learnOn(texts, 3))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val (bpe, n) = out(i.toLong)
      // dropping separators, the symbol stream is the original text's
      // characters in order
      assert(bpe.replace(" ", "") == t.replace(" ", ""), s"doc $i")
      assert(n == bpe.split(" ").length.toLong)
    }
  }

  test("learn + tokenize equal the pure-Scala reference on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genWord = for {
      n <- Gen.choose(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
    val genCorpus = for {
      nw <- Gen.choose(1, 6)
      ws <- Gen.listOfN(nw, genWord)
      nDocs <- Gen.choose(1, 5)
      docs <- Gen.listOfN(nDocs, Gen.nonEmptyListOf(Gen.oneOf(ws)))
      k <- Gen.choose(1, 6)
    } yield (docs.map(_.mkString(" ")), k)
    val prop = Prop.forAll(genCorpus) { case (texts, k) =>
      val model = learnOn(texts, k)
      val (wantMerges, wantHist) = refLearn(texts.flatMap(_.split(" ")), k)
      val gotMerges = model.merges.map(m => (m.leftSym, m.rightSym, m.pairCount))
      val gotVocab = model.vocab.collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val wantVocab = wantHist.map { case (w, syms) => w -> syms.mkString(" ") }
      val ok = gotMerges == wantMerges && gotVocab == wantVocab
      if (!ok) println(s"texts=$texts k=$k\ngot  $gotMerges / $gotVocab\nwant $wantMerges / $wantVocab")
      ok
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("distributed batched rounds equal the sequential reference on random corpora (incl. tiny top-M truncation)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genWord = for {
      n <- Gen.choose(1, 7)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
    val genCorpus = for {
      nw <- Gen.choose(1, 7)
      ws <- Gen.listOfN(nw, genWord)
      nDocs <- Gen.choose(1, 5)
      docs <- Gen.listOfN(nDocs, Gen.nonEmptyListOf(Gen.oneOf(ws)))
      k <- Gen.choose(1, 7)
      m <- Gen.oneOf(2, 3, 5, 1024) // truncated AND complete pair tables
    } yield (docs.map(_.mkString(" ")), k, m)
    val prop = Prop.forAll(genCorpus) { case (texts, k, m) =>
      // localVocabLimit = 0 forces the distributed batched path
      val model = Bpe.learn(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        "text", k, localVocabLimit = 0L, topPairs = m)
      val (wantMerges, wantHist) = refLearn(texts.flatMap(_.split(" ")), k)
      val gotMerges = model.merges.map(x => (x.leftSym, x.rightSym, x.pairCount))
      val gotVocab = model.vocab.collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val wantVocab = wantHist.map { case (w, syms) => w -> syms.mkString(" ") }
      // a corpus whose every word is a single symbol has NO pairs: the
      // first pair-count job comes back empty and the loop exhausts at
      // zero rounds (merges empty on both trainers) — otherwise at
      // least one round ran and batching can only SHRINK the count
      val roundsOk =
        if (gotMerges.isEmpty) model.distributedRounds == 0
        else model.distributedRounds >= 1 &&
          model.distributedRounds <= gotMerges.length
      val ok = gotMerges == wantMerges && gotVocab == wantVocab && roundsOk
      if (!ok) println(s"texts=$texts k=$k m=$m rounds=${model.distributedRounds}\n" +
        s"got  $gotMerges / $gotVocab\nwant $wantMerges / $wantVocab")
      ok
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("jobs-per-merge receipt: default path trains 12 merges with ZERO distributed rounds; batched fallback halves rounds") {
    val texts = Seq(
      "low low low low low",
      "lower lower widest widest widest",
      "newest newest newest newest newest newest",
      "slowest slowest lowest newer wider widen")
    // default (in-memory) path: the merge loop never touches the
    // cluster after the one histogram scan — 12 merges, 0 rounds
    // (the old sequential loop ran 12 rounds of 2 jobs + 1 collect)
    val local = learnOn(texts, 12)
    assert(local.distributedRounds == 0)
    assert(local.merges.length == 12)
    // forced-distributed batched path: same merges, provably-equal
    // batches, strictly fewer rounds than the 12 a sequential loop runs
    // (this tiny corpus batches worse than real text — the documents
    // corpus measures 2x, see the learn scaladoc; the asymptotic answer
    // is the zero-round in-memory path above)
    val dist = Bpe.learn(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      "text", 12, localVocabLimit = 0L)
    assert(dist.merges == local.merges)
    assert(dist.distributedRounds < 12,
      s"expected batched rounds < 12, got ${dist.distributedRounds}")
  }

  test("distributed fallback receipt on the REAL corpus: localVocabLimit = 0 gives bit-identical merges and vocab, rounds measurably below one-per-merge") {
    // the batched fallback's only other coverage is ScalaCheck corpora;
    // this forces it over the actual documents table so the receipt is
    // measured where the oracle rows (tk1-tk3) train
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val k = 12
    val local = Bpe.learn(docs, "text", k)
    assert(local.distributedRounds == 0 && local.merges.length == k)
    val dist = Bpe.learn(docs, "text", k, localVocabLimit = 0L)
    // bit-identical ranked merge list AND final vocab
    assert(dist.merges == local.merges)
    val lv = local.vocab.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val dv = dist.vocab.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(dv == lv)
    // jobs-per-merge receipt: the r15 sequential distributed loop ran
    // one round (pair-count job + argmax collect + staged projection)
    // PER merge = 12; the batched prefix-acceptance must beat that on
    // real text (scaladoc claims ~2x — pin just under it)
    assert(dist.distributedRounds >= 1 && dist.distributedRounds <= k - 4,
      s"expected <= ${k - 4} batched rounds for $k merges, " +
        s"got ${dist.distributedRounds}")
    info(s"batched rounds = ${dist.distributedRounds} for $k merges " +
      s"(sequential baseline = $k jobs-per-merge 1.0; measured " +
      f"${dist.distributedRounds.toDouble / k}%.2f)")
  }

  // pure-Scala rank-ordered merge replay — the applyMerges reference
  private def refReplay(word: String,
      merges: Seq[(String, String)]): String = {
    var syms = word.split("").toSeq
    for ((a, b) <- merges) {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq
    }
    syms.mkString(" ")
  }

  test("applyMerges replay reproduces the model vocab for every training word") {
    val texts = Seq(
      "low low low low low",
      "lower lower widest widest widest",
      "newest newest newest newest newest newest")
    val model = learnOn(texts, 6)
    val got = model.vocab
      .select(col("word"), Bpe.applyMerges(col("word"), model.merges).as("replay"),
        col("sym"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getString(1) == r.getString(2),
      s"word ${r.getString(0)}: replay ${r.getString(1)} != vocab ${r.getString(2)}"))
  }

  test("applyModel tokenizes OOV words by rank-ordered replay (pure-Scala reference)") {
    val trainTexts = Seq(
      "low low low low low",
      "lower lower widest widest widest",
      "newest newest newest newest newest newest")
    val model = learnOn(trainTexts, 4)
    val pairs = model.merges.map(m => (m.leftSym, m.rightSym))
    // 'slowest' and 'lowest' never occur in training; 'low' does
    val applyTexts = Seq("slowest low", "lowest newest")
    val docs = applyTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Bpe.applyModel(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    applyTexts.zipWithIndex.foreach { case (t, i) =>
      val want = t.split(" ").map(refReplay(_, pairs)).mkString(" ")
      val (bpe, n) = out(i.toLong)
      assert(bpe == want, s"doc $i: got $bpe want $want")
      assert(n == want.split(" ").length.toLong)
    }
  }

  test("applyModel with an exhausted (empty-merge) model char-splits every word") {
    val model = learnOn(Seq("a b c a b"), 5) // exhausts: no pairs to merge
    assert(model.merges.isEmpty)
    val docs = Seq((0L, "cab ba")).toDF("doc_id", "text")
    val out = Bpe.applyModel(docs, "doc_id", "text", model).collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == "c a b b a")
    assert(out(0).getLong(2) == 5L)
  }

  test("applyModel ≡ tokenize on the training corpus itself (lookup path covers everything)") {
    val texts = Seq("low lower", "newest low widest", "aaa")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = learnOn(texts, 3)
    val viaApply = Bpe.applyModel(docs, "doc_id", "text", model)
      .collect().map(_.toSeq).toSet
    val viaLookup = Bpe.tokenize(docs, "doc_id", "text", model)
      .collect().map(_.toSeq).toSet
    assert(viaApply.nonEmpty && viaApply == viaLookup)
  }

  test("applyModel equals pure-Scala replay on random train/apply corpora (OOV words included)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genWord = for {
      n <- Gen.choose(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
    val genCase = for {
      nw <- Gen.choose(1, 6)
      trainWs <- Gen.listOfN(nw, genWord)
      nDocs <- Gen.choose(1, 4)
      trainDocs <- Gen.listOfN(nDocs, Gen.nonEmptyListOf(Gen.oneOf(trainWs)))
      // the apply corpus draws from an unrestricted word pool — most of
      // its words are OOV for the trained model
      applyDocs <- Gen.listOfN(2, Gen.nonEmptyListOf(genWord))
      k <- Gen.choose(1, 5)
    } yield (trainDocs.map(_.mkString(" ")), applyDocs.map(_.mkString(" ")), k)
    val prop = Prop.forAll(genCase) { case (trainTexts, applyTexts, k) =>
      val model = learnOn(trainTexts, k)
      val pairs = model.merges.map(m => (m.leftSym, m.rightSym))
      val docs = applyTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Bpe.applyModel(docs, "doc_id", "text", model)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = applyTexts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split(" ").filter(_.nonEmpty)
          .map(refReplay(_, pairs)).mkString(" ")
      }.toMap
      val ok = got == want
      if (!ok) println(s"train=$trainTexts apply=$applyTexts k=$k\ngot  $got\nwant $want")
      ok
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("tokenize plan: no cartesian product, one grouped exchange") {
    val texts = Seq("low lower", "newest low")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val plan = Bpe.tokenize(docs, "doc_id", "text", learnOn(texts, 2))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
