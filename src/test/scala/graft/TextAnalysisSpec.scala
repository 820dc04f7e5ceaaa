package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Text analysis semantics on hand-computed examples (SURVEY §2 F1–F4). */
class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("F12 BM25: rare terms outweigh common, tf saturates, length penalized") {
    val corpus = docs(
      1L -> "dup dup alpha",            // rare term twice, short doc
      2L -> "dup beta beta beta",       // rare term once, longer doc
      3L -> "window window window window", // common term only
      4L -> "beta beta")                // no query term
    val out = TextAnalysis.bm25(corpus, Seq("dup", "window"), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("score"), r.getAs[Long]("n_matched"))).toMap
    assert(!out.contains(4L), "a doc with no query term was retrieved")
    assert(out.keySet === Set(1L, 2L, 3L))
    // reference computation, independently coded
    def ref(tf: Long, df: Long, dl: Long): Double = {
      val n = 4.0; val avgdl = 13.0 / 4.0
      val idf = BigDecimal(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      BigDecimal(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(math.abs(out(1L)._1 - ref(2, 2, 3)) < 1e-9)
    assert(math.abs(out(2L)._1 - ref(1, 2, 4)) < 1e-9)
    assert(math.abs(out(3L)._1 - ref(4, 1, 4)) < 1e-9)
    // doubled tf on a shorter doc must outrank single tf on a longer one
    assert(out(1L)._1 > out(2L)._1)
    assert(out.forall(_._2._1 > 0), "BM25 Lucene-form idf keeps weights positive")
  }

  test("F11 chunk split: stride overlap, truncated tail, no suffix-duplicate chunk") {
    // 20 tokens, chunk=8, stride=6 -> nc = 1 + ceil(12/6) = 3:
    // [1..8], [7..14], [13..20] — token 20 covered, no 4th chunk
    val text = (1 to 20).map(i => s"t$i").mkString(" ")
    val r = TextAnalysis.chunkSplit(docs(1L -> text), chunk = 8, stride = 6)
      .collect().map(x => x.getAs[Long]("chunk_id") ->
        (x.getAs[String]("chunk_text"), x.getAs[Long]("n_chunk_tokens"))).toMap
    assert(r.size === 3)
    assert(r(0L) === (((1 to 8).map(i => s"t$i").mkString(" "), 8L)))
    assert(r(1L) === (((7 to 14).map(i => s"t$i").mkString(" "), 8L)))
    assert(r(2L) === (((13 to 20).map(i => s"t$i").mkString(" "), 8L)))
    // short doc: one truncated chunk, never zero
    val s = TextAnalysis.chunkSplit(docs(2L -> "a b c"), chunk = 8, stride = 6).collect()
    assert(s.length === 1)
    assert(s(0).getAs[String]("chunk_text") === "a b c")
    assert(s(0).getAs[Long]("n_chunk_tokens") === 3L)
    // exact-boundary doc: n == chunk -> exactly one chunk
    val b = TextAnalysis.chunkSplit(docs(3L -> (1 to 8).map(i => s"b$i").mkString(" ")),
      chunk = 8, stride = 6).collect()
    assert(b.length === 1)
  }

  test("F1 language id votes stopwords with deterministic tiebreak") {
    import spark.implicits._
    val d = Seq((1L, "the cat and the dog", "en"), (2L, "el gato y la casa", "es"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(d).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("pred_lang")).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "es")
  }

  test("F3 token counts: whitespace vs regex vs chars/4") {
    val r = TextAnalysis.tokenCounts(docs(1L -> "ab 12 c!")).collect()(0)
    assert(r.getAs[Long]("ws_tokens") === 3)   // "ab", "12", "c!"
    assert(r.getAs[Long]("re_tokens") === 4)   // ab | 12 | c | !
    assert(r.getAs[Long]("est_tokens") === 2)  // ceil(8/4)
  }

  test("F4 rolling fingerprint matches the hand-computed polynomial") {
    // "ab": ((0*31+97)*31+98) mod 1e9+7 = 3105
    val r = TextAnalysis.fingerprint(docs(1L -> "ab")).collect()(0)
    assert(r.getAs[Long]("fingerprint") === 3105L)
  }

  test("F2 quality ratios are exact on a known sentence") {
    val r = TextAnalysis.quality(docs(1L -> "the cat sat.")).collect()(0)
    assert(r.getAs[Long]("n_tokens") === 3)
    assert(r.getAs[Long]("punct_chars") === 1)
    assert(r.getAs[Long]("stop_hits") === 1)   // "the"
    assert(r.getAs[Long]("word_chars") === 10) // "thecatsat."
    assert(math.abs(r.getAs[Double]("avg_word_len") - 10.0 / 3) < 1e-12)
  }

  test("F7 repetition flags looping text and passes varied text") {
    val out = TextAnalysis.repetition(docs(
      1L -> "spam spam spam spam",   // 1 distinct token, one bigram 3x
      2L -> "the quick brown fox jumps"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val loop = out(1L)
    assert(loop.getAs[Long]("n_tokens") === 4)
    assert(loop.getAs[Long]("n_distinct") === 1)
    assert(math.abs(loop.getAs[Double]("dup_token_ratio") - 0.75) < 1e-12)
    assert(loop.getAs[Long]("top_gram_count") === 3)
    assert(loop.getAs[Long]("n_grams") === 3)
    assert(loop.getAs[Double]("top_gram_frac") === 1.0)
    assert(loop.getAs[Boolean]("is_repetitive"))
    val ok = out(2L)
    assert(ok.getAs[Double]("dup_token_ratio") === 0.0)
    // 4 distinct bigrams, each once: top frac 0.25 — above the bigram
    // threshold only for genuinely short docs, but dup_token_ratio 0
    assert(math.abs(ok.getAs[Double]("top_gram_frac") - 0.25) < 1e-12)
  }

  test("F8 synthesized PII is counted and redacted") {
    import spark.implicits._
    val d = Seq((42L, "hello world", "en", "srcA", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.piiRedact(d).collect()(0)
    assert(r.getAs[Long]("n_emails") === 1)
    assert(r.getAs[Long]("n_ips") === 1)
    assert(r.getAs[Long]("n_phones") === 1)
    val red = r.getAs[String]("redacted")
    assert(red.contains("<EMAIL>") && red.contains("<IP>") && red.contains("<PHONE>"))
    assert(!red.contains("@example.com") && !red.contains("10.0."))
  }

  test("F13 entropy: within [0, ln n]; driver recompute of the full rounding pipeline matches") {
    val rows = TextAnalysis.tokenEntropy(
      graft.sources.Tables.table(spark, SF, "documents")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, h) = (r.getAs[Long]("n_tokens"), r.getAs[Double]("entropy"))
      assert(h >= -1e-8 && h <= math.log(n.toDouble) + 1e-8,
        s"entropy $h outside [0, ln $n]")
    }
    // exact replication of the engine arithmetic for one real doc:
    // 8dp-rounded ln into decimal, integer-scaled exact sum, double edge
    val doc = graft.sources.Tables.table(spark, SF, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 0L)
      .collect()(0).getAs[String]("text")
    val counts = doc.split(" ", -1).groupBy(identity).view.mapValues(_.length.toLong)
    val n = counts.values.sum
    // valueOf (shortest-decimal repr), NOT new BigDecimal(x) (exact
    // binary expansion): Spark's round()/cast round the shortest repr,
    // and the two disagree on near-tie values — the recompute must
    // replicate the engine, not ideal-real arithmetic
    def r8(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(x).setScale(8, java.math.RoundingMode.HALF_UP)
    val sclnc = counts.values.map(c =>
      r8(math.log(c.toDouble)).multiply(java.math.BigDecimal.valueOf(c)))
      .reduce(_ add _)
    val want = r8(math.log(n.toDouble)).doubleValue - sclnc.doubleValue / n
    val got = rows.find(_.getAs[Long]("doc_id") == 0L).get.getAs[Double]("entropy")
    assert(got === want, s"engine $got vs driver recompute $want")
  }

  test("F14 KL: Gibbs non-negativity per source, one row per source") {
    val docs = graft.sources.Tables.table(spark, SF, "documents")
    val rows = TextAnalysis.sourceKlDivergence(docs).collect()
    val nSources = docs.select("source").distinct().count()
    assert(rows.length === nSources, "complete matrix: one row per source")
    rows.foreach { r =>
      val kl = r.getAs[Double]("kl_div")
      // >= 0 up to the 8dp rounding of each ln
      assert(kl >= -1e-6, s"KL(${r.getAs[String]("source")}) = $kl negative")
      assert(!kl.isNaN && !kl.isInfinite)
    }
  }

  test("F15 Gopher gates: each rule fires on exactly its designed violation") {
    val fifty = Seq.fill(48)("word")
    val corpus = docs(
      1L -> ("the of " + fifty.mkString(" ")),          // passes everything
      2L -> "the of word",                              // too short
      3L -> Seq.fill(50)("word").mkString(" "),         // no required stopwords
      4L -> ("the of " + Seq.fill(48)("1234").mkString(" ")), // numeric soup
      5L -> ("the of " + Seq.fill(48)("#").mkString(" ")))    // symbol soup
    val out = TextAnalysis.gopherRules(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc1 metric spot-check: 50 words, 2+3+48*4 = 197 non-space chars
    assert(out(1L).getAs[Long]("n_words") === 50L)
    assert(out(1L).getAs[Double]("mean_word_len") === 197.0 / 50)
    assert(out(1L).getAs[Double]("alpha_word_frac") === 1.0)
    assert(out(1L).getAs[Long]("req_stop_hits") === 2L)
    assert(out(1L).getAs[Boolean]("passes_gopher"))
    def flags(id: Long) = Seq("r_word_count", "r_mean_len", "r_symbol",
      "r_alpha", "r_stopword").map(f => f -> out(id).getAs[Boolean](f)).toMap
    assert(!flags(2L)("r_word_count") && flags(2L)("r_stopword"))
    assert(!flags(3L)("r_stopword") && flags(3L)("r_word_count"))
    assert(!flags(4L)("r_alpha") && flags(4L)("r_stopword"))
    assert(!flags(5L)("r_symbol"))
    assert(out(5L).getAs[Long]("n_symbols") === 48L)
    Seq(2L, 3L, 4L, 5L).foreach(id =>
      assert(!out(id).getAs[Boolean]("passes_gopher"), s"doc $id must fail"))
  }

  test("F20 Zipf slope: matches the hand regression; negative on ranked frequencies") {
    // term frequencies 8/4/2/1 at ranks 1..4
    val corpus = docs(
      1L -> (Seq.fill(8)("aa") ++ Seq.fill(4)("bb") ++ Seq.fill(2)("cc") :+ "dd")
        .mkString(" "))
    val out = TextAnalysis.zipfSlope(corpus, topK = 100).head()
    assert(out.getAs[Long]("n_terms") === 4L)
    def ln8(v: Double): Double = BigDecimal(math.log(v))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xs = Seq(1.0, 2.0, 3.0, 4.0).map(ln8)
    val ys = Seq(8.0, 4.0, 2.0, 1.0).map(ln8)
    val n = 4.0
    // the same EXACT-DECIMAL close the engine computes (round 14: the
    // whole numerator/denominator algebra stays BigDecimal-exact; each
    // output is ONE double division — the FMA-proof recipe), so the
    // hand recompute is bit-identical by construction
    def dsum(vs: Seq[Double]) = vs.map(BigDecimal(_)).sum
    val (sx, sy) = (dsum(xs), dsum(ys))
    val sxy = xs.zip(ys).map { case (a, b) => BigDecimal(a) * BigDecimal(b) }.sum
    val sx2 = xs.map(a => BigDecimal(a) * BigDecimal(a)).sum
    val nD = BigDecimal(n)
    val den = (nD * sx2 - sx * sx).toDouble
    val slope = (nD * sxy - sx * sy).toDouble / den
    val intercept = (sy * sx2 - sx * sxy).toDouble / den
    assert(out.getAs[Double]("slope") === slope)
    assert(out.getAs[Double]("intercept") === intercept)
    // freq halves per rank while ln(rank) grows sub-linearly, so the
    // fitted slope is steeper than -1 (≈ -1.459 on these four points)
    assert(slope < -1.4 && slope > -1.5)
    // real corpus: a defined, finite, negative slope
    val real = TextAnalysis.zipfSlope(
      graft.sources.Tables.table(spark, SF, "documents")).head()
    // the synthetic vocab is tiny (~31 terms at sf0.001) — the fit
    // covers min(topK, |vocab|) terms
    assert(real.getAs[Long]("n_terms") > 10L && real.getAs[Long]("n_terms") <= 100L)
    assert(real.getAs[Double]("slope") < 0.0)
  }

  test("F16 boilerplate: cross-doc recurring gram wins; in-doc repeats count once") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val tmpl = "h1 h2 h3 h4 h5 h6 h7 h8"
    val corpus = Seq(
      // srcA: the template occurs in docs 1 and 2 (df=2 of 3)
      (1L, s"$tmpl tail1", "srcA"),
      (2L, s"lead $tmpl", "srcA"),
      (3L, "a1 a2 a3 a4 a5 a6 a7 a8 a9", "srcA"),
      // srcB: no recurring gram → df=1 everywhere, tie broken on gram asc
      (4L, "b1 b2 b3 b4 b5 b6 b7 b8", "srcB"),
      (5L, "c1 c2 c3 c4 c5 c6 c7 c8", "srcB"),
      // srcC: one SHORT doc (no grams) — source still profiled? no: no
      // gram rows → absent from the report, n_docs join can't rescue it
      (6L, "too short", "srcC"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.boilerplate(corpus).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[String]("boilerplate_gram"), r.getAs[Long]("df"),
          r.getAs[Long]("n_docs"), r.getAs[Double]("boilerplate_frac")))).toMap
    assert(out("srcA") === ((tmpl, 2L, 3L, 2.0 / 3)))
    // df=1 tie → lexicographically smallest gram of srcB
    assert(out("srcB")._2 === 1L)
    assert(out("srcB")._1 === "b1 b2 b3 b4 b5 b6 b7 b8")
    assert(!out.contains("srcC"), "a gram-less source has no boilerplate row")
    // a doc repeating the template internally must still count df once
    val rep = Seq((1L, s"$tmpl $tmpl", "srcD"), (2L, "d1 d2 d3 d4 d5 d6 d7 d8", "srcD"))
      .toDF("doc_id", "text", "source")
    val dfRep = TextAnalysis.boilerplate(rep)
      .filter(col("source") === "srcD").head().getAs[Long]("df")
    assert(dfRep === 1L, "per-doc distinct: in-doc repetition is not cross-doc df")
  }

  test("F18 novelty: first occurrence owns the gram; dups score 0; short docs drop") {
    val corpus = docs(
      1L -> "a b c d",   // both 3-grams first seen here
      2L -> "a b c x",   // shares "a b c" with doc 1
      3L -> "a b c d",   // exact dup of doc 1
      4L -> "q r",       // < 3 tokens
      5L -> "z z z z z") // one DISTINCT gram, novel
    val out = TextAnalysis.novelty(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_seen"),
          r.getAs[Double]("novelty")))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 5L))
    assert(out(1L) === ((2L, 0L, 1.0)))
    assert(out(2L) === ((2L, 1L, 0.5)))
    assert(out(3L) === ((2L, 2L, 0.0)))
    assert(out(5L) === ((1L, 0L, 1.0)), "in-doc repetition collapses to one distinct gram")
  }

  test("F17 bigram LM: add-one smoothed hand model; sub-2-token docs drop out") {
    val corpus = docs(1L -> "a b", 2L -> "a b", 3L -> "a c", 4L -> "z")
    val out = TextAnalysis.bigramLogprob(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_logprob"))).toMap
    // vocab = {a,b,c,z} = 4; c("a b") = 2, c("a c") = 1, cpre(a) = 3
    def ln8(x: Double): Double = BigDecimal(math.log(x))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = ln8((2.0 + 1.0) / (3 + 4))
    val pAC = ln8((1.0 + 1.0) / (3 + 4))
    assert(out.keySet === Set(1L, 2L, 3L), "the 1-token doc must drop out")
    assert(out(1L) === ((1L, pAB)))
    assert(out(2L) === ((1L, pAB)))
    assert(out(3L) === ((1L, pAC)))
    // the repeated bigram is likelier than the singleton under the
    // corpus's own model — the perplexity-filter ordering
    assert(out(1L)._2 > out(3L)._2)
  }

  test("F23 PMI: enriched pairs rank above chance-level ones, the count floor fences the tail") {
    // "a b" is a strong collocation (a is always followed by b);
    // c/d/e mix freely, so their pairs sit near chance; "q r" appears
    // once — under the minCount floor and must not surface
    val corpus = docs(
      1L -> "a b a b a b",
      2L -> "c d e c d e",
      3L -> "d c e d c e",
      4L -> "e d c e d c",
      5L -> "q r")
    val out = TextAnalysis.pmiCollocations(corpus, minCount = 2, k = 50)
      .collect()
      .map(r => (r.getAs[String]("gram"),
        r.getAs[Long]("c12"), r.getAs[Double]("pmi")))
    assert(!out.exists(_._1 == "q r"), "a below-floor pair surfaced")
    // driver recompute with the identical spelled op order
    val grams = corpus.collect().flatMap { r =>
      val tok = r.getString(1).split(" ", -1)
      tok.dropRight(1).zip(tok.drop(1)).map { case (x, y) => s"$x $y" }
    }
    val c12 = grams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cpre = grams.map(_.split(" ", -1)(0)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val csuf = grams.map(_.split(" ", -1)(1)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val btot = grams.length.toLong
    def pmi8(g: String): Double = {
      val Array(w1, w2) = g.split(" ", -1)
      BigDecimal(math.log(c12(g).toDouble * btot / (cpre(w1).toDouble * csuf(w2))))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = c12.keys.filter(c12(_) >= 2).toSeq
      .map(g => (g, c12(g), pmi8(g)))
      .sortBy { case (g, _, p) => (-p, g) }
    assert(out.toSeq === want)
    // the engineered collocation dominates the free-mixing pairs: a and
    // b only ever co-occur with each other, so BOTH orientations must
    // outscore every c/d/e pair (and chance level, PMI 0)
    val ab = out.filter(o => o._1 == "a b" || o._1 == "b a").map(_._3)
    val rest = out.filterNot(o => o._1 == "a b" || o._1 == "b a").map(_._3)
    assert(ab.size === 2 && rest.nonEmpty)
    assert(ab.min > 0.0 && ab.min > rest.max)
  }

  test("F22 strip: coverage removes every frequent-gram occurrence, order survives, short/clean docs untouched") {
    // "a b c d" appears in docs 1, 2, 3, 6 (df=4 ≥ minDf=3); every
    // other 4-gram is unique (df=1)
    val corpus = docs(
      1L -> "a b c d x y z w",    // prefix occurrence
      2L -> "p q a b c d r s",    // interior occurrence
      3L -> "a b c d",            // the whole doc IS the template
      4L -> "a b c x y z w q",    // shares a 3-gram prefix only — clean
      5L -> "m n",                // below gram length — clean
      6L -> "a b c d a b c d")    // two occurrences; pos2-4 grams unique
    val out = TextAnalysis.boilerplateStrip(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L),
      "every input doc must appear in the report, stripped or not")
    assert(out(1L) === ((8L, 4L, "x y z w")))
    assert(out(2L) === ((8L, 4L, "p q r s")), "interior strip keeps both flanks in order")
    assert(out(3L) === ((4L, 4L, "")), "a doc that IS the template empties, not disappears")
    assert(out(4L) === ((8L, 0L, "a b c x y z w q")), "a sub-threshold gram never strips")
    assert(out(5L) === ((2L, 0L, "m n")), "docs below the gram length pass through")
    assert(out(6L) === ((8L, 8L, "")),
      "both occurrences' coverages union — repeat templates empty the doc")
  }

  test("F24 greedy segmentation: leftmost merge wins, consumed words can't re-merge") {
    val merges = Seq("a b", "b c", "c d")
    val corpus = docs(
      1L -> "a b c d",       // greedy: [a b][c d] — "b c" never fires
      2L -> "x a b y",       // interior merge: [x][a b][y]
      3L -> "b c",           // whole doc one merge
      4L -> "x y z",         // no merges
      5L -> "a b a b a b",   // repeated merge, no overlap ambiguity
      6L -> "a a b",         // leftmost "a a" not in table; "a b" fires at pos 2
      7L -> "")              // empty text: split -> [""], one token
    val out = TextAnalysis.bpeSegmentWith(corpus, merges).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("ws_tokens"), r.getAs[Long]("bpe_tokens"),
          r.getAs[Long]("n_merges")))).toMap
    assert(out(1L) === ((4L, 2L, 2L)),
      "greedy leftmost: a+b then c+d; the consumed b must not start b+c")
    assert(out(2L) === ((4L, 3L, 1L)))
    assert(out(3L) === ((2L, 1L, 1L)))
    assert(out(4L) === ((3L, 3L, 0L)))
    assert(out(5L) === ((6L, 3L, 3L)))
    assert(out(6L) === ((3L, 2L, 1L)))
    assert(out(7L) === ((1L, 1L, 0L)), "empty text is one whitespace token, no merges")
  }

  test("F24 -> I9/I11 integration: learned-vocab counts flow through the packing/budget seams") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Profile
    val corpus = graft.sources.Tables.table(spark, SF, "documents")
    val seg = TextAnalysis.bpeSegment(corpus, carry = Seq("source"))
    val segRows = seg.collect()
    // the learned lexicon genuinely fires on the real corpus
    assert(segRows.map(_.getAs[Long]("n_merges")).sum > 0,
      "top-PMI merge table produced zero merges — degenerate lexicon")
    assert(segRows.forall(r =>
      r.getAs[Long]("bpe_tokens") + r.getAs[Long]("n_merges") === r.getAs[Long]("ws_tokens")))
    // seam law: packSequencesFrom(whitespace counts) IS packSequences
    val viaSeam = Profile.packSequencesFrom(
      corpus.select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("text"), " ")).cast("long").as("n_tokens")))
      .collect().map(_.toSeq).toSet
    assert(viaSeam === Profile.packSequences(corpus).collect().map(_.toSeq).toSet)
    // i9b: packing consumes exactly f24's counts, boundaries re-derive
    val bpeCounts = segRows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bpe_tokens")).toMap
    val packed = Profile.packSequencesFrom(
      seg.select(col("doc_id"), col("bpe_tokens").as("n_tokens"))).collect()
    assert(packed.forall(r => r.getAs[Long]("n_tokens") === bpeCounts(r.getAs[Long]("doc_id"))))
    // i11b: smaller counts under the same budget admit AT LEAST the
    // whitespace prefix per source (the cum-sum can only shrink)
    val wsAdmitted = Profile.tokenBudgetCap(corpus).count()
    val bpeAdmitted = Profile.tokenBudgetCapFrom(
      seg.select(col("doc_id"), col("source"),
        col("bpe_tokens").as("n_tokens"),
        Profile.tokenAdmissionHash.as("hk"))).count()
    assert(bpeAdmitted >= wsAdmitted,
      s"learned-vocab admission ($bpeAdmitted) lost docs vs whitespace ($wsAdmitted)")
  }
}
