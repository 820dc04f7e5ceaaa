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
}
