package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Text analysis semantics on hand-computed examples (SURVEY §2 F1–F4). */
class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
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
}
