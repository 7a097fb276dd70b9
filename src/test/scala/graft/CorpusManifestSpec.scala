package graft

import graft.queries.CurationQueries

/** Every verdict branch of the curation-funnel capstone pinned on a synthetic
  * corpus — the harness corpus exercises six of the seven (its exact copies
  * never survive the gates), so `dropped_exact_dup` and the precedence order
  * live here.
  */
class CorpusManifestSpec extends SparkSpec {
  import spark.implicits._

  // A gated-passing English base: stopword-dense (langId='en', quality well
  // above the 3000 floor) and ≥ 10 tokens so 8-gram shingles exist.
  private val good =
    "the cat is of the house and to the garden in a way that is the best of all things"

  test("all seven verdicts fire with the documented precedence") {
    val evalText = "benchmark question alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      // id 0 → eval_holdout (id % 20 == 0), supplies the eval 8-grams
      (0L, evalText),
      // id 1 → dropped_lang (German markers dominate)
      (1L, "der hund ist nicht das haus und die katze ist nicht der garten"),
      // id 2 → dropped_quality: English (one 'the' marker) but short and
      // punctuation-heavy — lenScore 90 + stopScore 4000 − penalty 2000 < 3000
      (2L, "the ;;; !!!"),
      // ids 3, 23 → identical gated docs: 3 wins, 23 dropped_exact_dup
      (3L, good + " version one"),
      (23L, good + " version one"),
      // ids 4, 24 → near-dups of EACH OTHER only (distinct base from `good`,
      // one trailing word differs): 24 dropped_near_dup, 4 kept
      (4L, "the bird is to the nest and of the tall tree in a calm place where " +
        "the first of many small things landed here"),
      (24L, "the bird is to the nest and of the tall tree in a calm place where " +
        "the first of many small things landed there"),
      // id 5 → survives dedup but contains an eval 8-gram → dropped_contaminated
      (5L, "the tale mentions question alpha beta gamma delta epsilon zeta eta " +
        "while the fox is of the den and to the deep wood of late evening"),
      // id 6 → kept
      (6L, "the dog is of the yard and to the fence in a form that is the kind of " +
        "every other thing")
    ).toDF("doc_id", "text")

    val out = CurationQueries.corpusManifestOf(docs)
      .as[(Long, String, Option[String])].collect()
      .map { case (id, v, s) => id -> ((v, s)) }.toMap

    assert(out(0L)._1 === "eval_holdout")
    assert(out(1L)._1 === "dropped_lang")
    assert(out(2L)._1 === "dropped_quality")
    assert(out(3L)._1 === "kept")
    assert(out(23L)._1 === "dropped_exact_dup")
    assert(out(24L)._1 === "dropped_near_dup")
    assert(out(5L)._1 === "dropped_contaminated")
    assert(out(6L)._1 === "kept")
    // split only on kept rows, and deterministic
    assert(out.values.forall { case (v, s) => (v == "kept") == s.isDefined })
    // exact-dup precedence: doc 4 is ALSO 23/3's near-dup candidate space,
    // but wins its own pair; 24 must lose to 4 (smaller id wins)
    assert(out(4L)._1 === "kept")
  }
}
