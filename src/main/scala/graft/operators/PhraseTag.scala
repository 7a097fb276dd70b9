package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dictionary phrase tagging — the brand-safety / topic-list / blocklist
  * content-tagging stage of a curation pipeline: count every occurrence of
  * each multi-token dictionary phrase in every document.
  *
  * Shape: explode tokens WITH positions, equi-join the position rows to the
  * broadcast dictionary on the FIRST token (the selective key — only
  * positions that start a possible match survive), then verify the full
  * phrase with one in-row `slice`+`array_join` comparison and count per
  * (doc, phrase). All codegen, one narrow fan-out, one broadcast join, one
  * aggregation; occurrences at overlapping positions each count (per start
  * position), and a phrase truncated by the document end cannot false-match
  * because the joined equality compares the full phrase string.
  *
  * Scale: cost is (token volume) + (first-token match volume). A dictionary
  * whose phrases start with stopwords degrades the join's selectivity — at
  * 100 TB either key the dictionary by its rarest token (verify with a
  * window around the position) or switch to an Aho-Corasick automaton in
  * `mapPartitions`; the join form stays the default because it is
  * whole-stage-codegen and needs no per-executor automaton build.
  */
object PhraseTag {

  /** @param phrases space-separated multi-token phrases (deterministic
    *                dictionary — broadcast, one row per phrase)
    * @return (doc_id, phrase, hits) — inner: only matched pairs appear
    */
  def tagPhrases(docs: DataFrame, idCol: String, textCol: String,
                 phrases: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pdf = phrases.map(ph => (ph, ph.split(" ").head, ph.split(" ").length))
      .toDF("phrase", "first_tok", "n_toks")
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      .select(col("doc_id"), col("t"), posexplode(col("t")).as(Seq("i", "tok")))
      .join(broadcast(pdf), col("tok") === col("first_tok"))
      .filter(array_join(slice(col("t"), col("i") + 1, col("n_toks")), " ")
        === col("phrase"))
      .groupBy(col("doc_id"), col("phrase"))
      .agg(count(lit(1)).as("hits"))
  }
}
