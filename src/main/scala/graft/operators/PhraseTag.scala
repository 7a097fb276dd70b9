package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-level Aho-Corasick automaton over a phrase dictionary: the classic
  * multi-pattern matcher (goto trie + BFS failure links + output links),
  * with TOKENS as the alphabet so a "phrase" is a token sequence exactly as
  * [[PhraseTag.tagPhrases]] defines it. One pass over a document's token
  * stream reports every occurrence of every dictionary phrase (overlaps
  * included, matches at a position for several phrases included — the
  * output-link chain carries phrases that end inside longer ones), in
  * O(tokens + matches) regardless of how unselective any single phrase
  * token is. Built once per executor partition from the broadcast phrase
  * list — never serialized.
  */
final class TokenAhoCorasick(phrases: Seq[String]) {
  // A phrase with no tokens would land its output on the ROOT node (a hit
  // at every position), and an empty token inside a phrase would collapse
  // under the split where the join form matches the literal string — both
  // diverge from tagPhrases' contract, so they are rejected at build.
  require(phrases.forall(p => p.nonEmpty && p.split(" ", -1).forall(_.nonEmpty)),
    "dictionary phrases must be non-empty with single-space-separated " +
      s"non-empty tokens; got: ${phrases.filterNot(p => p.nonEmpty && p.split(" ", -1).forall(_.nonEmpty))}")
  private val phraseToks: Array[Array[String]] =
    phrases.map(_.split(" ")).toArray
  private val goto_ = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.HashMap.empty[String, Int])
  private val fail = scala.collection.mutable.ArrayBuffer(0)
  private val out = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

  // trie
  phraseToks.zipWithIndex.foreach { case (toks, pi) =>
    var v = 0
    toks.foreach { t =>
      v = goto_(v).getOrElseUpdate(t, {
        goto_ += scala.collection.mutable.HashMap.empty[String, Int]
        fail += 0
        out += Nil
        goto_.length - 1
      })
    }
    out(v) = pi :: out(v)
  }
  // BFS failure links; output links fold into the per-node output list
  private val queue = scala.collection.mutable.Queue.empty[Int]
  goto_(0).valuesIterator.foreach { c => fail(c) = 0; queue += c }
  while (queue.nonEmpty) {
    val v = queue.dequeue()
    goto_(v).foreach { case (t, c) =>
      var f = fail(v)
      while (f != 0 && !goto_(f).contains(t)) f = fail(f)
      fail(c) = if (goto_(f).contains(t) && goto_(f)(t) != c) goto_(f)(t) else 0
      out(c) = out(c) ++ out(fail(c))
      queue += c
    }
  }

  /** Occurrence counts per phrase index over one token stream. */
  def countMatches(tokens: Array[String]): scala.collection.Map[Int, Long] = {
    val hits = scala.collection.mutable.HashMap.empty[Int, Long]
    var state = 0
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      while (state != 0 && !goto_(state).contains(t)) state = fail(state)
      state = goto_(state).getOrElse(t, 0)
      out(state).foreach(pi => hits.update(pi, hits.getOrElse(pi, 0L) + 1L))
      i += 1
    }
    hits
  }

  /** Phrase string for an index — the automaton's output vocabulary. */
  def phrase(pi: Int): String = phraseToks(pi).mkString(" ")
}

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
  * whose phrases start with stopwords degrades the join's selectivity; the
  * [[tagPhrasesAutomaton]] path is immune (O(tokens + matches) per document,
  * no shuffle at all) and is spec-proven output-identical.
  *
  * Measured rule (min-of-3 warm, local[32], 7-phrase dictionaries):
  * the automaton beat the join at BOTH harness scales and BOTH dictionary
  * shapes — sf0.01 selective 0.42 s → 0.16 s, stopword-led 0.29 s → 0.12 s;
  * sf0.1 selective 0.35 s → 0.12 s, stopword-led 0.28 s → 0.12 s — because
  * skipping the token fan-out + aggregation shuffle outweighs leaving
  * whole-stage codegen at every setting tested. The join form stays the
  * registered default on composability grounds (it is pure Catalyst:
  * prunable, AQE-replannable, and fuses into surrounding codegen stages
  * where the `mapPartitions` automaton is an optimizer barrier), but the
  * measured guidance is: reach for [[tagPhrasesAutomaton]] whenever phrase
  * tagging is the dominant stage of a job, and unconditionally once the
  * dictionary leads with stopwords or grows past broadcast-join comfort
  * (the automaton's state is per-executor and never enters a plan).
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

  /** The [[TokenAhoCorasick]] form of [[tagPhrases]] — identical output
    * (spec-proven on planted overlap/truncation/stopword corpora and on the
    * harness corpus), different cost model: one automaton pass per document,
    * O(tokens + matches), immune to an unselective first token. The
    * automaton builds once per partition from the broadcast dictionary and
    * each document aggregates its own counts in the pass, so the operator
    * emits finished (doc, phrase, hits) rows with NO shuffle at all —
    * against the join form's token fan-out + broadcast join + one
    * aggregation shuffle.
    */
  def tagPhrasesAutomaton(docs: DataFrame, idCol: String, textCol: String,
                          phrases: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(phrases)
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = new TokenAhoCorasick(bc.value) // built once per partition
        it.flatMap { case (id, text) =>
          ac.countMatches(text.split(" ")).iterator
            .map { case (pi, n) => (id, ac.phrase(pi), n) }
        }
      }
      .toDF("doc_id", "phrase", "hits")
  }
}
