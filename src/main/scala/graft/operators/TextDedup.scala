package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Document-deduplication family for large-scale training-data pipelines:
  *
  *   - exact dedup: content-hash groupBy (one shuffle on the hash);
  *   - exact n-gram Jaccard: shingle equi-join — the scalable exact algorithm
  *     (pairs only materialize for docs sharing a shingle; no O(n²) cross
  *     product), with pure-integer threshold comparison;
  *   - MinHash + LSH banding: signature → band keys → bucket join, the
  *     sub-quadratic candidate generator for when even the shingle join is too
  *     hot (very frequent shingles at 100 TB);
  *   - SimHash: 64-bit near-dup signature via a merge-safe typed Aggregator.
  *
  * Scale notes: every stage is groupBy/join on a derived key — shuffles are on
  * (hash, shingle, band, doc-pair) keys, all high-cardinality. The known skew
  * risk is frequent shingles (stopword runs); `jaccardPairs` takes a
  * `maxShingleFreq` cutoff — dropping shingles shared by more than N docs — the
  * standard prefix-filter trick; at the default it is a no-op on the harness
  * data but caps the join blow-up at scale.
  */
object TextDedup {

  /** Exact dedup: canonical (min-id) row per distinct content hash. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), md5(col(textCol).cast("binary")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("content_hash"), col("n_copies"))

  /** Streaming exact dedup for a document ingest stream: keep the first row
    * per content hash within the watermark horizon (bounded state; the
    * batch/streaming dispatch lives in [[Dedup]]). Rows keep their original
    * columns plus `content_hash`.
    */
  def exactDedupStream(docs: DataFrame, textCol: String,
                       eventTimeCol: String, delay: String): DataFrame =
    Dedup(docs.withColumn("content_hash", md5(col(textCol).cast("binary"))),
      eventTimeCol, delay, Seq("content_hash"))

  /** (doc_id, shingle) pairs: distinct word n-grams per document, via the
    * native codegen'd [[graft.functions.ShinglesExpression]] (docs with fewer
    * than n tokens yield zero shingles; explode drops them).
    */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.ShinglesExpression.shingles(col(textCol), n)).as("shingle"))
      .distinct()

  /** Exact n-gram Jaccard near-dup pairs via shingle equi-join.
    *
    * Emits (doc_a, doc_b, inter, size_a, size_b) for pairs whose Jaccard
    * `inter / (size_a + size_b - inter)` ≥ `thresholdPct`/100 — compared in
    * integer arithmetic (`inter * 100 >= pct * union`), no floats.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String, n: Int,
                   thresholdPct: Int, maxShingleFreq: Long = Long.MaxValue): DataFrame =
    shingleIntersections(docs, idCol, textCol, n, maxShingleFreq)
      .filter(col("inter") * 100 >= lit(thresholdPct) * (col("size_a") + col("size_b") - col("inter")))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("size_a"), col("size_b"))

  /** Directional shingle-containment pairs: |A∩B| / |A| ≥ `thresholdPct`/100,
    * emitted as (contained, container). Containment is the asymmetric cousin
    * of Jaccard and is the signal for SUBSET duplication — a short document
    * quoted or embedded whole inside a longer one scores near 100% here while
    * its symmetric Jaccard (normalized by the union) can sit far below any
    * dedup threshold. Both directions of each unordered candidate pair are
    * tested, so mutual near-dups yield two rows (a⊂b and b⊂a) — that is the
    * semantics, not a bug: the downstream keep-decision for "a is inside b"
    * (drop a) differs from "a and b are twins" (keep either). Same shuffle
    * shape and prefix-filter cap as [[jaccardPairs]] — the direction split is
    * a post-aggregation projection, not an extra join.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String, n: Int,
                       thresholdPct: Int, maxShingleFreq: Long = Long.MaxValue): DataFrame = {
    val w = shingleIntersections(docs, idCol, textCol, n, maxShingleFreq)
    val dirA = w.filter(col("inter") * 100 >= lit(thresholdPct) * col("size_a"))
      .select(col("doc_a").as("contained"), col("doc_b").as("container"),
        col("inter"), col("size_a").as("sz_contained"), col("size_b").as("sz_container"))
    val dirB = w.filter(col("inter") * 100 >= lit(thresholdPct) * col("size_b"))
      .select(col("doc_b").as("contained"), col("doc_a").as("container"),
        col("inter"), col("size_b").as("sz_contained"), col("size_a").as("sz_container"))
    dirA.union(dirB)
  }

  /** Shared exact-pair stage: distinct-shingle equi-join → per-pair
    * intersection counts with both docs' shingle-set sizes attached,
    * unthresholded — [[jaccardPairs]] and [[containmentPairs]] differ only in
    * the normalization they filter by, and a composed pipeline that needs
    * BOTH signals (the decision table) checkpoints this frame once and
    * filters it twice instead of running two candidate joins. The
    * `maxShingleFreq` prefix-filter cap is the 100 TB skew guard.
    *
    * The join/aggregation keys are the shingles' 64-bit xxhash64 values, not
    * the strings — the shuffle moves fixed 8-byte keys instead of n-word
    * text. Counts are exact unless two DISTINCT shingles of the same
    * candidate pair collide in 64 bits (P ≈ sz_a·sz_b/2⁶⁴ per pair — the
    * same accepted argument as [[minhashSignatures]]' carried hash sets).
    */
  def shingleIntersections(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, maxShingleFreq: Long = Long.MaxValue): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    val filtered =
      if (maxShingleFreq == Long.MaxValue) sh
      else {
        val hot = sh.groupBy("shingle").agg(count(lit(1)).as("f"))
          .filter(col("f") > maxShingleFreq).select("shingle")
        sh.join(hot, Seq("shingle"), "left_anti")
      }
    val sizes = filtered.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = filtered.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = filtered.select(col("doc_id").as("doc_b"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "size_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "size_b"), "doc_b")
  }

  /** Universal-hash family over the 31-bit Mersenne prime — shared with the
    * per-row [[graft.functions.MinHashSigExpression]] (streaming probe side)
    * via [[graft.functions.MinHashFamily]] so both draw identical parameters.
    */
  private val P31 = graft.functions.MinHashFamily.P31
  private def perm(i: Int): (Long, Long) = graft.functions.MinHashFamily.perm(i)

  /** MinHash signature: numHashes min-values over the shingle hash set, plus
    * the shingle-set size `sz` — ONE aggregation emits both (every column is a
    * partial-aggregatable min/count), so the candidate-verify stage needs no
    * second pass over the shingle table for sizes. With `withShingleSet` the
    * same aggregation also carries the doc's distinct shingle set as FULL
    * 64-bit hashes (`collect_set(xxhash64(shingle))`, partial-aggregatable
    * too), which lets the verify stage compute intersections per candidate
    * pair via `array_intersect` on primitive longs instead of re-joining the
    * exploded shingle table twice and re-grouping — three fewer shuffles and
    * a ~2x smaller cached table than carrying the strings. Hashed-set
    * intersection equals string-set intersection unless two distinct shingles
    * of the same candidate pair collide in 64 bits: P ≈ sz_a·sz_b/2^64 per
    * pair (~1e-16 at 50-token docs), orders below the LSH banding's own
    * documented miss probability, so the exactness argument is unchanged in
    * kind. (The 31-bit `pmod` domain used for the SIGNATURE mins is NOT
    * reused here — at 2^-31 a per-pair collision would be plausible.)
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int,
                        withShingleSet: Boolean = false): DataFrame = {
    val h = pmod(xxhash64(col("shingle")), lit(P31))
    val sigCols = (0 until numHashes).map { i =>
      val (a, b) = perm(i)
      min(pmod(h * a + b, lit(P31))).as(s"mh_$i")
    } ++ Seq(count(lit(1)).as("sz")) ++
      (if (withShingleSet) Seq(collect_set(xxhash64(col("shingle"))).as("sh_set")) else Nil)
    sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
  }

  /** (band, bucket) key structs from per-function signature columns —
    * `mh(i)` supplies the i-th min-hash value. Shared by the batch banding
    * (named `mh_i` columns) and the streaming probe (`element_at` on the
    * signature array) so both sides hash into IDENTICAL buckets.
    */
  private def bandStructs(mh: Int => Column, numHashes: Int, rowsPerBand: Int): Seq[Column] = {
    val numBands = numHashes / rowsPerBand
    (0 until numBands).map { bnd =>
      val members = (0 until rowsPerBand).map(r => mh(bnd * rowsPerBand + r))
      struct(lit(bnd).as("band"), xxhash64(concat_ws("_", members: _*)).as("bucket"))
    }
  }

  /** LSH banding: hash `rowsPerBand` signature values per band into a bucket
    * key; docs sharing any (band, bucket) become candidate pairs.
    */
  def lshCandidatePairs(signatures: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val banded = signatures
      .select(col("doc_id"),
        explode(array(bandStructs(i => col(s"mh_$i"), numHashes, rowsPerBand): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** MinHash-LSH near-dup pairs, exact-verified: LSH candidates (sub-quadratic)
    * → exact Jaccard check on just the candidates, as ONE lazy plan.
    *
    * The signature table feeds four consumers (both sides of the LSH bucket
    * self-join and both sides of the candidate verify). Column pruning splits
    * them into two pairwise-IDENTICAL aggregation pipelines — (minhash
    * columns) for the banding sides, (sz, sh_set) for the verify sides — and
    * AQE's runtime query-stage reuse executes each pipeline ONCE, so the
    * corpus is scanned twice, not four times (measured: input rows = 2x the
    * doc count, and less total shuffle than the persist-based alternative).
    * Verification is a per-pair `array_intersect` on the carried hash sets —
    * no re-join against exploded shingles, no per-pair re-aggregation.
    *
    * Deliberately NOT cached: persisting the signature table costs a
    * corpus-sized columnar cache write plus an extra materialization job, and
    * measured slower at every scale factor than the second pruned scan it
    * saves. It also kept lifecycle state out of the operator — the result is
    * a plain lazy DataFrame the caller composes like any other.
    */
  def minhashDedupPairs(docs: DataFrame, idCol: String, textCol: String, n: Int,
                        thresholdPct: Int, numHashes: Int = 32,
                        rowsPerBand: Int = 4): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    val sigs = minhashSignatures(sh, numHashes, withShingleSet = true)
    minhashDedupPairsFromSigs(sigs, numHashes, rowsPerBand, thresholdPct)
  }

  /** The LSH candidate → exact-verify stage over a PRE-BUILT signature frame
    * (a [[minhashSignatures]] result with `withShingleSet = true`) — the seam
    * a composed pipeline uses to share ONE shingle/signature build across
    * several consumers of the LSH path. Pure composition:
    * [[minhashDedupPairs]] is exactly shingles → signatures → this.
    */
  def minhashDedupPairsFromSigs(sigs: DataFrame, numHashes: Int, rowsPerBand: Int,
                                thresholdPct: Int): DataFrame = {
    val cands = lshCandidatePairs(sigs, numHashes, rowsPerBand)
    val sets = sigs.select(col("doc_id"), col("sz"), col("sh_set"))
    cands
      .join(sets.select(col("doc_id").as("doc_a"), col("sz").as("size_a"),
        col("sh_set").as("set_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sz").as("size_b"),
        col("sh_set").as("set_b")), "doc_b")
      // spread the per-pair intersection onto the PAIR key before computing
      // it: the attach joins leave the stage partitioned by doc_b, and a hot
      // doc (boilerplate that LSH-collides with many others) concentrates
      // its whole candidate list in one task (guide §2.5 — measured: the
      // verify stage ran maxTask ≈ stage wall). Pair keys are unique, so
      // hashing on them cannot skew; rows are unchanged.
      .repartition(col("doc_a"), col("doc_b"))
      // exact intersection of the two distinct-shingle sets; cast keeps the
      // former count()-based LongType schema
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .filter(col("inter") * 100 >= lit(thresholdPct) * (col("size_a") + col("size_b") - col("inter")))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("size_a"), col("size_b"))
  }


  /** Static LSH index over a reference corpus, for stream probing: one row
    * per (band, bucket) membership carrying the doc's size and distinct
    * shingle-hash set. Build once per corpus snapshot; at scale, write it
    * bucketed by (band, bucket) so probe joins co-locate without a shuffle
    * of the index side.
    */
  def lshBandedIndex(docs: DataFrame, idCol: String, textCol: String, n: Int,
                     numHashes: Int = 32, rowsPerBand: Int = 4): DataFrame = {
    val sigs = minhashSignatures(shingles(docs, idCol, textCol, n), numHashes,
      withShingleSet = true)
    sigs.select(col("doc_id"), col("sz"), col("sh_set"),
        explode(array(bandStructs(i => col(s"mh_$i"), numHashes, rowsPerBand): _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("doc_id"), col("sz"), col("sh_set"))
  }

  /** Streaming near-dup probe: for every arriving document, emit its verified
    * near-dup matches against a static corpus index ([[lshBandedIndex]]) —
    * the ingest-time "is this already in my training set" shape.
    *
    * Fully narrow until the bucket join: the per-doc signature + hash set
    * come from the native [[graft.functions.MinHashSigExpression]] (a
    * mid-pipeline explode/groupBy aggregation would not be expressible in an
    * append-mode streaming plan, and would shuffle besides), banding is an
    * `element_at` projection, and the stream-static equi-join on
    * (band, bucket) needs no watermark or state for the join itself. Each
    * candidate is exact-verified in place via `array_intersect` against the
    * index row's carried set. A pair agreeing on several bands emits once:
    * duplicates are dropped within the watermark horizon (bounded state).
    * Docs with no shingles (< n tokens) are filtered — an empty set is not a
    * near-dup of anything. Self-matches (probe id present in the index) pass
    * through at Jaccard 1; callers that re-probe their own corpus filter ids.
    */
  def nearDupProbeStream(stream: DataFrame, idCol: String, textCol: String,
                         eventTimeCol: String, delay: String, index: DataFrame,
                         n: Int, thresholdPct: Int, numHashes: Int = 32,
                         rowsPerBand: Int = 4): DataFrame =
    nearDupProbeFrame(stream, idCol, textCol, Seq(col(eventTimeCol)), index,
      n, thresholdPct, numHashes, rowsPerBand)
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(Seq("probe_id", "match_id"))

  /** The probe core, shape-agnostic (one output row per verified matching
    * band — callers dedupe per their execution mode: the streaming wrapper
    * within the watermark, batch callers with a plain `distinct`).
    * `carryCols` are passed through unchanged (e.g. the event-time column).
    */
  def nearDupProbeFrame(df: DataFrame, idCol: String, textCol: String,
                        carryCols: Seq[Column], index: DataFrame,
                        n: Int, thresholdPct: Int, numHashes: Int,
                        rowsPerBand: Int): DataFrame = {
    val mh = graft.functions.MinHashSigExpression
      .minhashSig(graft.functions.ShinglesExpression.shingles(col(textCol), n), numHashes)
    val enriched = df
      .select(col(idCol).as("probe_id") +: carryCols :+ mh.as("mh"): _*)
      .withColumn("sig", col("mh.sig"))
      .withColumn("probe_set", col("mh.set"))
      .withColumn("probe_sz", size(col("mh.set")).cast("long"))
      .drop("mh")
      .filter(col("probe_sz") > 0)
    val banded = enriched
      .withColumn("bb", explode(array(bandStructs(i => element_at(col("sig"), i + 1),
        numHashes, rowsPerBand): _*)))
      .withColumn("band", col("bb.band"))
      .withColumn("bucket", col("bb.bucket"))
      .drop("sig", "bb")
    banded.join(index, Seq("band", "bucket"))
      .withColumn("inter", size(array_intersect(col("probe_set"), col("sh_set"))).cast("long"))
      .filter(col("inter") * 100 >= lit(thresholdPct) * (col("probe_sz") + col("sz") - col("inter")))
      .withColumnRenamed("doc_id", "match_id")
      .withColumnRenamed("probe_sz", "size_probe")
      .withColumnRenamed("sz", "size_match")
      .drop("band", "bucket", "probe_set", "sh_set")
  }

  /** Merge-safe SimHash: per 64 bit positions, sum ±1 weighted by token-hash
    * bit, sign → signature bit. Buffer is the 64 counters, so partial
    * aggregates combine correctly (map-side combine applies).
    */
  val simhashAgg: Aggregator[Long, Array[Int], Long] =
    new Aggregator[Long, Array[Int], Long] {
      def zero: Array[Int] = new Array[Int](64)
      def reduce(buf: Array[Int], tokenHash: Long): Array[Int] = {
        var i = 0
        while (i < 64) {
          if (((tokenHash >>> i) & 1L) == 1L) buf(i) += 1 else buf(i) -= 1
          i += 1
        }
        buf
      }
      def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
        var i = 0
        while (i < 64) { x(i) += y(i); i += 1 }
        x
      }
      def finish(buf: Array[Int]): Long = {
        var sig = 0L
        var i = 0
        while (i < 64) { if (buf(i) > 0) sig |= (1L << i); i += 1 }
        sig
      }
      def bufferEncoder: org.apache.spark.sql.Encoder[Array[Int]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
      def outputEncoder: org.apache.spark.sql.Encoder[Long] =
        org.apache.spark.sql.Encoders.scalaLong
    }

  /** 60-bit token hash from the leading 15 hex chars of md5 — deterministic
    * and expressible in BOTH engines (DuckDB: `CAST('0x' || substring(md5(t),
    * 1, 15) AS BIGINT)`), which is what makes the simhash pipeline
    * oracle-checkable; xxhash64 has no DuckDB twin. 60 bits < 2^63 keeps the
    * ANSI string→long cast overflow-free; simhash bits 60-63 are then
    * constantly zero (every token votes -1), which costs 4 of 64 signature
    * bits — the banding keys still carry 12+ varying bits per 16-bit band.
    */
  def tokenHash60(token: Column): Column =
    conv(substring(md5(token.cast("binary")), 1, 15), 16, 10).cast("long")

  /** (doc_id, simhash) via token explode + typed aggregation. */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("token"))
      .select(col("doc_id"), tokenHash60(col("token")).as("th"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(simhashAgg.toColumn.name("simhash"))
      .toDF("doc_id", "simhash")
  }

  /** Hamming distance between two 64-bit signatures as a Column. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 §4 — the MOSS scheme): hash every k-token shingle, slide a
    * window of w consecutive shingle hashes per document, keep the MINIMUM
    * hash of each window (rightmost occurrence on ties). The distinct
    * selected hashes are the document's fingerprint set, with the paper's
    * guarantee: any run of ≥ w + k − 1 tokens shared by two documents
    * selects at least one common fingerprint — positional independence the
    * stride-8 passage sampling (`q_passage_overlap`) cannot give (a stride
    * scheme only catches repeats whose alignment offsets agree mod the
    * stride).
    *
    * Determinism: the shingle hash is the leading-10-hex md5 value (40
    * bits, DuckDB-mirrorable), and min-with-rightmost-tie is ONE integer
    * key min — key = h·2²⁰ + (2²⁰ − 1 − i) — so the whole selection is a
    * sliding-frame `min` window both engines evaluate identically. The
    * position field caps documents at 2²⁰ tokens (chunk larger docs
    * upstream; harness docs are orders below it).
    *
    * Scale: one narrow shingle fan-out, ONE exchange on the doc id for the
    * per-document sliding window (bounded frame, O(w) work per row), then
    * whatever the consumer aggregates. Window starts run
    * i ≤ max(n_shingles − w + 1, 1), the frame clipping at the partition
    * end — so a short document (fewer than w shingles) still emits its
    * single all-shingle minimum, never zero fingerprints (as long as it has
    * ≥ k tokens).
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 4, w: Int = 4): DataFrame = {
    val P = 1L << 20
    val toks = split(col(textCol), " ")
    val gram = array_join(slice(col("t"), col("i").cast("int"), lit(k)), " ")
    val h = conv(substring(md5(gram.cast("binary")), 1, 10), 16, 10).cast("long")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    docs
      .select(col(idCol).as("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("n"),
        explode(sequence(lit(1L), (size(col("t")) - (k - 1)).cast("long"))).as("i"))
      .select(col("doc_id"), col("n"), col("i"),
        (h * P + (lit(P - 1) - col("i"))).as("key"))
      .withColumn("sel", min(col("key")).over(win))
      .filter(col("i") <= greatest(col("n") - lit((k + w - 2).toLong), lit(1L)))
      .select(col("doc_id"), expr(s"sel div ${P}L").as("fp"))
      .distinct()
  }

  /** SimHash near-dup pairs via 16-bit banding (pigeonhole: two signatures
    * within Hamming distance 3 must agree on at least one of the 4 bands, so
    * recall is exact for maxHamming ≤ 3; above that it is approximate).
    * Scale: bucket join on (band, key) — sub-quadratic like the LSH path; no
    * all-pairs product.
    */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3): DataFrame = {
    val sig = simhashSignatures(docs, idCol, textCol)
    val bands = (0 until 4).map { bnd =>
      struct(lit(bnd).as("band"),
        shiftright(col("simhash"), bnd * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
    }
    val banded = sig
      .select(col("doc_id"), col("simhash"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.key"))
    val l = banded.select(col("band"), col("key"),
      col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val r = banded.select(col("band"), col("key"),
      col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    l.join(r, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hammingDist(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
