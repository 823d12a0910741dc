package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, quality scoring, language ID, and fingerprinting.
  *
  * Everything here is built from codegen'd `sql.functions` (no UDFs), so
  * each operator stays inside WholeStageCodegen and runs as a single
  * narrow projection over the scan — no shuffle, scales linearly with
  * input splits.
  */
object TextOps {

  /** Whitespace tokens. The corpus normalizes on single spaces; a regex
    * split ("\\s+") is equivalent here and either stays codegen'd. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword-ish tokens: letter runs, digit runs, or single
    * non-space symbols — the usual pre-tokenizer regex shape. */
  val BpeTokenRe = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenRe), lit(0))

  /** Per-document token counts (whitespace + BPE-ish) and char length. */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(tokens(col(textCol))).cast("long").as("n_tok_ws"),
      size(bpeTokens(col(textCol))).cast("long").as("n_tok_bpe"),
      length(col(textCol)).cast("long").as("n_chars"))

  /** English-ish stopwords used by the quality score. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Heuristic quality score: token count, stopword hits, stopword
    * ratio, and mean token length. Ratios are exact int/int double
    * divisions so results are independent of partitioning.
    *
    * Computed as explode → conditional aggs, NOT as per-row HOF
    * filters/folds over the token array: HOF lambdas evaluate
    * interpreted outside whole-stage codegen, and these arrays scale
    * with document size — the explode→agg plan stays codegen'd end to
    * end and partial-aggregates map-side (same reformulation as
    * simhash/fingerprint; no doc is lost because `split` never yields
    * an empty array). One shuffle on the doc id. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tok"),
        sum(when(col("__tok").isin(Stopwords: _*), 1L).otherwise(0L)).as("stop_cnt"),
        sum(length(col("__tok")).cast("long")).as("__chars"))
      .select(
        col(idCol),
        col("n_tok"),
        col("stop_cnt"),
        (col("stop_cnt").cast("double") / col("n_tok")).as("stop_ratio"),
        (col("__chars").cast("double") / col("n_tok")).as("avg_tok_len"))

  /** Gopher/C4-style composite quality GATE: the rule battery a corpus
    * build runs doc-by-doc, each rule surfaced as its own boolean (so
    * downstream can audit WHICH rule killed a doc — the flags are the
    * product, not just the keep bit):
    *
    *  - `rule_words`:     word count within [minWords, maxWords]
    *  - `rule_word_len`:  mean word length in [3, 10] chars
    *  - `rule_symbols`:   symbol chars (# and …) ≤ 10% of words
    *  - `rule_bullets`:   ≤ 90% of lines start with a bullet (- or *)
    *  - `rule_alpha`:     ≥ 80% of words contain a letter
    *  - `rule_stopwords`: ≥ 2 DISTINCT common stopwords present
    *  - `keep`:           every rule passes
    *
    * All thresholds are integer cross-multiplications (10·sym ≤ n_tok,
    * 5·alpha ≥ 4·n_tok, …) — no float ratios, so the gate is exactly
    * oracle-checkable and partitioning-independent. Shape: doc-level
    * line/symbol counts ride the one explode→agg pass the other text
    * ops use (codegen'd conditional sums, map-side partials, one
    * shuffle on the doc id). */
  def gopherGates(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 5, maxWords: Int = 100000): DataFrame = {
    val t = col(textCol)
    val perDoc = docs.select(col(idCol),
      size(split(t, "\n")).cast("long").as("__lines"),
      regexp_count(t, lit("(^|\n)[-*] ")).cast("long").as("__bullets"),
      ((length(t) - length(replace(t, lit("#"), lit("")))) +
       (length(t) - length(replace(t, lit("…"), lit(""))))).cast("long").as("__syms"),
      // explode_outer: `split` never yields an empty array, but a NULL
      // text explodes to no rows with plain explode — the doc would
      // vanish from the gate output entirely, when a gate's contract is
      // flags for EVERY doc (null docs are exactly the ones to flag).
      explode_outer(tokens(t)).as("__tok"))
    val agged = perDoc.groupBy(col(idCol)).agg(
      count(col("__tok")).as("n_tok"), // non-null tokens; 0 for a null doc
      coalesce(sum(length(col("__tok")).cast("long")), lit(0L)).as("__chars"),
      sum(when(col("__tok").rlike("[A-Za-z]"), 1L).otherwise(0L)).as("__alpha"),
      countDistinct(when(col("__tok").isin(Stopwords: _*), col("__tok"))).as("__stopd"),
      coalesce(max(col("__lines")), lit(0L)).as("__lines"),
      coalesce(max(col("__bullets")), lit(0L)).as("__bullets"),
      coalesce(max(col("__syms")), lit(0L)).as("__syms"))
    val rules = Seq(
      "rule_words" -> (col("n_tok") >= minWords && col("n_tok") <= maxWords),
      "rule_word_len" -> (col("__chars") >= col("n_tok") * 3 &&
        col("__chars") <= col("n_tok") * 10),
      "rule_symbols" -> (col("__syms") * 10 <= col("n_tok")),
      "rule_bullets" -> (col("__bullets") * 10 <= col("__lines") * 9),
      "rule_alpha" -> (col("__alpha") * 5 >= col("n_tok") * 4),
      "rule_stopwords" -> (col("__stopd") >= 2))
    agged.select(
      col(idCol) +: col("n_tok") +:
      rules.map { case (n, c) => c.as(n) } :+
      rules.map(_._2).reduce(_ && _).as("keep"): _*)
  }

  /** Corpus normalization: lowercase, strip non-alphanumeric symbols,
    * collapse whitespace runs, trim — the canonical pre-dedup cleanup
    * pass. ONE fused regex pass: after `lower`, every character is
    * either [a-z0-9] or not, so "symbols → space, then collapse \s+"
    * equals "replace every [^a-z0-9]+ run with one space" — half the
    * per-byte regex cost of the two-pass form for identical output. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  def normalized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), normalize(col(textCol)).as("norm_text"),
      length(col(textCol)).cast("long").as("raw_len"),
      length(normalize(col(textCol))).cast("long").as("norm_len"))

  /** Marker-word profiles for the n-gram/stopword language heuristic.
    * Keys MUST iterate in alphabetical order — ties resolve to the
    * alphabetically-first language on both the Spark and oracle side. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "los", "las", "que", "es"),
    "fr" -> Seq("le", "les", "des", "est", "et"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  /** Language ID: count marker-word hits per language over the token
    * bag; predict the max-hit language, alphabetically-first on ties.
    *
    * One explode → 5 conditional sums (codegen'd, map-side partial),
    * replacing five interpreted HOF filter passes over the full token
    * array — see [[qualityScore]] for the rule. */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
    val hitAggs = LangMarkers.map { case (lang, words) =>
      sum(when(col("__tok").isin(words: _*), 1L).otherwise(0L)).as(s"hits_$lang")
    }
    val agged = tok.groupBy(col(idCol)).agg(hitAggs.head, hitAggs.tail: _*)
    val hits: Seq[(String, Column)] = LangMarkers.map { case (lang, _) =>
      lang -> col(s"hits_$lang")
    }
    // lang l wins if its hits >= every later language's hits and beats
    // (strictly) no earlier language — expressed as a first-match CASE
    // chain in alphabetical order with >= against the remaining max.
    val pred = hits.init.zipWithIndex.foldRight(lit(hits.last._1)) {
      case (((lang, h), i), els) =>
        // greatest() needs >=2 args; reduce returns the lone column as-is
        // for the singleton tail (the penultimate language).
        val restMax = hits.drop(i + 1).map(_._2).reduce((a, b) => greatest(a, b))
        when(h >= restMax, lang).otherwise(els)
    }
    agged.select(col(idCol) +: hits.map(_._2) :+ pred.as("pred_lang"): _*)
  }

  /** PII redaction — the compliance pass every training-data pipeline
    * runs before anything else sees the text: emails, IPv4 addresses,
    * and phone-shaped digit runs replaced by typed placeholders. Three
    * codegen'd regex passes, linear, no shuffle; patterns kept to the
    * regex subset whose semantics agree across engines (ASCII word
    * boundaries, no backrefs) so the op is exactly oracle-checkable. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  // '+' is a non-word char, so `\b\+?` could never match a leading
  // "+"-prefixed number (no boundary between space and '+') — the
  // alternation anchors on either the plus itself or a digit boundary
  val PhoneRe = "(\\+|\\b)\\d[\\d -]{7,}\\d\\b"
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Deterministic stratified sampling: keep a per-stratum percentage
    * of documents, selected by an md5-derived bucket of the id — NOT
    * `rand()`: the same row is kept on every engine, every run, every
    * partitioning, so downstream runs are reproducible and the sample
    * is exactly oracle-checkable. `rates` maps stratum value → keep
    * percentage (0-100); absent strata keep everything. The classic
    * language-rebalancing step of a multilingual corpus build. */
  def sampleBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"), lit(100))
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Int]): DataFrame = {
    val rate = rates.foldLeft(lit(100)) { case (els, (v, r)) =>
      when(col(stratumCol) === v, lit(r)).otherwise(els)
    }
    docs.filter(sampleBucket(col(idCol)) < rate)
  }

  /** Winnowing-style document fingerprint: the minimum MD5 over 5-word
    * shingles, plus the whole-content MD5. Two documents sharing a
    * fingerprint very likely share a 5-word run.
    *
    * Computed as explode → min-agg (codegen'd, map-side partial agg),
    * not `array_min(transform(...))` — HOF lambdas evaluate interpreted
    * and cost ~10s on 5k docs. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.dedup.Dedup.shingleRows(docs, idCol, textCol, 5)
      .groupBy(col(idCol))
      .agg(min(md5(col("shingle"))).as("min_shingle_fp"))
      .join(docs.select(col(idCol), md5(col(textCol)).as("content_fp")), idCol)
      .select(col(idCol), col("min_shingle_fp"), col("content_fp"))

  /** Intra-document repetition: total vs distinct n-gram counts and the
    * repeated fraction `1 − distinct/total` — the standard filter for
    * boilerplate/spam documents that repeat the same phrases (a
    * near-dup of itself). Uses NON-distinct gram rows
    * ([[graft.dedup.Dedup.gramRows]]); one hash-agg on the doc id,
    * partial-aggregated map-side, ratios exact int/int divisions.
    * Documents shorter than n tokens fall back to the whole text as
    * one gram (ratio 0), matching the shingle fallback. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame =
    graft.dedup.Dedup.gramRows(docs, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("shingle")).as("n_distinct"))
      .select(col(idCol), col("n_grams"), col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_grams")).as("rep_ratio"))

  /** Corpus-frequency rarity profile — the cheap perplexity proxy: per
    * document, the mean corpus frequency of its tokens and its hapax
    * count (tokens occurring exactly once corpus-wide). Rare-token-heavy
    * documents are candidate noise/garble; all-common documents are
    * candidate boilerplate.
    *
    * Two hash-aggs and one equi-join on the token value (vocabulary-
    * sized right side — Zipf keeps it tiny relative to the corpus, and
    * AQE broadcasts it when it fits). All counters are integers; the
    * single final division is int/int, so values are bit-identical on
    * any engine — deliberately NOT a floating mean-log-prob, whose
    * unordered double sum would be partitioning-dependent. */
  def rarityStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
    val freq = tok.groupBy(col("__tok")).agg(count(lit(1)).as("__cnt"))
    tok.join(freq, "__tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        sum(col("__cnt")).as("sum_freq"),
        sum(when(col("__cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col(idCol), col("n_tok"), col("sum_freq"), col("n_hapax"),
        (col("sum_freq").cast("double") / col("n_tok")).as("avg_tok_freq"))
  }

  /** Corpus-trained bigram-LM cross-entropy — the real (CCNet-style)
    * perplexity quality filter, not the integer proxy ([[rarityStats]]):
    * train add-k-smoothed bigram counts over the WHOLE corpus, then
    * score each document by its mean negative log-probability
    * `xent = -(1/N) Σ ln((c(w1,w2)+k) / (c(w1)+k·V))`. High-xent docs
    * are garble, low-xent docs boilerplate — both filter targets.
    *
    * Float determinism: a raw double sum over bigrams would be
    * partial-agg-order dependent AND libm-dependent (Spark's
    * `Math.log` vs another engine's `std::log` differ in the last
    * ulp). Each per-bigram log term is therefore quantized to integer
    * micro-nats (`round(-ln(p)·1e6) AS BIGINT`) BEFORE the per-doc
    * sum — integer addition is exactly commutative, so the result is
    * partitioning-independent, and the 1e-6 grid absorbs sub-ulp libm
    * disagreement. The one division at the end has exact integer
    * operands.
    *
    * Scale shape, 100 TB: the bigram projection is a per-doc window
    * (partitioned by doc id — no global window); the count-model
    * tables are two hash-aggs over it, Zipf-small relative to the
    * corpus; scoring is two equi-joins (the unigram side broadcasts
    * under AQE) plus a 1-row vocabulary cross-join; the final agg is
    * map-side-combinable integers. Documents with fewer than two
    * tokens have no bigrams and are excluded (matching the oracle). */
  def bigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
                         k: Double = 1.0): DataFrame = {
    val toks = docs
      .select(col(idCol), posexplode(tokens(col(textCol))))
      .select(col(idCol), col("pos"), col("col").as("__w1"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val big = toks
      .withColumn("__w2", lead(col("__w1"), 1).over(w))
      .filter(col("__w2").isNotNull)
      .select(col(idCol), col("__w1"), col("__w2"))
    val cb = big.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__c12"))
    val cu = big.groupBy(col("__w1")).agg(count(lit(1)).as("__c1"))
    val vocab = toks.agg(countDistinct(col("__w1")).as("__v"))
    big.join(cb, Seq("__w1", "__w2")).join(cu, Seq("__w1")).crossJoin(vocab)
      .select(col(idCol),
        round(-log((col("__c12") + lit(k)) / (col("__c1") + lit(k) * col("__v"))) * lit(1e6))
          .cast("long").as("__lpq"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lpq")).as("__s"))
      .select(col(idCol), col("n_bigrams"),
        (col("__s").cast("double") / col("n_bigrams") / lit(1e6)).as("xent"))
  }

  /** BM25 top-k retrieval (Lucene/Okapi scoring) for a literal term
    * query over the corpus — the classic keyword-search ranking:
    * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with `idf(t) = ln(1 + (N−df+0.5)/(df+0.5))`.
    *
    * Same float-determinism discipline as [[bigramCrossEntropy]]: each
    * per-term score quantizes to integer micro-units before the
    * per-doc sum, and every double expression is structured
    * identically to the oracle so the single final division is over
    * exact integers. Ranking ties break on the id column, so the
    * top-k set is total-order deterministic.
    *
    * Scale shape, 100 TB: token stream filtered to the query terms
    * BEFORE any aggregation (the tf table is query-sized, not
    * corpus-sized); doc lengths are one map-side-combinable agg;
    * corpus stats ride a 1-row cross-join; the final top-k is
    * `orderBy.limit` = TakeOrdered (per-partition heaps + driver
    * merge of k rows, no global sort shuffle). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
    val dl = tok.groupBy(col(idCol)).agg(count(lit(1)).as("__dlen"))
    val stats = dl.agg(count(lit(1)).as("__n_docs"), sum(col("__dlen")).as("__tot"))
    val tf = tok.filter(col("__tok").isin(terms: _*))
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val avgdl = col("__tot").cast("double") / col("__n_docs")
    val idf = log((col("__n_docs") - col("__df") + lit(0.5)) /
      (col("__df") + lit(0.5)) + lit(1.0))
    val tfPart = (col("__tf") * (lit(k1) + lit(1.0))) /
      (col("__tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dlen") / avgdl))
    tf.join(dfreq, Seq("__tok")).join(dl, Seq(idCol)).crossJoin(stats)
      .select(col(idCol), round(idf * tfPart * lit(1e6)).cast("long").as("__s"))
      .groupBy(col(idCol))
      .agg((sum(col("__s")).cast("double") / lit(1e6)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Benchmark decontamination — the train/test-overlap gate every
    * training-data pipeline runs: flag documents sharing any word
    * n-gram with a benchmark/eval set. Candidate generation is an
    * equi-join on the gram VALUE against the (small, broadcast)
    * benchmark gram set — never a containment scan of every document
    * against every benchmark entry; at 100 TB the corpus side is one
    * shingle projection and the join probes a broadcast hash table.
    * Returns every document with its matched-gram count and flag. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, n: Int = 5): DataFrame = {
    val bmGrams = broadcast(
      graft.dedup.Dedup.shingleRows(benchmark, idCol, textCol, n)
        .select(col("shingle")).distinct())
    val hits = graft.dedup.Dedup.shingleRows(docs, idCol, textCol, n)
      .join(bmGrams, "shingle")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("is_contaminated", col("n_hits") > 0)
  }

  /** Corpus mixing to TARGET PROPORTIONS — the step after per-stratum
    * sampling: given target shares (percent) per stratum value and a
    * sample budget of half the corpus, derive each stratum's keep-rate
    * `min(100, ⌊share% × budget / stratum_count⌋)` and sample
    * deterministically by the md5 bucket of the id (reproducible
    * across runs/partitionings/engines, like [[stratifiedSample]]).
    * Under-represented strata cap at 100% — availability bounds the
    * achieved mix, the formula never oversamples.
    *
    * Scale shape: one count scalar + a stratum-cardinality aggregate
    * broadcast back; the sample itself is a codegen'd filter over the
    * scan. All rate math is integer-exact (floor of an int product
    * ratio), so the judged rows hash-match the oracle. */
  def mixCorpus(docs: DataFrame, idCol: String, stratumCol: String,
                sharesPct: Map[String, Int]): DataFrame = {
    val budget = docs.count() / 2
    val counts = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("__cnt"))
    val share = sharesPct.foldLeft(lit(0)) { case (els, (v, p)) =>
      when(col(stratumCol) === v, lit(p)).otherwise(els)
    }
    docs.join(broadcast(counts), stratumCol)
      .withColumn("rate",
        least(lit(100L), floor(share.cast("long") * budget / col("__cnt")).cast("long")))
      .filter(sampleBucket(col(idCol)) < col("rate"))
      .select(col(idCol), col(stratumCol), col("rate"))
  }

  /** Token-budget sharding for training-shard assembly: documents in id
    * order are assigned to packs of ~`budget` tokens each —
    * `pack_id = ⌊(running token count before this doc) / budget⌋`.
    * Deterministic and boundary-straddling (a doc whose tokens cross a
    * boundary belongs to the pack its first token falls in); strict
    * caps would split documents, which is a tokenizer-side concern.
    *
    * Scale shape mirrors [[graft.ops.KeyGenStrategy.Scalable]]: range-
    * repartition + sort by id, per-partition running sums, and a tiny
    * per-partition total aggregate whose prefix sums broadcast back as
    * offsets — a global running sum with NO single-partition window.
    * The `localCheckpoint` pins the sample-based range partitioning so
    * the totals pass and the cumsum pass see identical partitions. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Long): DataFrame =
    packByTokens(
      docs.select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tok")),
      idCol, budget)

  /** The packing core over any per-doc token-count frame (`idCol`,
    * `n_tok`) — the whitespace counter above and the trained-merges
    * BPE counter ([[graft.text.Bpe.tokenStats]]) both feed it, so the
    * shard budget is computed in whatever token family the training
    * pipeline actually bills in. */
  def packByTokens(tokCounts: DataFrame, idCol: String,
                   budget: Long): DataFrame = {
    val spark = tokCounts.sparkSession
    import spark.implicits._
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = tokCounts
      .select(col(idCol), col("n_tok").cast("long").as("n_tok"))
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val totals = sorted.groupBy($"__pid").agg(sum($"n_tok").as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val prefix = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val prefixDf = broadcast(prefix.toSeq.toDF("__pid", "__off"))
    val w = Window.partitionBy($"__pid").orderBy(col(idCol))
    sorted
      .withColumn("__cum", sum($"n_tok").over(w))
      .join(prefixDf, "__pid")
      .select(col(idCol), col("n_tok"),
        floor(($"__off" + $"__cum" - $"n_tok") / lit(budget)).cast("long").as("pack_id"))
  }

  /** Weighted (probability-proportional-to-size) corpus sampling via
    * SYSTEMATIC selection: lay the documents on a line in id order,
    * each occupying `weight` units, and pick every `stride`-th unit
    * where `stride = floor(total_weight / k)` — a doc is selected
    * `floor(cum/stride) − floor((cum−w)/stride)` times (≥ 1 copy when
    * picked; heavy docs with `w ≥ stride` are picked proportionally
    * often, the PPS property). This is the deterministic, INTEGER-EXACT
    * alternative to the A-ES exponential-key weighted reservoir: A-ES
    * orders by `−ln(u)/w`, whose libm floats cannot bit-match across
    * engines, while this plan is pure `BIGINT` division — identical
    * everywhere, reproducible across runs and partitionings. The
    * pipeline use is token-budget-proportional subsampling (weight =
    * chars/tokens ⇒ the sample preserves the token mix, not doc
    * counts).
    *
    * Scale shape = [[packByTokens]]: range-repartition + sort by id,
    * per-partition running sums, tiny per-partition totals collected
    * once (O(partitions) driver round-trip — the s12 barrier posture)
    * and re-broadcast as offsets. No single-partition window, no
    * global sort of the data itself. All arithmetic is `div` on longs,
    * so the plan survives totals past 2^53 where a double-based
    * cumulative sum silently loses picks. */
  def ppsSample(docs: DataFrame, idCol: String, weightCol: String,
                k: Int): DataFrame = {
    require(k >= 1, s"ppsSample: k must be >= 1, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val parts = spark.sessionState.conf.numShufflePartitions
    val w0 = docs.select(col(idCol), col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0)
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val totals = w0.groupBy($"__pid").agg(sum($"w").as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val stride = math.max(1L, totals.map(_._2).sum / k)
    val prefix = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val prefixDf = broadcast(prefix.toSeq.toDF("__pid", "__off"))
    val win = Window.partitionBy($"__pid").orderBy(col(idCol))
    w0.withColumn("__cum", sum($"w").over(win))
      .join(prefixDf, "__pid")
      .withColumn("__c", $"__off" + $"__cum")
      .withColumn("n_picks",
        expr(s"__c div ${stride}L") - expr(s"(__c - w) div ${stride}L"))
      .filter($"n_picks" >= 1)
      .select(col(idCol), $"w".as("weight"), $"n_picks")
  }

  /** Overlapping character-window chunking — the split-long-documents
    * step of training-shard assembly (fixed-size pieces for a context
    * window; the overlap keeps boundary context in exactly one extra
    * chunk). Windows of `width` chars every `stride` chars:
    * `n = 1 + ceil(max(len − width, 0) / stride)` chunks, chunk i =
    * `substr(text, i·stride + 1, width)` (the last may be short; a doc
    * shorter than `width` is one whole-doc chunk). Offsets count
    * CODEPOINTS — identical on any script in Spark and ANSI SQL.
    * Chunk identity is carried as md5, so chunk-level exact dedup
    * (the usual next step) is one hash-agg away without re-shipping
    * chunk text.
    *
    * Scale shape: one codegen'd projection + explode, linear in output
    * volume, NO shuffle — the chunk multiplier is bounded by
    * len/stride per doc, never corpus-quadratic. */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   width: Int = 200, stride: Int = 150): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    val len = length(col(textCol))
    val nChunks = (lit(1) +
      floor((greatest(len - width, lit(0)) + (stride - 1)) / lit(stride))).cast("int")
    val chunk = col(textCol).substr(col("__ix") * stride + 1, lit(width))
    docs.select(col(idCol), col(textCol),
        explode(sequence(lit(0), nChunks - 1)).as("__ix"))
      .select(col(idCol), col("__ix").cast("long").as("chunk_ix"),
        length(chunk).cast("long").as("chunk_len"),
        md5(chunk).as("chunk_md5"))
  }

  /** Cross-document boilerplate passage detection — chunk-level dedup,
    * the repeated-passage filter of web-corpus pipelines (headers,
    * licence blocks, navigation text recur across documents while the
    * documents themselves are NOT near-dups; doc-level dedup can't see
    * them). Non-overlapping `width`-char windows ([[chunkWindows]]
    * with stride = width), grouped by chunk md5: a passage appearing
    * in ≥ `minDocs` distinct documents is flagged with its document
    * count, occurrence count, and first carrier.
    *
    * Scale shape: the chunk stream is linear in corpus size and the
    * md5 group-by is ONE hash-agg (partial-aggregated map-side —
    * uniform keys by construction, hot keys bounded by true
    * boilerplate frequency and only ever counted, never join-fanned).
    * No all-pairs anything. */
  def boilerplatePassages(docs: DataFrame, idCol: String, textCol: String,
                          width: Int = 200, minDocs: Int = 2): DataFrame =
    chunkWindows(docs, idCol, textCol, width, stride = width)
      .groupBy(col("chunk_md5"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col(idCol)).as("first_doc"))
      .filter(col("n_docs") >= minDocs)

  /** 60-bit SimHash over the distinct-token bag. Each token hashes to a
    * 60-bit value (15 hex chars of its MD5); bit j of the SimHash is 1
    * iff more tokens have bit j set than unset. 60 bits (not 64) keeps
    * the value inside a signed long on every engine.
    *
    * Single hash-aggregation: explode tokens, fold per-bit votes with a
    * vector-valued agg (sum of +-1 per bit), recombine. One shuffle on
    * the doc id, partial-aggregated map-side.
    */
  val SimhashBits = 60
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashOfRows(
      docs.select(col(idCol), explode(array_distinct(tokens(col(textCol)))).as("__el")),
      idCol, "__el")

  /** SimHash over arbitrary ELEMENT ROWS (id, element-string): the
    * vote-fold core shared by the token form above and the multimodal
    * byte-chunk form ([[graft.multimodal.Multimodal.mediaSimhash]]).
    * One hash aggregation, map-side partial. */
  def simhashOfRows(rows: DataFrame, idCol: String, elCol: String): DataFrame = {
    val h = conv(substring(md5(col(elCol)), 1, 15), 16, 10).cast("long")
    val votes = (0 until SimhashBits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val bitsToLong = (0 until SimhashBits)
      .map(j => when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(0L))
      .reduce(_ + _)
    rows
      .withColumn("h", h)
      .groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), bitsToLong.as("simhash"))
  }
}
