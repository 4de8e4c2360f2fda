package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * Everything is built from codegen'd built-ins over the `documents`
  * fixture table (doc_id, text, lang, source, n_chars). All scores are
  * exact integer ratios (int/int double division), so results are
  * bit-identical across engines and partitionings — no FP-order hazards.
  *
  * Scale: every operator here is embarrassingly parallel per-document
  * (narrow transformations, no shuffle except final ordering / grouping),
  * so it scales linearly with input size.
  */
object TextAnalysis {

  /** Whitespace tokens with empties dropped (robust to repeated spaces). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Native one-pass count of non-empty whitespace tokens
    * (== `size(tokens(text))`). */
  def tokenCount(text: Column): Column =
    org.apache.spark.sql.graft.TokenCount(text)

  /** BPE-ish regex token count: letter runs, digit runs, single
    * non-alphanumeric marks. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"),
      lit(0)))

  /** Number of characters that are not lowercase-alnum-space. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[a-z0-9 ]", ""))

  // Tiny per-language function-word lists (public-knowledge stopwords).
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "y", "es", "un", "en"),
    "fr" -> Seq("le", "la", "et", "les", "est", "un", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我"))

  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(arr, t)))
  }

  /** Language ID: per-language stopword hit counts, argmax with
    * lexicographic tiebreak (deterministic). Emits (doc_id, predicted,
    * score).
    *
    * All 5 language scores come from ONE tokenization pass
    * ([[org.apache.spark.sql.graft.StopwordHitsArray]]) and the argmax
    * is an inline when-chain — no explode, no window, no shuffle at all
    * (the explode + row_number formulation moved every doc through a
    * partitionBy(doc_id) exchange just to rank 5 rows). */
  def languageId(docs: DataFrame): DataFrame = {
    val withH = docs.select(col("doc_id"),
      org.apache.spark.sql.graft.StopwordHitsArray(col("text"),
        stopwords.map(_._2)).as("h"))
    val byLang = stopwords.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(col("h"), i + 1)
    }
    val mx = greatest(byLang.map(_._2): _*)
    // first match in lexicographic language order == orderBy(hits desc,
    // cand_lang asc) rank 1
    val predicted = byLang.sortBy(_._1).tail.foldLeft(
      when(byLang.sortBy(_._1).head._2 === mx,
        lit(byLang.sortBy(_._1).head._1))) { case (acc, (lang, h)) =>
      acc.when(h === mx, lit(lang))
    }
    withH.select(col("doc_id"), predicted.as("predicted"),
      mx.as("stopword_hits"))
  }

  /** Exact integer ratio, 0.0 when the denominator is 0 (empty/token-less
    * docs exist in real corpora; ANSI division would error). The guard
    * leaves nonzero cases bit-identical. */
  private def ratio(num: Column, den: Column): Column =
    when(den === 0, lit(0.0)).otherwise(num.cast("double") / den)

  /** Quality features + composite score, all exact integer ratios.
    * Feature extraction runs on the one-pass native scans (alpha/punct
    * counts, stopword hits) instead of regexp_replace chains — same
    * values, ~5x less per-row work. */
  def qualityScore(docs: DataFrame): DataFrame =
    qualityScoreWith(docs, Nil)

  /** [[qualityScore]] with extra input columns carried through the SAME
    * projection — one corpus pass, no re-scan-and-join to recover
    * columns of the very row being scored. */
  def qualityScoreWith(docs: DataFrame,
                       passthrough: Seq[String]): DataFrame = {
    val t = col("text")
    val toks = tokenCount(t)
    val chars = length(t)
    val alpha = org.apache.spark.sql.graft.CharClassCount.alpha(t)
    val stops = element_at(org.apache.spark.sql.graft.StopwordHitsArray(
      t, Seq(stopwords.flatMap(_._2))), 1)
    val punct = org.apache.spark.sql.graft.CharClassCount.punct(t)
    docs.select(
      (col("doc_id") +: passthrough.map(col)) ++ Seq(
        chars.as("n_chars_m"),
        toks.as("n_tokens"),
        ratio(alpha, chars).as("alpha_ratio"),
        ratio(stops, toks).as("stopword_ratio"),
        ratio(punct, chars).as("punct_ratio"),
        ratio(chars - (toks - 1), toks).as("mean_token_len")): _*)
      .withColumn("quality_score",
        col("alpha_ratio") + col("stopword_ratio") - col("punct_ratio"))
  }

  /** Normalized text: lowercase, strip non-alnum-space, collapse runs of
    * spaces, trim — the native one-pass form of
    * `trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9 ]", ""),
    * " +", " "))`. */
  def normalized(text: Column): Column =
    org.apache.spark.sql.graft.NormalizeText(text)

  /** The regexp-chain composition of [[normalized]] — kept as the
    * documented reference form for parity testing. */
  def normalizedComposed(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""),
      " +", " "))

  /** Content fingerprint = md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** PII redaction: emails, then IPv4 addresses, then residual digit
    * runs (>= 3 digits) become typed placeholder tokens — IN THAT ORDER
    * (emails and IPs contain digit runs, so the digit pass must only
    * see what the earlier passes left). Patterns are deliberately
    * engine-portable (character classes only, no lookarounds or \\b),
    * so the DuckDB oracle applies the byte-identical chain.
    *
    * Scale: a pure per-row codegen'd regex chain — no shuffle, linear
    * at any corpus size; the redaction alphabet is fixed so output
    * size is bounded by input size + token overhead. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>")
    regexp_replace(ip, "[0-9]{3,}", "<NUM>")
  }

  /** Cross-source duplicate matrix: for every ordered pair of sources
    * (diagonal included), the number of distinct normalized
    * fingerprints present in BOTH — the corpus-curation view that shows
    * which ingestion sources re-crawl each other. The diagonal row is
    * each source's distinct-document count.
    *
    * Scale: one distinct on (source, fingerprint) — a shuffle keyed by
    * content hash — then a self-equi-join ON the fingerprint: group
    * sizes are bounded by the NUMBER OF SOURCES (each source
    * contributes a fingerprint at most once after the distinct), so
    * pair expansion per key is at most |sources|², never row-count². */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    val fp = docs.select(col("source"),
      fingerprint(col("text")).as("fp")).distinct()
    fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") <= col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Pack documents into fixed token-budget shards (training-sequence
    * sharding): documents in doc_id order accumulate into a shard until
    * the budget is crossed, then the next shard starts — i.e. shard =
    * floor(exclusive-prefix-sum(tokens) / budget). Deterministic: same
    * corpus, same shards, independent of partitioning.
    *
    * Scale: the prefix sum is [[graft.operators.GlobalRowNumber
    * .prefixSum]] — range partition + per-partition partials + driver
    * offsets — never the single-partition global window. */
  def packShards(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val withTok = docs.select(col("doc_id"),
      tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.operators.GlobalRowNumber
      .prefixSum(withTok, Seq(col("doc_id")), col("n_tokens"))
      .withColumn("shard",
        floor(col("cum_before").cast("double") / budget).cast("long"))
  }

  /** Percentile quality gate: keep the TOP `keepFrac` of documents per
    * language by [[qualityScore]], with a deterministic (score, doc_id)
    * order. percent_rank = (rank-1)/(n-1) — an integer ratio over an
    * exact-double ordering, so the kept set is engine-exact.
    *
    * Scale: one shuffle keyed by language; a giant language makes a fat
    * window partition (documented skew: production sub-buckets by score
    * range and merges boundary ranks — the CCNet perplexity-bucket
    * shape). */
  def qualityCut(docs: DataFrame, keepFrac: Double): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, "keepFrac in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    // lang rides through the scoring projection — one corpus pass, no
    // corpus-vs-corpus self-join to recover a column of the same row
    val scored = qualityScoreWith(docs, Seq("lang"))
    val w = Window.partitionBy("lang")
      .orderBy(col("quality_score"), col("doc_id"))
    scored
      .withColumn("pr", percent_rank().over(w))
      .where(col("pr") >= 1.0 - keepFrac)
  }

  /** Exact-N stratified sample: exactly min(N, |group|) documents per
    * group, chosen by a deterministic md5 order (not rand()) — the
    * balanced-eval-set constructor. Reproducible across runs, engines,
    * and partitionings; changing N only grows/shrinks each stratum
    * monotonically (a prefix property hash ordering gives for free).
    *
    * Scale: one shuffle keyed by group; rank-then-filter per group.
    * For very hot groups the per-key window is the documented skew
    * point (pre-filtering each partition to its local top-N before the
    * shuffle caps it — the TakeOrderedAndProject trick per key). */
  def stratifiedSample(docs: DataFrame, groupCol: String,
                       n: Int): DataFrame = {
    require(n > 0, "sample size must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol)
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= n).drop("__rk")
  }

  /** Edit-distance near-duplicate pairs on normalized prefixes:
    * levenshtein over the first `prefixLen` chars of the normalized
    * text — the classic fuzzy-dedup primitive for titles/short docs.
    *
    * Candidates come from PassJoin-style SEGMENT banding (Li et al.,
    * PassJoin, VLDB 2011): split each full-length prefix into
    * `maxDist+1` segments; by pigeonhole an alignment with <= maxDist
    * edits leaves at least one segment error-free, appearing EXACTLY in
    * the other string at a position shifted by at most maxDist — so an
    * equi-join on (segment idx, content) against position-shifted
    * substrings finds every qualifying pair. Length blocking alone
    * degenerates on uniform-length corpora (every full-length prefix
    * lands in ONE quadratic block — measured 88 s at sf0.1); segment
    * banding keys on CONTENT, so bucket sizes follow segment-value
    * frequencies. Prefixes shorter than `prefixLen` (too short for the
    * fixed segmentation) pair through neighbor length blocks instead —
    * the |len(a)-len(b)| <= dist bound; shorts are the varied-length
    * minority, exactly where length blocking works.
    *
    * Candidates ∪ verify == all-pairs is spec-proven (boundary pairs
    * included) and oracle-gated against the all-pairs SQL. levenshtein
    * is codegen'd in Spark and exact-integer in every engine. */
  def editDistancePairs(docs: DataFrame, prefixLen: Int,
                        maxDist: Int): DataFrame = {
    require(prefixLen > 0 && maxDist >= 0, "bad prefix/dist")
    val nseg = maxDist + 1
    val segLen = math.max(1, prefixLen / nseg)
    val base = docs.select(col("doc_id"),
        substring(normalized(col("text")), 1, prefixLen).as("p"))
      .withColumn("len", length(col("p")))
    val full = base.where(col("len") === prefixLen)
    def segStart(i: Int) = i * segLen + 1
    def segWidth(i: Int) = if (i == nseg - 1) prefixLen - i * segLen
                           else segLen
    // probe: the nseg fixed segments of each full-length prefix
    val probes = full.select(col("doc_id").as("qid"),
      explode(array((0 until nseg).map(i =>
        struct(lit(i).as("i"),
          substring(col("p"), segStart(i), segWidth(i)).as("seg"))): _*))
        .as("k"))
      .select(col("qid"), col("k.i").as("i"), col("k.seg").as("seg"))
    // index: substrings of matching width at shifted positions. Both
    // sides of this path are EXACTLY prefixLen long, so the
    // multi-match-aware window (PassJoin §4.2) is |shift| <= maxDist/2:
    // a shift of s needs >= |s| edits before the error-free segment and,
    // with zero length difference, >= |s| more after it to cancel the
    // net shift — 2|s| <= maxDist. Halves the candidate join vs the
    // naive +/-maxDist window, provably lossless.
    val maxShift = maxDist / 2
    val index = full.select(col("doc_id").as("cid"),
      explode(array((for {
        i <- 0 until nseg
        s <- -maxShift to maxShift
        if segStart(i) + s >= 1
      } yield struct(lit(i).as("i"),
        substring(col("p"), segStart(i) + s, segWidth(i)).as("seg"))): _*))
        .as("k"))
      .select(col("cid"), col("k.i").as("i"), col("k.seg").as("seg"))
    val candFull = probes.join(index, Seq("i", "seg"))
      .where(col("qid") < col("cid"))
      .select(col("qid").as("id_a"), col("cid").as("id_b")).distinct()
    // short prefixes: neighbor length blocks against the WHOLE corpus
    // (a qualifying pair with a short member has |len diff| <= maxDist)
    val blocked = base.withColumn("blk", floor(col("len") / nseg))
    val shortProbe = blocked.where(col("len") < prefixLen)
      .select(col("doc_id").as("sid"), col("blk").as("sblk"))
      .withColumn("blk", explode(array(col("sblk") - 1, col("sblk"),
        col("sblk") + 1)))
    val candShort = shortProbe
      .join(blocked.select(col("doc_id").as("oid"), col("blk")), Seq("blk"))
      .where(col("sid") =!= col("oid"))
      .select(least(col("sid"), col("oid")).as("id_a"),
        greatest(col("sid"), col("oid")).as("id_b")).distinct()
    // verify candidates with the exact distance
    val prefs = base.select(col("doc_id"), col("p"))
    candFull.unionByName(candShort).distinct()
      .join(prefs.select(col("doc_id").as("id_a"), col("p").as("pa")),
        Seq("id_a"))
      .join(prefs.select(col("doc_id").as("id_b"), col("p").as("pb")),
        Seq("id_b"))
      .withColumn("dist", levenshtein(col("pa"), col("pb")).cast("long"))
      .where(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Deterministic sampling bucket in [0, 100): the first 4 hex chars
    * of md5(doc_id) mod 100. Hash-based (not rand()) so the sample is
    * reproducible across runs, partitionings, and engines — the
    * property training-data sampling needs for auditability. */
  def sampleBucket(docId: Column): Column =
    pmod(conv(substring(md5(docId.cast("string")), 1, 4), 16, 10)
      .cast("long"), lit(100L))

  /** Weighted data mix: keep a document iff its [[sampleBucket]] falls
    * under its group's percentage weight — the corpus-mixing step of a
    * training-data pipeline (e.g. upsample low-resource languages,
    * downsample boilerplate-heavy sources). Pure per-row predicate: no
    * shuffle, no RNG state, linear at any scale. `weights` maps group
    * value -> keep percentage (0-100); missing groups keep nothing. */
  def weightedMix(docs: DataFrame, groupCol: String,
                  weights: Map[String, Int]): DataFrame = {
    val pct = weights.foldLeft(lit(0)) { case (acc, (g, w)) =>
      when(col(groupCol) === g, lit(w)).otherwise(acc)
    }
    docs.where(sampleBucket(col("doc_id")) < pct)
  }

  /** Temperature-rebalanced keep percentages: group g's keep rate is
    * proportional to count(g)^(alpha-1), scaled so the LARGEST group's
    * rate is `maxPct` — alpha=1 keeps natural proportions, alpha→0
    * flattens toward uniform group totals (the multilingual-sampling
    * temperature of Conneau & Lample's XLM and successors: p_g ∝
    * count^alpha over natural frequency). Drive [[weightedMix]] with
    * the result for a reproducible temperature-mixed corpus.
    *
    * Scale: one count aggregate (groups are few — driver-side math on
    * a handful of rows), then the pure per-row mix predicate. */
  def temperatureWeights(docs: DataFrame, groupCol: String,
                         alpha: Double, maxPct: Int = 100): Map[String, Int] = {
    require(alpha >= 0 && alpha <= 1, "alpha in [0, 1]")
    require(maxPct >= 1 && maxPct <= 100, "maxPct in [1, 100]")
    val counts = docs.groupBy(groupCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return Map.empty
    // keep(g) ∝ count^alpha / count = count^(alpha-1); normalize so the
    // biggest group (smallest rate) anchors at maxPct of ITS documents.
    // alpha = 0.5 (the common temperature) uses 1/sqrt(n): sqrt is IEEE
    // correctly-rounded in every engine, pow is only ~1-ulp — the same
    // engine-exactness rule tfIdf follows for its rational IDF
    val raw = counts.map { case (g, n) =>
      g -> (if (alpha == 0.5) 1.0 / math.sqrt(n.toDouble)
            else math.pow(n.toDouble, alpha - 1.0))
    }
    val norm = maxPct / raw.values.min
    raw.map { case (g, r) =>
      g -> math.min(100, math.max(1, math.round(r * norm).toInt))
    }
  }

  /** Gopher-style repetition quality signals per document: word counts,
    * the most-repeated word/bigram, and the derived repetition ratios
    * used to drop boilerplate-heavy documents from training corpora
    * (Rae et al. 2021 "Scaling Language Models" repetition filters).
    *
    * All four counters come from ONE native tokenization pass
    * ([[org.apache.spark.sql.graft.RepetitionStats]]) — a narrow
    * projection with zero shuffle, linear at any corpus size. Ratios are
    * exact integer ratios (engine-stable); 0.0 on degenerate docs. */
  def repetitionStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        org.apache.spark.sql.graft.RepetitionStats(col("text")).as("st"))
      .select(col("doc_id"),
        element_at(col("st"), 1).cast("long").as("n_words"),
        element_at(col("st"), 2).cast("long").as("n_distinct_words"),
        element_at(col("st"), 3).cast("long").as("max_word_count"),
        element_at(col("st"), 4).cast("long").as("max_bigram_count"))
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
        col("max_word_count"), col("max_bigram_count"),
        ratio(col("n_words") - col("n_distinct_words"), col("n_words"))
          .as("dup_word_ratio"),
        ratio(col("max_word_count"), col("n_words")).as("top_word_ratio"),
        // explicit <=1 guard: n_words = 0 would make the denominator -1
        // and produce IEEE -0.0 instead of the oracle's 0.0
        when(col("n_words") <= 1, lit(0.0))
          .otherwise(col("max_bigram_count").cast("double") /
            (col("n_words") - 1)).as("top_bigram_ratio"))
      .orderBy("doc_id")

  /** The higher-order-function composition of the
    * [[org.apache.spark.sql.graft.RepetitionStats]] counters — kept as
    * the documented reference form for parity testing (O(n²) per row;
    * never the production path). */
  def repetitionCountsComposed(text: Column): Column = {
    val toks = tokens(text)
    def maxCnt(xs: Column): Column =
      coalesce(array_max(transform(array_distinct(xs),
        w => size(filter(xs, x => x === w)))), lit(0))
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    array(size(toks), size(array_distinct(toks)), maxCnt(toks),
      maxCnt(bigrams))
  }

  /** Vocabulary top-k: the k most document-frequent tokens with doc and
    * total occurrence counts — the corpus-statistics primitive behind
    * tokenizer/vocab construction. One explode + one groupBy(token)
    * (map-side partial aggs), then a top-k that compiles to
    * TakeOrderedAndProject — no global sort. Ties break
    * lexicographically for determinism. */
  def vocabTopK(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_total"))
      .orderBy(col("n_docs").desc, col("n_total").desc, col("token").asc)
      .limit(k)

  /** Per-document top-k keywords by TF-IDF. The IDF is the RATIONAL form
    * `(N + 1) / (df + 1)` (no logarithm): scoring is then pure integer
    * arithmetic plus one exact double division, so ranks are bit-identical
    * across engines — `ln()` is not correctly-rounded-guaranteed and the
    * log is monotone in the ratio anyway, so top-k per doc is unchanged.
    *
    * Shape: one explode + groupBy(doc_id, token) for TF (map-side
    * combine), one groupBy(token) for DF joined back (token-keyed
    * broadcast-able side at realistic vocab sizes), one per-doc window
    * for the top-k. At 100 TB the DF table is vocabulary-sized (millions,
    * not trillions) — broadcast it and the whole score pass is narrow. */
  def tfIdf(docs: DataFrame, k: Int): DataFrame = {
    val n = docs.count()
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token")
      .agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("token").asc)
    tf.join(broadcast(df), "token")
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        ((col("tf") * (n + 1)).cast("double") / (col("df") + 1))
          .as("tfidf"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .orderBy("doc_id", "rk")
  }

  /** CCNet-style language-model quality signal: the average token
    * surprisal under the corpus's own unigram model,
    * `avg(-ln(tf(token) / corpus_tokens)) = ln(corpus_tokens) -
    * avg(ln(tf))` per document. Low = built from common words (fluent /
    * boilerplate), high = rare-token soup — the unigram stand-in for the
    * LM-perplexity filter CCNet uses for corpus curation (PAPERS.md).
    *
    * Exactness: `ln` is not correctly-rounded-guaranteed across engines
    * and the avg's association order differs, but both effects are
    * ~1e-13 relative — `round(, 4)` on the OUTPUT (never before a
    * filter/rank) absorbs them, per the repo's oracle rules.
    *
    * Shape: one explode + token-keyed groupBy builds the frequency
    * table (vocabulary-sized — millions of rows at 100 TB, broadcast-
    * able); the score pass is the token stream joined against it, one
    * doc-keyed partial agg. Documents with no tokens have no surprisal
    * and drop out (both engines agree). */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("token"))
    val tf = toks.groupBy("token").agg(count(lit(1)).as("tf"))
    val total = tf.agg(sum(col("tf")).as("corpus_tokens"))
    toks.join(broadcast(tf), "token")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"), col("corpus_tokens"))
      .agg(count(lit(1)).as("n_tokens"),
        avg(log(col("tf").cast("double"))).as("__avg_ln_tf"))
      .select(col("doc_id"), col("n_tokens"),
        round(log(col("corpus_tokens").cast("double")) - col("__avg_ln_tf"),
          4).as("avg_logprob"))
      .orderBy("doc_id")
  }

  /** Rolling polynomial hash over characters: h = h*31 + ascii(c) mod 1e9+7.
    * Expressed as a left fold over the char array — sequential per value,
    * hence deterministic. */
  def rollingHash(text: Column): Column = {
    val p = 1000000007L
    aggregate(
      filter(split(text, ""), c => c =!= ""),
      lit(0L),
      (acc, c) => pmod(acc * 31 + ascii(c), lit(p)))
  }

  /** Duplicated-span detection (the signal behind exact-substring
    * dedup, Lee et al. 2022, arXiv:2107.06499 §4.1): for each document,
    * the longest run of CONSECUTIVE word `n`-grams that also occur
    * elsewhere in the corpus (another document or another position) — a
    * run of g duplicated grams == a duplicated substring of g + n - 1
    * words. A true suffix array is a single-machine structure; gram
    * frequency + gaps-and-islands is its distributed restatement: a
    * map-side-combinable groupBy for the gram counts, a join back for
    * the flag, one window PARTITIONED BY doc_id for the run detection
    * (per-document partitions, never global).
    * Returns (doc_id, n_grams, n_dup_grams, max_dup_span_words). */
  def dupSpans(docs: DataFrame, n: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(col("text"))
    // grams ride as xxhash64 from the start: the frequency shuffle and
    // the flag join carry 8-byte keys instead of n-word strings (5-10x
    // smaller shuffle payload; a 64-bit collision would need ~2^32
    // distinct grams in one corpus to be likely)
    val grams = docs.select(col("doc_id"),
        posexplode(when(size(toks) >= n,
          transform(sequence(lit(1), size(toks) - (n - 1)),
            i => xxhash64(concat_ws(" ", slice(toks, i, lit(n))))))
          .otherwise(array().cast("array<long>"))).as(Seq("pos", "gram")))
    // the corpus-wide dup flag must NOT be a count-over-window on the
    // gram: on real web corpora the top boilerplate gram appears in a
    // large share of documents, and a window puts that key's entire
    // occurrence set in ONE task (AQE cannot split windows). The
    // groupBy collapses to one row per gram BEFORE the shuffle
    // (map-side combine), the filter keeps only duplicated grams, and
    // the join back is a shuffle join AQE skew-handling CAN split.
    val dupGrams = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1).select(col("gram"), lit(true).as("__dup"))
    val flagged = grams.join(dupGrams, Seq("gram"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("__dup"), lit(false)).as("dup"))
    // gaps-and-islands: consecutive duplicated positions share
    // (pos - rank-within-duplicated), one window per document
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    val runs = flagged.where(col("dup"))
      .withColumn("isl", col("pos") - row_number().over(wd))
      .groupBy("doc_id", "isl").agg(count(lit(1)).as("run"))
      .groupBy("doc_id").agg(max(col("run")).as("max_run"))
    flagged.groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_grams"))
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
        when(col("max_run").isNull, 0L)
          .otherwise(col("max_run") + (n - 1)).as("max_dup_span_words"))
      .orderBy("doc_id")
  }

  /** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    * score every RAW document by the unigram log-likelihood ratio of a
    * TARGET distribution over a RAW distribution (add-1 smoothing over
    * the shared vocabulary, length-normalized), and keep the top `n` —
    * "select raw data that looks like the target domain". The per-token
    * term is `ln(tf_t+1) - ln(tf_r+1)` (integer counts inside each ln,
    * engine-exact); the smoothing denominators are constant across
    * tokens, so they fold into one per-corpus additive term.
    *
    * Scale: the two frequency tables are one shuffle each; the vocab
    * (unique tokens — language-bounded, millions of rows at 100 TB, a
    * few hundred MB) is broadcast, so scoring is ONE narrow pass over
    * the corpus; selection is `orderBy.limit` =
    * TakeOrderedAndProject (per-partition top-n, never a global sort
    * or single-partition window). */
  def dsirSample(docs: DataFrame, targetPred: Column, n: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), targetPred.as("is_target"),
      explode(tokens(col("text"))).as("token"))
    val tft = toks.where(col("is_target"))
      .groupBy("token").agg(count(lit(1)).as("tf_t"))
    val tfr = toks.where(!col("is_target"))
      .groupBy("token").agg(count(lit(1)).as("tf_r"))
    val vocab = tft.join(tfr, Seq("token"), "full")
      .select(col("token"),
        coalesce(col("tf_t"), lit(0L)).as("tf_t"),
        coalesce(col("tf_r"), lit(0L)).as("tf_r"))
    val totals = vocab.agg(sum(col("tf_t")).as("tt"),
      sum(col("tf_r")).as("tr"), count(lit(1)).as("v"))
    toks.where(!col("is_target"))
      .join(broadcast(vocab), "token")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        avg(log(col("tf_t").cast("double") + 1) -
          log(col("tf_r").cast("double") + 1)).as("__avg_lr"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_tokens"),
        round(col("__avg_lr") +
          log((col("tr") + col("v")).cast("double")) -
          log((col("tt") + col("v")).cast("double")), 4).as("logratio"))
      .orderBy(col("logratio").desc, col("doc_id"))
      .limit(n)
  }

  /** Corpus-level duplicated-chunk removal with document reassembly
    * (the paragraph-dedup step of CCNet / RefinedWeb, on fixed
    * `k`-token chunks since the fixture corpus is single-line): every
    * chunk occurrence except the FIRST (smallest (doc_id, position)
    * corpus-wide) is dropped, and each document is stitched back
    * together from its surviving chunks in order. Returns per document
    * the surviving-chunk count, the scrubbed length, and the md5 of
    * the scrubbed text (value-exact, compact to compare).
    *
    * Scale: chunking is narrow; the first-occurrence rule is a pure
    * `min(struct(doc_id, pos))` aggregate per chunk — the aggregate
    * OUTPUT is exactly the kept set (each chunk survives once, at its
    * lexicographically-smallest occurrence), so there is no window and
    * no join back. min over a struct is map-side combinable, so a
    * boilerplate chunk that appears in every document collapses to one
    * row per input partition before the shuffle — the hot key costs
    * O(#partitions), not O(#occurrences), where a row_number window
    * would put every occurrence in one task. Reassembly is one
    * groupBy(doc_id). Two shuffles total. */
  def chunkScrub(docs: DataFrame, k: Int = 10): DataFrame = {
    val toks = tokens(col("text"))
    val nChunks = ceil(size(toks).cast("double") / k).cast("int")
    val chunks = docs.select(col("doc_id"),
      explode(transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1),
        i => struct(i.as("pos"),
          concat_ws(" ", slice(toks, i * k + 1, lit(k))).as("chunk"))))
        .as("c"))
      .select(col("doc_id"), col("c.pos").as("pos"), col("c.chunk").as("chunk"))
    val kept = chunks.groupBy("chunk")
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
      .select(col("f.doc_id").as("doc_id"), col("f.pos").as("pos"),
        col("chunk"))
    kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(array_sort(collect_list(
          struct(col("pos"), col("chunk")))), s => s("chunk"))).as("__scrub"))
      .select(col("doc_id"), col("n_kept"),
        length(col("__scrub")).cast("long").as("scrub_len"),
        md5(col("__scrub")).as("scrub_md5"))
      .orderBy("doc_id")
  }
}
