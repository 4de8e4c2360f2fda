package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.SortedIntersectCount
import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}

class LlmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("exact dedup groups identical texts under min doc_id") {
    val d = docsDF(1L -> "aaa", 2L -> "bbb", 3L -> "aaa", 4L -> "aaa")
    val r = Dedup.exact(d).collect()
    assert(r.length == 2)
    val byKeeper = r.map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(byKeeper(1L) == 3L && byKeeper(2L) == 1L)
  }

  test("minhash-lsh finds identical and near-identical docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = docsDF(1L -> base, 2L -> base, 3L -> (base + " tail"),
      4L -> "completely different content with nothing shared at all ok")
    val pairs = Dedup.minhashLsh(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("lsh bucket cap drops only oversized buckets, and audibly") {
    // 6 identical docs (one degenerate bucket of size 6 in every band)
    // plus a distinct near-pair that must survive capping
    val boiler = "spam spam spam wonderful spam spam spam baked beans spam"
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = docsDF(
      (1L to 6L).map(i => i -> boiler) ++
        Seq(10L -> base, 11L -> (base + " tail")): _*)
    val uncapped = Dedup.minhashLsh(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashLsh(d, maxBucket = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // capped is a subset; the small-bucket pair survives
    assert(capped.subsetOf(uncapped))
    assert(capped.contains((10L, 11L)))
    // every removed pair involves only boilerplate docs (the big bucket)
    val removed = uncapped -- capped
    assert(removed.nonEmpty)
    assert(removed.forall { case (a, b) => a <= 6L && b <= 6L })
    // the audit trail reports the dropped buckets with their sizes
    val sig = Dedup.minhashSignaturesNarrow(d, 10, 2, 12)
    val dropped = Dedup.lshDroppedBuckets(sig, 12, 4, maxBucket = 5)
      .collect()
    assert(dropped.nonEmpty)
    assert(dropped.forall(_.getLong(2) == 6L))
    // nothing dropped at the default cap
    assert(Dedup.lshDroppedBuckets(sig, 12, 4).count() == 0)
  }

  test("simhash: identical docs equal, disjoint docs differ") {
    val d = docsDF(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta",
      3L -> "epsilon zeta eta theta iota kappa")
    val h = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(h(1L) != h(3L))
    assert(h.values.forall(v => v >= 0 && v < (1L << 32)))
  }

  test("ngram jaccard: identical docs J=1, half-overlap passes 0.5 cut") {
    val d = docsDF(1L -> "abcdefgh", 2L -> "abcdefgh", 3L -> "zzzzzzzz")
    val r = Dedup.ngramJaccard(d).collect()
    val m = r.map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(4)).toMap
    assert(m((1L, 2L)) == 1.0)
    assert(!m.contains((1L, 3L)))
  }

  test("SortedIntersectCount matches size(array_intersect) — interpreted and codegen") {
    val df = Seq(
      (Seq("a", "b", "c", "d"), Seq("b", "d", "e")),
      (Seq("a"), Seq[String]()),
      (Seq[String](), Seq[String]()),
      (Seq("x", "y"), Seq("x", "y"))).toDF("a", "b")
    val got = df.select(SortedIntersectCount(col("a"), col("b"))).collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 0L, 0L, 2L))
    val ref = df.select(size(array_intersect(col("a"), col("b"))).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == ref)
  }

  test("cosine of a vector with itself is 1; topk ranks by similarity") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f, 0.0f), 0),
      (3L, Array(0.0f, 0.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val top = Similarity.bruteForceTopK(e, col("vec_id") === 0, 3).collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(top.head.getDouble(2) == 1.0)
  }

  test("decontaminate flags n-gram overlap with the eval set only") {
    val d = docsDF(
      0L -> "alpha beta gamma delta epsilon zeta", // eval doc
      1L -> "alpha beta gamma delta epsilon zeta", // exact copy: 3 grams
      2L -> "intro beta gamma delta epsilon outro", // 1 shared 4-gram
      3L -> "alpha beta gamma", // 3 tokens < n: emits no grams at all
      4L -> "totally different words here entirely now")
    val r = Dedup.decontaminate(d, col("doc_id") === 0, n = 4).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 1L)) // eval + short + disjoint absent
  }

  test("quantize emits exact int8 grid values; quantized topk ranks dups first") {
    val q = Seq((0L, Array(1.0f, -0.5f, 0.25f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(Similarity.quantize(col("embedding")).as("q")).collect()
    assert(q.head.getSeq[Double](0) == Seq(127.0, -63.0, 32.0, 0.0))
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f, 0.0f), 0),
      (3L, Array(0.0f, 0.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val top = Similarity.quantizedTopK(e, col("vec_id") === 0, 3).collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(top.head.getLong(2) == 127L * 127L) // identical vector: q·q
    assert(top.last.getLong(2) == 0L)          // orthogonal: zero dot
  }

  test("cell near-dup only pairs within the same label") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.01f), 0),
      (2L, Array(1.0f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    val pairs = Similarity.cellNearDup(e, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("lsh near-dup finds the identical pair it buckets together") {
    val e = Seq(
      (0L, Array.fill(8)(0.5f), 0), (1L, Array.fill(8)(0.5f), 0),
      (2L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val pairs = Similarity.lshNearDup(e, dim = 8, planes = 6, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("rolling hash matches a JVM reference implementation") {
    val texts = Seq("hello world", "", "a", "the quick brown fox")
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = docsDF(d: _*)
      .select(col("doc_id"), TextAnalysis.rollingHash(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t), s"text '$t'")
    }
  }

  test("fingerprint is invariant to case, punctuation, extra spaces") {
    val d = docsDF(1L -> "Hello,  World!", 2L -> "hello world",
      3L -> "different")
    val fp = d.select(col("doc_id"), TextAnalysis.fingerprint(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("language id prefers the language whose stopwords dominate") {
    val d = docsDF(1L -> "the cat is in the house and it is warm",
      2L -> "der hund ist ein tier und das ist gut")
    val got = TextAnalysis.languageId(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
  }

  test("multimodal: partition-iterator decode == expression meta (cross-check)") {
    val docs = Tables.load(spark, TestSpark.sfTiny, "documents").limit(50)
    val viaIter = Multimodal.decode(spark, docs).collect()
      .map(m => m.doc_id -> ((m.n_bytes, m.sha, m.width, m.height, m.n_frames)))
      .toMap
    val viaExpr = Multimodal.metaExpr(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getInt(5))))
      .toMap
    assert(viaIter == viaExpr)
  }

  test("multimodal: decode == metaExpr on non-ASCII payloads (byte semantics)") {
    // leading bytes 0xC3 (é), 0xE6 (日 in UTF-8), 0xF0 (emoji) — a string
    // cast would read CHARACTER code points here and diverge
    val docs = docsDF(1L -> "éclair", 2L -> "日本語テキスト",
      3L -> "😀 smiley", 4L -> "plain ascii")
    val viaIter = Multimodal.decode(spark, docs).collect()
      .map(m => m.doc_id -> ((m.n_bytes, m.sha, m.width, m.height, m.n_frames)))
      .toMap
    val viaExpr = Multimodal.metaExpr(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getInt(5))))
      .toMap
    assert(viaIter == viaExpr)
  }

  test("ngram jaccard is exact on non-ASCII text (21-bit code points)") {
    val t1 = "über die brücke läuft ein bär"
    val t2 = "über die brücke läuft ein reh"
    val t3 = "中文文本去重测试中文文本"
    val d = docsDF(1L -> t1, 2L -> t2, 3L -> t3, 4L -> t3)
    def shingleSet(t: String, n: Int) =
      if (t.length < n) Set(t) else t.sliding(n).toSet
    def jac(a: String, b: String, n: Int) = {
      val (sa, sb) = (shingleSet(a, n), shingleSet(b, n))
      val i = (sa & sb).size.toDouble
      i / (sa.size + sb.size - i)
    }
    val got = Dedup.ngramJaccard(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    val texts = Map(1L -> t1, 2L -> t2, 3L -> t3, 4L -> t3)
    for (a <- 1L to 4L; b <- (a + 1) to 4L) {
      val expect = jac(texts(a), texts(b), 3)
      if (expect >= 0.5)
        assert(math.abs(got((a, b)) - expect) < 1e-12, s"pair ($a,$b)")
      else assert(!got.contains((a, b)), s"pair ($a,$b) should be cut")
    }
  }

  test("minhash estimate: identical docs agree on all components") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = docsDF(1L -> base, 2L -> base, 3L -> (base + " tail"))
    val est = Dedup.minhashEstimate(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(est((1L, 2L)) == ((12L, 1.0)))
    est.values.foreach { case (n, e) =>
      assert(n >= 0 && n <= 12 && e == n / 12.0)
    }
  }

  test("weighted mix keeps deterministic per-group fractions") {
    val d = (1L to 400L).map(i =>
      (i, s"text $i", if (i % 2 == 0) "en" else "zh", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = TextAnalysis.weightedMix(d, "lang",
      Map("en" -> 50, "zh" -> 0))
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("zh"))            // weight 0 -> dropped
    assert(byLang("en") > 60 && byLang("en") < 140) // ~50% of 200
    // deterministic: same input -> identical sample
    val again = TextAnalysis.weightedMix(d, "lang",
      Map("en" -> 50, "zh" -> 0)).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(again == kept.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("connected components merge chains, stars, and leave islands apart") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain -> cluster 1
      (10L, 11L), (10L, 12L),       // star  -> cluster 10
      (20L, 21L))                   // island pair -> cluster 20
      .toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L).forall(cc(_) == 20L))
    assert(cc.size == 9)
  }

  test("chunk dedup flags shared k-token chunks across documents") {
    val shared = (1 to 10).map(i => s"w$i").mkString(" ") // one exact chunk
    val d = docsDF(
      1L -> (shared + " unique tail one two three four five six seven"),
      2L -> (shared + " other ending eight nine ten eleven twelve more x"),
      3L -> "totally different words that no other document contains here")
    val r = Dedup.chunkDedup(d, k = 10).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) == ((2L, 1L))) // 2 chunks, the shared one flagged
    assert(r(2L) == ((2L, 1L)))
    assert(r(3L) == ((1L, 0L)))
  }

  test("prefix-filtered jaccard join == blocked all-pairs, fixtures incl.") {
    val fx = Tables.load(spark, TestSpark.sfTiny, "documents").limit(200)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(key(Dedup.ngramJaccardPrefix(fx)) == key(Dedup.ngramJaccard(fx)))
    val synth = docsDF(1L -> "abcdefgh", 2L -> "abcdefgh", 3L -> "zzzzzzzz",
      4L -> "über die brücke", 5L -> "über die brücke")
    assert(key(Dedup.ngramJaccardPrefix(synth)) == key(Dedup.ngramJaccard(synth)))
    // auto-dispatch on a corpus whose blocks STRADDLE the threshold:
    // the (en, s) block (5 docs) routes to the prefix variant, the
    // (en, t) block (2 docs) stays on blocked all-pairs — the union
    // must equal the single-strategy result pair for pair
    val straddle = synth.unionByName(
      docsDF(6L -> "qrstuvwx", 7L -> "qrstuvwx")
        .withColumn("source", lit("t")))
    assert(key(Dedup.ngramJaccardAuto(straddle, maxBlockDocs = 3)) ==
      key(Dedup.ngramJaccard(straddle)))
    // boundary inclusivity: == threshold stays all-pairs, never drops
    assert(key(Dedup.ngramJaccardAuto(straddle, maxBlockDocs = 5)) ==
      key(Dedup.ngramJaccard(straddle)))
  }

  test("ngram jaccard n=4 (hashed codes) matches string-shingle reference") {
    val t1 = "the quick brown fox jumps over the lazy dog"
    val t2 = "the quick brown fox jumps over the lazy cat"
    val d = docsDF(1L -> t1, 2L -> t2, 3L -> t1)
    def shingleSet(t: String) = t.sliding(4).toSet
    def jac(a: String, b: String) = {
      val (sa, sb) = (shingleSet(a), shingleSet(b))
      val i = (sa & sb).size.toDouble
      i / (sa.size + sb.size - i)
    }
    val got = Dedup.ngramJaccard(d, n = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(got((1L, 3L)) == 1.0)
    assert(math.abs(got((1L, 2L)) - jac(t1, t2)) < 1e-12)
  }

  test("vector_dot with a null element is null (zip_with composition parity)") {
    val df = spark.range(1).select(
      expr("array(1.0D, 2.0D, 3.0D)").as("a"),
      expr("array(4.0D, CAST(NULL AS DOUBLE), 6.0D)").as("b"),
      expr("array(4.0D, 5.0D, 6.0D)").as("c"))
    val r = df.select(
      org.apache.spark.sql.graft.VectorDot(col("a"), col("b")).as("withNull"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
        .as("composed"),
      org.apache.spark.sql.graft.VectorDot(col("a"), col("c")).as("clean"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getDouble(2) == 32.0)
  }

  test("byte histogram == per-byte explode composition, incl. non-ASCII") {
    val docs = docsDF(1L -> "hello world", 2L -> "übergrößen 中文",
      3L -> "", 4L -> "aaa")
    val native = Multimodal.featureHistogram(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // composition: explode byte positions of the utf-8 payload
    val composed = Multimodal.payloads(docs)
      .where(length(col("payload")) > 0) // sequence(1,0) would descend
      .select(col("doc_id"), col("payload"), explode(sequence(lit(1),
        length(col("payload")))).as("i"))
      .select(col("doc_id"),
        (conv(hex(expr("substring(payload, i, 1)")), 16, 10)
          .cast("long") % 16).as("bin"))
      .groupBy("doc_id", "bin").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(native == composed)
    assert(!native.keys.exists(_._1 == 3L)) // empty payload -> no bins
  }

  test("frame sampling strides the fake frame count; resize fits the box") {
    val docs = docsDF(1L -> ("x" * 20), 2L -> "y")
    val frames = Multimodal.sampleFrames(docs, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    // len 20 -> n_frames 1+20%7=7 -> idx 0,2,4,6 ; len 1 -> 1+1=2 -> 0
    assert(frames(1L) == Seq(0L, 2L, 4L, 6L))
    assert(frames(2L) == Seq(0L))
    val (rw, rh) = Multimodal.resizeDims(lit(60), lit(30), 48)
    val r = spark.range(1).select(rw.as("w"), rh.as("h")).collect()(0)
    assert(r.getLong(0) == 48 && r.getLong(1) == 24)
    val (sw, sh) = Multimodal.resizeDims(lit(10), lit(20), 48)
    val s2 = spark.range(1).select(sw.as("w"), sh.as("h")).collect()(0)
    assert(s2.getLong(0) == 10 && s2.getLong(1) == 20)
  }

  test("ivf with all cells probed == brute force; probing restricts to cells") {
    val e = Tables.load(spark, TestSpark.sfTiny, "embeddings")
    val pred = pmod(col("vec_id"), lit(100)) === 0
    // nprobe = k means nothing is pruned -> exact brute-force agreement
    val full = Similarity.ivfTopK(e, pred, k = 8, nprobe = 8, topk = 5)
      .select("query_id", "cand_id", "cos_sim", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val brute = Similarity.bruteForceTopK(e, pred, 5)
      .select(col("query_id"), col("cand_id"), col("cos_sim"),
        col("rk").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(full.toSet == brute.toSet)
    // nprobe < k: every returned candidate lives in a probed cell and
    // pages stay ranked
    val probed = Similarity.ivfTopK(e, pred, k = 8, nprobe = 3, topk = 5)
      .collect()
    val byQuery = probed.groupBy(_.getLong(0))
    byQuery.values.foreach { rows =>
      assert(rows.length <= 5)
      val sims = rows.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(rows.map(_.getLong(2)).toSet.size <= 3)
    }
  }

  test("PII redaction: typed placeholders, pass order, short runs kept") {
    import graft.llm.TextAnalysis
    val rows = Seq(
      "write to bob.smith+x@mail-host.co.uk now",     // email (has dots/+)
      "from 192.168.001.250 port 80",                 // IP, short digits kept
      "id 1234567 and pin 42",                        // long run only
      "mixed a@b.io at 10.0.0.1 ref 98765",           // all three
      "clean text, nothing to do")
      .toDF("s").select(TextAnalysis.redactPii(col("s")).as("r"))
      .collect().map(_.getString(0))
    assert(rows(0) == "write to <EMAIL> now")
    assert(rows(1) == "from <IP> port 80")
    assert(rows(2) == "id <NUM> and pin 42")
    assert(rows(3) == "mixed <EMAIL> at <IP> ref <NUM>")
    assert(rows(4) == "clean text, nothing to do")
  }

  test("prefixSum == single-partition window; packShards crosses budget") {
    import graft.operators.GlobalRowNumber
    val df = (1 to 500).map(i => (i.toLong, (i % 7).toLong))
      .toDF("id", "v").repartition(8)
    val got = GlobalRowNumber.prefixSum(df, Seq(col("id")), col("v"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ref = df.withColumn("cum_ref",
      coalesce(sum(col("v")).over(w), lit(0L)))
    val joined = got.join(ref.select("id", "cum_ref"), "id").collect()
    assert(joined.length == 500)
    joined.foreach(r => assert(
      r.getLong(r.fieldIndex("cum_before")) ==
        r.getLong(r.fieldIndex("cum_ref"))))
    // shards: every shard's STARTING doc has cum_before in
    // [shard*budget, ...) and shard ids are dense from 0
    val docs = (1 to 100).map(i => (i.toLong, "w " * 50)).toDF("doc_id", "text")
    val shards = graft.llm.TextAnalysis.packShards(docs, 200L)
      .groupBy("shard").agg(count(lit(1)).as("n"),
        sum(col("n_tokens")).as("tok")).orderBy("shard").collect()
    assert(shards.map(_.getLong(0)).toSeq ==
      (0L until shards.length.toLong))
    // 50 tokens/doc, 200 budget -> 4 docs per shard
    assert(shards.init.forall(_.getLong(1) == 4L))
  }

  test("sourceOverlap diagonal counts distinct fps; shared dups pair up") {
    import graft.llm.TextAnalysis
    val docs = Seq(
      (1L, "alpha beta", "s1", "x"), (2L, "alpha beta", "s1", "x"),
      (3L, "ALPHA beta!", "s2", "x"), // normalizes equal -> cross dup
      (4L, "unique two", "s2", "x"), (5L, "unique three", "s2", "x"))
      .toDF("doc_id", "text", "source", "lang")
    val m = TextAnalysis.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("s1", "s1")) == 1L) // two docs, one distinct fp
    assert(m(("s2", "s2")) == 3L)
    assert(m(("s1", "s2")) == 1L) // the normalized dup
  }

  test("qualityCut keeps the top fraction per language deterministically") {
    import graft.llm.TextAnalysis
    // 10 docs per lang with strictly increasing quality (more alpha)
    val docs = (for (l <- Seq("aa", "bb"); i <- 1 to 10) yield {
      val junk = "!" * (10 - i)
      (l.hashCode.toLong * 100 + i, s"${"word " * i}$junk", l, "src")
    }).toDF("doc_id", "text", "lang", "source")
    val kept = TextAnalysis.qualityCut(docs, 0.5)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // percent_rank >= 0.5 over 10 rows keeps ranks 6..10 -> 5 rows
    assert(byLang == Map("aa" -> 5L, "bb" -> 5L))
    // deterministic: same input, same kept set
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = TextAnalysis.qualityCut(docs, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("funnel with a full candidate pool == brute force; funnel ⊆ candidates") {
    val e = Tables.load(spark, TestSpark.sfTiny, "embeddings")
    val pred = pmod(col("vec_id"), lit(100)) === 0
    val n = e.count().toInt
    // candK = corpus size: the quantized stage prunes nothing, so the
    // exact rerank must agree with brute force bit for bit
    val funnel = Similarity.funnelTopK(e, pred, candK = n, k = 5)
      .select("query_id", "cand_id", "cos_sim", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val brute = Similarity.bruteForceTopK(e, pred, 5)
      .select(col("query_id"), col("cand_id"), col("cos_sim"),
        col("rk").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(funnel.toSet == brute.toSet)
    // a narrow pool returns only nominated candidates, still k per query
    val cands = Similarity.quantizedTopK(e, pred, 10)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrow = Similarity.funnelTopK(e, pred, candK = 10, k = 5).collect()
    assert(narrow.groupBy(_.getLong(0)).values.forall(_.length == 5))
    narrow.foreach(r =>
      assert(cands.contains((r.getLong(0), r.getLong(1)))))
  }

  test("temperatureWeights: head anchored, tail boosted, alpha=1 flat") {
    import graft.llm.TextAnalysis
    val docs = ((1 to 1000).map(i => (i.toLong, "t", "big")) ++
      (1001 to 1100).map(i => (i.toLong, "t", "mid")) ++
      (1101 to 1110).map(i => (i.toLong, "t", "small")))
      .toDF("doc_id", "text", "source")
    val w = TextAnalysis.temperatureWeights(docs, "source", 0.5, maxPct = 50)
    assert(w("big") == 50) // largest group anchors at maxPct
    assert(w("big") < w("mid") && w("mid") <= w("small")) // tail boosted
    assert(w.values.forall(p => p >= 1 && p <= 100))
    // alpha = 1: natural proportions -> every group keeps maxPct
    val flat = TextAnalysis.temperatureWeights(docs, "source", 1.0, 40)
    assert(flat.values.toSet == Set(40))
  }

  test("stratifiedSample: exact-N per group, prefix property") {
    import graft.llm.TextAnalysis
    val docs = ((1 to 50).map(i => (i.toLong, "t", "big")) ++
      (51 to 53).map(i => (i.toLong, "t", "tiny")))
      .toDF("doc_id", "text", "source")
    val s10 = TextAnalysis.stratifiedSample(docs, "source", 10)
      .select("source", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val byGroup = s10.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byGroup("big").size == 10)  // exactly N
    assert(byGroup("tiny") == Set(51L, 52L, 53L)) // min(N, |group|)
    // prefix property: shrinking N keeps a subset of the same sample
    val s5 = TextAnalysis.stratifiedSample(docs, "source", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s5.subsetOf(s10.map(_._2).toSet))
  }

  test("editDistancePairs length-blocked join == all-pairs brute force") {
    import graft.llm.TextAnalysis
    // lengths chosen to straddle block boundaries in both directions
    val docs = Seq(
      (1L, "alpha beta gamma", "s"),      // len 16
      (2L, "alpha beta gamm", "s"),       // dist 1, block boundary
      (3L, "alpha beta", "s"),            // len 10
      (4L, "alpha betaxx", "s"),          // dist 2 from 3
      (5L, "completely different text here", "s"),
      (6L, "zzzzz", "s"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.editDistancePairs(docs, 30, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val p = docs.select(col("doc_id"),
      substring(TextAnalysis.normalized(col("text")), 1, 30).as("pf"))
    val brute = p.as("a").join(p.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.pf"), col("b.pf")).cast("long").as("d"))
      .where(col("d") <= 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(got.contains((1L, 2L, 1L)) && got.contains((3L, 4L, 2L)))
  }

  test("editDistancePairs full-length path: boundary shifts survive the " +
      "multi-match-aware window") {
    import graft.llm.TextAnalysis
    // 30-char normalized prefixes (the segment-banding path). The pairs
    // are built to align only at shift +/-2 == floor(maxDist/2) — the
    // exact edge of the tightened substring window (2 ins front + 2 del
    // back and vice versa, ed = 4 <= 5).
    val a = "aaaaabbbbbcccccdddddeeeeefffff"
    val plus = "xx" + a.dropRight(2)  // every inner segment shifted +2
    val minus = a.drop(2) + "yy"      // shifted -2
    val far = "zzzzzyyyyyxxxxxwwwwwvvvvvuuuuu"
    val docs = Seq(
      (1L, a, "s"), (2L, plus, "s"), (3L, minus, "s"), (4L, far, "s"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.editDistancePairs(docs, 30, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val p = docs.select(col("doc_id"),
      substring(TextAnalysis.normalized(col("text")), 1, 30).as("pf"))
    val brute = p.as("a").join(p.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.pf"), col("b.pf")).cast("long").as("d"))
      .where(col("d") <= 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(got.contains((1L, 2L, 4L)) && got.contains((1L, 3L, 4L)))
  }

  test("sorted_intersect_count null elements follow array_intersect") {
    val df = spark.range(1).select(
      expr("array_sort(array(1L, 3L, CAST(NULL AS BIGINT)))").as("a"),
      expr("array_sort(array(3L, 5L, CAST(NULL AS BIGINT)))").as("b"),
      expr("array_sort(array(3L, 5L))").as("c"))
    val r = df.select(
      SortedIntersectCount(col("a"), col("b")).as("bothNull"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("refBoth"),
      SortedIntersectCount(col("a"), col("c")).as("oneNull"),
      size(array_intersect(col("a"), col("c"))).cast("long").as("refOne"))
      .collect()(0)
    assert(r.getLong(0) == r.getLong(1) && r.getLong(0) == 2L)
    assert(r.getLong(2) == r.getLong(3) && r.getLong(2) == 1L)
  }

  test("semDedup drops within-cluster near-identicals, keeps smallest id") {
    // vec 0 and 1 are centroids; 2 duplicates 0's direction (cos = 1),
    // 3 is 1's direction scaled, 4 is orthogonal-ish to both
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(2f, 0f, 0f, 0f)),   // dup of 0 -> dropped
      (3L, Array(0f, 3f, 0f, 0f)),   // dup of 1 -> dropped
      (4L, Array(0.9f, 0.1f, 1f, 0f)) // near cell 0, below threshold
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, k = 2, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 3L, 2L), (1L, 2L, 1L)))
  }

  test("kmeans recovers well-separated blobs; assignment is exact") {
    // three tight blobs far apart; seeds (ids 0..2) start one per blob
    def blob(base: Array[Float], ids: Range) =
      ids.map(i => (i.toLong, base.zipWithIndex.map { case (x, d) =>
        x + (if (d == 0) (i % 3) * 0.01f else 0f) }))
    val pts = blob(Array(0f, 0f, 0f, 0f), 0 to 0) ++
      blob(Array(100f, 0f, 0f, 0f), 1 to 1) ++
      blob(Array(0f, 100f, 0f, 0f), 2 to 2) ++
      blob(Array(0f, 0f, 0f, 0f), 3 to 5) ++
      blob(Array(100f, 0f, 0f, 0f), 6 to 8) ++
      blob(Array(0f, 100f, 0f, 0f), 9 to 11)
    val emb = pts.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(emb, k = 3, iters = 4)
    assert(cents.map(_._1) == Seq(0L, 1L, 2L))
    // each centroid sits at its blob's mean (first dim ~ base + 0.01)
    assert(math.abs(cents(0)._2(0) - 0.01f) < 0.02)
    assert(math.abs(cents(1)._2(0) - 100.01f) < 0.05)
    assert(math.abs(cents(2)._2(1) - 100f) < 0.05)
    val centsDF = cents.toDF("cent_id", "cv")
    val cells = Similarity.assignCells(emb, centsDF)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 3L, 4L, 5L).forall(cells(_) == 0L))
    assert(Seq(1L, 6L, 7L, 8L).forall(cells(_) == 1L))
    assert(Seq(2L, 9L, 10L, 11L).forall(cells(_) == 2L))
  }

  test("bloom decontaminate equals the exact path (verify kills FPs)") {
    val d = docsDF(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "a completely different sentence with no overlap at all yes",
      3L -> "quick brown fox jumps over something else entirely now ok",
      4L -> "unrelated words that share nothing with anything here today")
    val evalPred = col("doc_id") === 1
    val exact = Dedup.decontaminate(d, evalPred, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bloom = Dedup.bloomDecontaminate(d, evalPred, n = 4,
        expectedItems = 64L, fpp = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bloom == exact)
    assert(exact.map(_._1) == Seq(3L)) // only doc 3 shares a 4-gram
  }

  test("semDedup maxCell cap skips only oversized cells, audibly") {
    // all five vectors collapse into centroid 0's cell (centroid 1 is
    // orthogonal and attracts nothing)
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(2f, 0f, 0f, 0f)),
      (3L, Array(3f, 0f, 0f, 0f)),
      (4L, Array(4f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    // uncapped: duplicates of 0 are dropped
    val open = Similarity.semDedup(emb, k = 2, threshold = 0.95)
      .where(col("cell") === 0).select("n_kept").as[Long].head()
    assert(open == 1L)
    // cap below the big cell's size: nothing deduped inside it, every
    // member kept, and the audit surfaces exactly that cell
    val capped = Similarity.semDedup(emb, k = 2, threshold = 0.95,
        maxCell = 3L)
      .where(col("cell") === 0).select("n_total", "n_kept").head()
    assert(capped.getLong(0) == 4L && capped.getLong(1) == 4L)
    val audit = Similarity.semDedupOversizedCells(emb, k = 2, maxCell = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(audit.toSeq == Seq((0L, 4L)))
  }

  test("dsirSample ranks raw docs by similarity to the target domain") {
    val docs = Seq(
      (1L, "spark delta table spark delta", "t"),
      (2L, "spark table delta query spark", "t"),
      (3L, "spark delta table query", "r"),     // target-like
      (4L, "banana kiwi mango papaya", "r"),    // nothing like target
      (5L, "spark banana delta kiwi", "r")      // half-like
    ).toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = TextAnalysis.dsirSample(docs, col("source") === "t", 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(3L, 5L)) // ranked: target-like first, fruit last
  }

  test("new-op edge cases: empty inputs and missing sides stay sane") {
    val empty = docsDF()
    // chunkScrub/dupSpans on an empty corpus: empty result, not a crash
    assert(TextAnalysis.chunkScrub(empty).count() == 0)
    assert(TextAnalysis.dupSpans(empty).count() == 0)
    // dsir with NO target docs: every token gets tf_t = 0, weights are
    // finite (add-1 smoothing), result still deterministic
    val d = docsDF(1L -> "alpha beta", 2L -> "alpha gamma")
    val noTarget = TextAnalysis.dsirSample(d, lit(false), 5).collect()
    assert(noTarget.length == 2 && noTarget.forall(!_.isNullAt(2)))
    // semDedup on an empty embedding frame: empty, not a crash
    import spark.implicits._
    val noEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.semDedup(noEmb, k = 4, threshold = 0.5).count() == 0)
    // bloom decontaminate with an empty eval side: nothing flagged
    assert(Dedup.bloomDecontaminate(d, lit(false), n = 2).count() == 0)
  }

  test("dupSpans finds the longest corpus-shared word run per doc") {
    // docs 1 and 2 share a 7-word span (= a run of three 5-grams);
    // doc 3 shares nothing
    val shared = "one two three four five six seven"
    val d = docsDF(
      1L -> (shared + " tail1 tail2 tail3"),
      2L -> ("head1 head2 " + shared),
      3L -> "totally different words everywhere in this document")
    val out = TextAnalysis.dupSpans(d, n = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 3 consecutive duplicated 5-grams -> span of 3 + (5-1) = 7 words
    assert(out.map(t => t._1 -> t._4).toMap ==
      Map(1L -> 7L, 2L -> 7L, 3L -> 0L))
    assert(out.find(_._1 == 1L).get._3 == 3L) // three duplicated grams
  }

  test("chunkScrub keeps only the first corpus-wide chunk occurrence") {
    // k=2 chunks; doc 1 = [a b][c d]; doc 2 repeats [a b] then new [e f];
    // doc 3 is ENTIRELY duplicate chunks -> vanishes from the output
    val d = docsDF(1L -> "a b c d", 2L -> "a b e f", 3L -> "a b c d")
    val out = TextAnalysis.chunkScrub(d, k = 2)
      .select("doc_id", "n_kept", "scrub_len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 7L), (2L, 1L, 3L)))
    // reassembly preserves order: doc 1 scrubs to its original text
    val full = TextAnalysis.chunkScrub(d, k = 2)
      .where(col("doc_id") === 1).select("scrub_md5").as[String].head()
    val expect = d.where(col("doc_id") === 1)
      .select(md5(col("text"))).as[String].head()
    assert(full == expect)
  }

  test("dupSpans/chunkScrub survive a boilerplate key hot across every doc") {
    // every document carries the same boilerplate span ("all rights
    // reserved"-style); on a window-partitioned-by-gram/chunk plan that
    // one key's whole occurrence set lands in ONE task — the de-skewed
    // plans must carry NO window keyed on the corpus-wide gram/chunk
    // (only dupSpans' per-document gaps-and-islands window remains)
    val boiler = "all rights reserved by the site owner"
    val d = docsDF((1L to 200L).map(i =>
      i -> (boiler + s" unique$i tail$i")): _*)
    val spans = TextAnalysis.dupSpans(d, n = 5)
    val spanPlan = spans.queryExecution.executedPlan.toString
    val windows = spanPlan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("doc_id")), spanPlan)
    assert(!windows.exists(_.contains("gram")), spanPlan)
    // boilerplate = 7 words -> 3 shared 5-grams in every doc; the
    // unique tails keep the doc-level grams distinct
    val got = spans.collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got.size == 200 && got.values.forall(_ == 7L))
    val scrub = TextAnalysis.chunkScrub(d, k = 2)
    val scrubPlan = scrub.queryExecution.executedPlan.toString
    assert(!scrubPlan.contains("Window"), scrubPlan)
    // chunks of 2: [all rights][reserved by][the site][owner uniqueN]
    // [tailN] — the first three survive only in doc 1 (smallest id)
    val kept = scrub.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept(1L) == 5L && (2L to 200L).forall(kept(_) == 2L))
  }
}
