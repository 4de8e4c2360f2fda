package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.acl.PartitionAcl
import graft.functions.StringFns
import graft.listing.ObjectListing
import graft.util.Salting

/** ScalaCheck-generated properties per SURVEY §5: string-op invariants
  * (F1-F6) and filter-algebra laws (P2-P4), plus salting equivalence.
  * Properties are evaluated through Spark on generated literal batches
  * (one pass per property, not per case, to keep runtime sane). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('&', '<', '>', '"',
      '\'', '/', ' ', '='))).map(_.mkString).map(_.take(40))

  test("xmlEscape leaves no raw specials and is length-monotone") {
    val samples = Gen.listOfN(200, asciiText).sample.get
    val out = samples.toDF("s")
      .select(col("s"), StringFns.xmlEscape(col("s")).as("e"))
      .collect()
    out.foreach { r =>
      val (s, e) = (r.getString(0), r.getString(1))
      // after escaping, every & starts an entity; no raw < > " '
      assert(!e.exists(c => c == '<' || c == '>' || c == '"' || c == '\''))
      assert("&(?!amp;|lt;|gt;|quot;|apos;)".r.findFirstIn(e).isEmpty, s"$s -> $e")
      assert(e.length >= s.length)
    }
  }

  test("native xmlEscape == chained-replace reference algorithm") {
    val samples = Gen.listOfN(300, asciiText).sample.get ++
      Seq("", "&amp;", "&&&", "<<>>\"'", "héllo<ünïcode>&")
    val out = samples.toDF("s")
      .select(StringFns.xmlEscape(col("s")).as("a"),
        StringFns.xmlEscapeChained(col("s")).as("b"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("range parse round-trips generated ranges") {
    val gen = for {
      a <- Gen.chooseNum(0L, 1000000L)
      len <- Gen.chooseNum(1L, 100000L)
    } yield (a, a + len - 1)
    val samples = Gen.listOfN(200, gen).sample.get
    val out = samples.toDF("a", "b")
      .select(col("a"), col("b"),
        StringFns.rangeStart(concat(lit("bytes="), col("a").cast("string"),
          lit("-"), col("b").cast("string"))).as("s"),
        StringFns.rangeEnd(concat(lit("bytes="), col("a").cast("string"),
          lit("-"), col("b").cast("string"))).as("e"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) && r.getLong(3) == r.getLong(1))
    }
  }

  test("P2-P4 filter algebra: pruned ⊆ all; OR-union ⊇ each branch; dedup") {
    val files = ObjectListing.filesDF(spark, TestSpark.sfTiny)
    val f1: PartitionAcl.Filters = Seq(Map("l_returnflag" -> "R"))
    val f2: PartitionAcl.Filters =
      Seq(Map("l_returnflag" -> "N", "l_linestatus" -> "O"))
    val both = PartitionAcl.allowedFiles(files, f1 ++ f2)
    val a1 = PartitionAcl.allowedFiles(files, f1)
    val a2 = PartitionAcl.allowedFiles(files, f2)
    // pruned ⊆ all
    assert(both.join(files, Seq("key"), "left_anti").count() == 0)
    // union-of-filters ⊇ each filter
    assert(a1.join(both, Seq("key"), "left_anti").count() == 0)
    assert(a2.join(both, Seq("key"), "left_anti").count() == 0)
    // |union| <= |a1| + |a2| (dedup across overlapping filters)
    assert(both.count() <= a1.count() + a2.count())
    // AND strengthens: adding a conjunct never grows the set
    val tighter = PartitionAcl.allowedFiles(files,
      Seq(Map("l_returnflag" -> "R", "l_linestatus" -> "F")))
    assert(tighter.count() <= a1.count())
    assert(tighter.join(a1, Seq("key"), "left_anti").count() == 0)
  }

  test("salted aggregation equals direct aggregation") {
    val ev = Tables.events(spark, TestSpark.sfTiny)
    val direct = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedCount(ev, "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    val directSum = ev.groupBy("event_type")
      .agg((sum(round(col("value") * 100)) / 100.0).as("t"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val saltedSum = Salting.saltedGridSum(ev, "event_type", col("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(saltedSum == directSum)
  }

  test("listing pagination partitions the ordered key space") {
    val files = ObjectListing.filesDF(spark, TestSpark.sfTiny)
    val n = files.count()
    val pageSize = 1000
    val pages = (1 to ((n / pageSize) + 1).toInt)
      .map(p => ObjectListing.page(files, pageSize, p).count())
    assert(pages.sum == n)
  }

  // strings that exercise every edge the native one-pass expressions
  // must share with their documented Spark-SQL compositions: empty,
  // shorter than the window, ASCII, multi-byte BMP, astral (surrogate
  // pairs), repeats (dedup), whitespace
  private val parityTexts = Seq("", "a", "ab", "abc", "abcd",
    "aaaaaaaaaaaa", "über brücke ße", "中文文本去重测试中文文本",
    "😀😀 astral 😀 plane", "the quick brown fox jumps over the lazy dog",
    " leading and trailing  ", "mixéd ascii ünd ünïcode 中 text")

  test("NgramCodes matches the sequence/transform composition exactly") {
    for (n <- 1 to 3) {
      val df = parityTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val composed = array_sort(array_distinct(transform(
        sequence(lit(1), greatest(length(col("text")) - (n - 1), lit(1))),
        i => (0 until n).map { o =>
          ascii(col("text").substr(i + lit(o), lit(1))).cast("long") *
            (1L << (21 * (n - 1 - o)))
        }.reduce(_ + _))))
      val rows = df.select(col("id"),
        org.apache.spark.sql.graft.NgramCodes(col("text"), n).as("native"),
        composed.as("composed")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n text='${parityTexts(r.getLong(0).toInt)}'")
      }
    }
  }

  test("text-scan natives match their regexp/lambda compositions exactly") {
    import graft.llm.TextAnalysis
    val df = parityTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val all = TextAnalysis.stopwords.flatMap(_._2)
    val rows = df.select(col("id"),
      org.apache.spark.sql.graft.CharClassCount.alpha(col("text")).as("na"),
      length(regexp_replace(col("text"), "[^a-z]", "")).as("ca"),
      org.apache.spark.sql.graft.CharClassCount.punct(col("text")).as("np"),
      length(regexp_replace(col("text"), "[a-z0-9 ]", "")).as("cp"),
      org.apache.spark.sql.graft.NormalizeText(col("text")).as("nn"),
      TextAnalysis.normalizedComposed(col("text")).as("cn"),
      element_at(org.apache.spark.sql.graft.StopwordHitsArray(col("text"),
        Seq(all)), 1).as("ns"),
      TextAnalysis.stopwordHits(col("text"), all).as("cs"),
      org.apache.spark.sql.graft.TokenCount(col("text")).as("nt"),
      size(TextAnalysis.tokens(col("text"))).as("ct")).collect()
    rows.foreach { r =>
      val t = parityTexts(r.getLong(0).toInt)
      assert(r.getInt(1) == r.getInt(2), s"alpha '$t'")
      assert(r.getInt(3) == r.getInt(4), s"punct '$t'")
      assert(r.getString(5) == r.getString(6), s"normalize '$t'")
      assert(r.getInt(7) == r.getInt(8), s"stopwords '$t'")
      assert(r.getInt(9) == r.getInt(10), s"tokens '$t'")
    }
  }

  test("RepetitionStats matches the HOF composition exactly") {
    import graft.llm.TextAnalysis
    val texts = parityTexts ++ Seq("a a a a b b c", "x y x y x y",
      "one two one two one", "solo")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = df.select(col("id"),
      org.apache.spark.sql.graft.RepetitionStats(col("text")).as("n"),
      TextAnalysis.repetitionCountsComposed(col("text")).as("c")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"text='${texts(r.getLong(0).toInt)}'")
    }
  }

  test("languageId inline argmax matches the explode+window ranking") {
    import graft.llm.TextAnalysis
    val docs = Tables.load(spark, TestSpark.sfTiny, "documents")
    // the pre-optimization formulation, inlined as the reference
    val scoreStructs = TextAnalysis.stopwords.map { case (lang, words) =>
      struct(lit(lang).as("cand_lang"),
        TextAnalysis.stopwordHits(col("text"), words).as("hits"))
    }
    val scored = docs
      .select(col("doc_id"), explode(array(scoreStructs: _*)).as("s"))
      .select(col("doc_id"), col("s.cand_lang").as("cand_lang"),
        col("s.hits").as("hits"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("hits").desc, col("cand_lang").asc)
    val ref = scored.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
      .toMap
    val got = TextAnalysis.languageId(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(got == ref)
  }

  test("SimHash64 matches the exploded token-bit-vote composition") {
    import graft.llm.Dedup
    val docs = Tables.load(spark, TestSpark.sfTiny, "documents").limit(150)
      .union(parityTexts.zipWithIndex
        .map { case (t, i) => (100000L + i, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val native = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = Dedup.simhashComposed(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == composed)
  }

  test("SignLshBucket matches the aggregate/zip_with composition") {
    import graft.llm.Similarity
    val e = Tables.load(spark, TestSpark.sfTiny, "embeddings").limit(200)
    val rows = e.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 64, 8).as("nat"),
      Similarity.lshBucketComposed(col("embedding"), 64, 8).as("comp"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"vec ${r.getLong(0)}"))
    // length mismatch: the composition null-poisons every fold -> 0;
    // the native form must agree, not compute a partial projection
    val ragged = Seq(Tuple1(Array(1.0f, 2.0f, 3.0f))).toDF("embedding")
    val rr = ragged.select(
      Similarity.lshBucket(col("embedding"), 64, 8).as("nat"),
      Similarity.lshBucketComposed(col("embedding"), 64, 8).as("comp"))
      .collect()(0)
    assert(rr.getLong(0) == 0L && rr.isNullAt(1) == false && rr.getLong(1) == 0L)
  }

  test("MinHashSig matches the md5-chunk-min composition exactly") {
    for ((k, stride) <- Seq((10, 2), (5, 1), (3, 3))) {
      val df = parityTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val shingles = array_distinct(transform(
        sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(1)),
          lit(stride)),
        i => col("text").substr(i, lit(k))))
      val composedCols = (0 until 12).map { j =>
        val prefix = if (j < 6) "a:" else "b:"
        val off = 1 + 5 * (j % 6)
        array_min(transform(shingles,
          s => md5(concat(lit(prefix), s)).substr(lit(off), lit(5))))
          .as(s"c$j")
      }
      val native = df.select(col("id"),
        org.apache.spark.sql.graft.MinHashSig(col("text"), k, stride)
          .as("mh"))
      val rows = native.select(col("id") +: (0 until 12).map(j =>
          element_at(col("mh"), j + 1).as(s"n$j")): _*)
        .join(df.select(col("id") +: composedCols: _*), "id")
        .collect()
      rows.foreach { r =>
        for (j <- 0 until 12)
          assert(r.getString(1 + j) == r.getString(13 + j),
            s"k=$k stride=$stride chunk=$j " +
              s"text='${parityTexts(r.getLong(0).toInt)}'")
      }
    }
  }

  test("InterleaveBits matches the shift-or composition exactly") {
    import graft.operators.ZOrder
    val gen = Gen.listOfN(300,
      Gen.zip(Gen.chooseNum(0, 65535), Gen.chooseNum(0, 65535),
        Gen.chooseNum(0, 65535)))
    val triples = gen.sample.get :+ ((0, 0, 0)) :+ ((65535, 65535, 65535))
    for ((bits, dims) <- Seq((16, 2), (16, 3), (8, 3), (4, 2))) {
      val df = triples.toDF("a", "b", "c")
      val cols = Seq(col("a"), col("b"), col("c")).take(dims)
      val rows = df.select(
        org.apache.spark.sql.graft.InterleaveBits(bits, cols: _*).as("n"),
        ZOrder.interleaveComposed(bits, cols: _*).as("r")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"bits=$bits dims=$dims"))
    }
    // null in any child -> null
    val withNull = Seq((Some(1), None: Option[Int])).toDF("a", "b")
    assert(withNull.select(org.apache.spark.sql.graft.InterleaveBits(
      16, col("a"), col("b"))).collect()(0).isNullAt(0))
    // ordering locality: z-codes of close points interleave monotonically
    // on the diagonal (a == b ascending => code ascending)
    val diag = (0 until 1000).map(i => (i, i)).toDF("a", "b")
      .select(org.apache.spark.sql.graft.InterleaveBits(
        16, col("a"), col("b")).as("z")).collect().map(_.getLong(0))
    assert(diag.sameElements(diag.sorted))
  }

  test("bloom filter: NO false negatives on generated sets; FPs bounded") {
    import org.apache.spark.sql.graft.BloomFns
    // the word generator must be total: suchThat(_.nonEmpty) can exhaust
    // its retry budget and make .sample.get throw NoSuchElementException
    // (a flake, not a property violation) — build non-empty strings by
    // construction and retry the (practically infallible) sample
    val strs = Gen.listOfN(300, Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)))
    val words = Iterator.continually(strs.sample)
      .flatten.next().distinct
    val (members, others) = words.splitAt(words.length / 2)
    val bloom = members.toDF("gram").agg(
      BloomFns.bloomAgg(xxhash64(col("gram")), 1024L, 16384L).as("bf"))
    def probe(xs: Seq[String]) = xs.toDF("gram")
      .where(BloomFns.mightContain(bloom, xxhash64(col("gram"))))
      .count()
    // the bloom contract: every member hits (no false negatives ever)
    assert(probe(members) == members.length)
    // non-members may false-positive, but at 16 bits/item the rate is
    // well under 1% — allow a loose 10% bound to keep the test stable
    assert(probe(others) <= math.max(2L, others.length / 10))
  }
}
