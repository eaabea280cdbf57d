package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpecBase {

  private def oneDoc(text: String) = {
    import spark.implicits._
    Seq((0L, text)).toDF("doc_id", "text")
  }

  test("whitespace tokens lowercase and trim") {
    val toks = oneDoc("  The QUICK  brown\tFox ")
      .select(TextAnalysis.tokensCol(col("text"))).head().getSeq[String](0)
    assert(toks == Seq("the", "quick", "brown", "fox"))
  }

  test("bpe-ish token count: letter runs, digit runs, single punct") {
    val n = oneDoc("abc123 def!?").select(TextAnalysis.bpeTokenCountCol(col("text")))
      .head().getInt(0)
    assert(n == 5) // abc | 123 | def | ! | ?
  }

  test("language id picks the dominant marker language") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat is on the mat and it is flat"),
      (1L, "el gato y la casa de los perros"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "le chat et les chiens est un animal")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextAnalysis.langIdCol(TextAnalysis.tokensCol(col("text"))).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(0L -> "en", 1L -> "es", 2L -> "de", 3L -> "fr"))
  }

  test("quality features hand-computed") {
    val r = TextAnalysis.qualityFeatures(oneDoc("The cat, the hat!")).head()
    assert(r.getAs[Long]("n_chars_m") == 17L)
    assert(r.getAs[Long]("n_tokens") == 4L)
    // tokens: the cat, the hat! → lengths 3+4+3+4 = 14 (punct kept in token)
    assert(r.getAs[Double]("avg_token_len") == 14.0 / 4)
    assert(r.getAs[Double]("punct_ratio") == 2.0 / 17)
    assert(r.getAs[Double]("stopword_ratio") == 2.0 / 4)
  }

  test("fingerprint: rolling hash is order-sensitive, md5 is content hash") {
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, "c b a"), (2L, "a b c")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("fp_md5"), r.getAs[Long]("fp_rolling"))).toMap
    assert(fp(0L) == fp(2L))
    assert(fp(0L)._2 != fp(1L)._2, "token order must change the rolling hash")
  }

  test("rolling fingerprint matches a BigInt reference fold (oracle parity)") {
    import spark.implicits._
    val M = BigInt("2305843009213693951") // 2^61 - 1
    def ref(text: String): Long = {
      val toks = text.trim.toLowerCase.split("\\s+")
      toks.foldLeft(BigInt(0)) { (acc, t) =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8"))
        val h = (0 until 8).foldLeft(BigInt(0))((a, b) => (a << 8) | BigInt(d(b) & 0xFF))
        (acc * 1000003 + h % M) % M
      }.toLong
    }
    val texts = Seq("the cat sat", "a", "x y z w v u t s r q p o n m l k",
      "same same same", "MiXeD Case   runs")
    val fp = TextAnalysis.fingerprint(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp_rolling")).toMap
    for ((t, i) <- texts.zipWithIndex)
      assert(fp(i.toLong) == ref(t), s"text '$t'")
  }

  test("lm surprisal: hand-computed add-one unigram model") {
    import spark.implicits._
    val docs = Seq((0L, "a a b"), (1L, "b c")).toDF("doc_id", "text")
    // counts a:2 b:2 c:1, C=5, V=3 → p(a)=p(b)=3/8, p(c)=2/8
    val out = TextAnalysis.lmSurprisal(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_surprisal")))).toMap
    val sAB = -math.log(3.0 / 8)
    val sC = -math.log(2.0 / 8)
    assert(out(0L)._1 == 3L)
    assert(math.abs(out(0L)._2 - sAB) < 1e-6) // (2·s + 1·s)/3 = s
    assert(out(1L)._1 == 2L)
    assert(math.abs(out(1L)._2 - (sAB + sC) / 2) < 1e-6)
    // rarer tokens → higher surprisal
    assert(out(1L)._2 > out(0L)._2)
  }

  test("boilerplate share: common shingles counted, unique ones not") {
    import spark.implicits._
    // "x y z" appears in all 5 docs (df=5); each doc has one unique shingle
    val docs = (0 until 5).map(i => (i.toLong, s"x y z u$i v$i w$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateShare(docs, minDf = 5L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_boiler"),
          r.getAs[Double]("boilerplate_ratio")))).toMap
    // 6 tokens → 4 distinct 3-gram shingles; only "x y z" is df ≥ 5
    for (i <- 0L until 5L) {
      assert(out(i)._1 == 4L)
      assert(out(i)._2 == 1L)
      assert(out(i)._3 == 0.25)
    }
  }

  test("repetition features hand-computed, n-grams overlap windows") {
    // tokens [a b a b a]: 1-grams 5/2, 2-grams [ab ba ab ba] 4/2,
    // 3-grams [aba bab aba] 3/2
    val r = TextAnalysis.repetitionFeatures(oneDoc("a b a b a")).head()
    assert(r.getAs[Long]("total_1gram") == 5L)
    assert(r.getAs[Long]("distinct_1gram") == 2L)
    assert(r.getAs[Double]("dup_1gram_ratio") == 3.0 / 5)
    assert(r.getAs[Long]("total_2gram") == 4L)
    assert(r.getAs[Long]("distinct_2gram") == 2L)
    assert(r.getAs[Double]("dup_2gram_ratio") == 2.0 / 4)
    assert(r.getAs[Long]("total_3gram") == 3L)
    assert(r.getAs[Long]("distinct_3gram") == 2L)
    assert(r.getAs[Double]("dup_3gram_ratio") == 1.0 / 3)
  }

  test("repetition features: docs shorter than n yield zero counts and ratio") {
    val r = TextAnalysis.repetitionFeatures(oneDoc("hello")).head()
    assert(r.getAs[Long]("total_2gram") == 0L)
    assert(r.getAs[Long]("distinct_2gram") == 0L)
    assert(r.getAs[Double]("dup_2gram_ratio") == 0.0)
    assert(r.getAs[Long]("total_3gram") == 0L)
    assert(r.getAs[Double]("dup_3gram_ratio") == 0.0)
  }

  test("chunking: stride, overlap, short tail, tiny-doc single chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b")).toDF("doc_id", "text")             // shorter than a chunk
    val out = TextAnalysis.chunkDocuments(docs, chunkTokens = 4,
        overlapTokens = 1)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        (r.getAs[String]("chunk_text"), r.getAs[Long]("n_chunk_tokens"))).toMap
    // stride 3, starts while start <= 10-1: 1, 4, 7 → three chunks
    assert(out((1L, 0L)) == (("t1 t2 t3 t4", 4L)))
    assert(out((1L, 1L)) == (("t4 t5 t6 t7", 4L)))
    assert(out((1L, 2L)) == (("t7 t8 t9 t10", 4L)))
    assert(!out.contains((1L, 3L)), "no fully-overlapped trailing chunk")
    assert(out((2L, 0L)) == (("a b", 2L)), "tiny doc → one short chunk")
    assert(!out.contains((2L, 1L)))
  }

  test("chunking: null-text docs yield no chunks at all") {
    import spark.implicits._
    val docs = Seq((1L, Option("a b c")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val ids = TextAnalysis.chunkDocuments(docs, 4, 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L), "no phantom chunk for null text")
  }

  test("chunking covers every token: concatenated strides rebuild the doc") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 23).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(docs, 8, 3)
      .orderBy(col("chunk_id")).collect()
      .map(_.getAs[String]("chunk_text").split(" ").toSeq)
    // dropping each successor's 3-token overlap reproduces the doc
    val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(3))
    assert(rebuilt == (1 to 23).map(i => s"w$i"))
  }

  test("bm25 hand-computed: tf saturation, length norm, idf weighting") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana"),
      (3L, "cherry")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Search(docs, Seq("apple", "banana"),
        k1 = 1.2, b = 0.75, topK = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("bm25"), r.getAs[Long]("n_matched"))).toMap
    // N=3, sum_dl=5; idf_a=ln(4/2), idf_b=ln(4/3)
    def s(tf: Long, dl: Long, df: Long): Double =
      math.log(4.0 / (df + 1)) * (tf * 2.2) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl * 3 / 5.0))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._1 == r6(s(2, 3, 1) + s(1, 3, 2)))
    assert(out(1L)._2 == 2L)
    assert(out(2L)._1 == r6(s(1, 1, 2)))
    assert(out(2L)._2 == 1L)
    assert(!out.contains(3L), "docs matching no query term are absent")
  }

  test("bm25BatchFromIndex: per-query scores equal the single-query " +
      "index path (modulo the decimal-vs-per-term-column sum, which is " +
      "exact either way); unmatched queries emit nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana"),
      (3L, "cherry")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25b").toString
    TextAnalysis.writeInvertedIndex(docs, dir)
    val queries = Seq(
      (100L, "apple banana"),
      (200L, "cherry"),
      (300L, "quince")).toDF("query_id", "text")
    val got = TextAnalysis.bm25BatchFromIndex(spark, dir, queries)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getAs[Double]("bm25"), r.getLong(4)))
      .toMap
    // single-query twins from the same index
    def single(terms: Seq[String]) =
      TextAnalysis.bm25FromIndex(spark, dir, terms)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Double]("bm25"), r.getAs[Long]("n_matched"))).toMap
    val q100 = single(Seq("apple", "banana"))
    assert(got((100L, 1L))._2 == q100(1L)._1 &&
      got((100L, 1L))._3 == q100(1L)._2)
    assert(got((100L, 2L))._2 == q100(2L)._1)
    assert(got((100L, 1L))._1 == 1L && got((100L, 2L))._1 == 2L)
    assert(got((200L, 3L))._2 == single(Seq("cherry"))(3L)._1)
    assert(!got.keys.exists(_._1 == 300L),
      "a query with no indexed term emits no rows")
  }

  test("bm25 ranks higher-tf shorter docs first, topK truncates") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark"),
      (2L, "spark filler filler filler filler filler filler"),
      (3L, "spark"),
      (4L, "nothing here")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25Search(docs, Seq("spark"), topK = 2)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(got.length == 2)
    assert(got.head == 1L || got.head == 3L)
    assert(!got.contains(2L), "long low-tf doc must rank below topK=2")
  }

  test("pii redaction replaces emails, phones and ssns, leaves text alone") {
    import spark.implicits._
    val out = Seq(
      "mail me at jane.doe+x@corp.example.org thanks",
      "call 555-123-4567 or 555.987.6543",
      "ssn 123-45-6789 on file",
      "nothing sensitive here 12345"
    ).toDF("text").select(TextAnalysis.redactPiiCol(col("text")).as("c"))
      .collect().map(_.getString(0))
    assert(out(0) == "mail me at <EMAIL> thanks")
    assert(out(1) == "call <PHONE> or <PHONE>")
    assert(out(2) == "ssn <SSN> on file")
    assert(out(3) == "nothing sensitive here 12345")
  }

  test("doc terms counts term frequency per doc") {
    val dt = TextAnalysis.docTerms(oneDoc("a b a c a b"))
      .collect().map(r => r.getString(1) -> r.getAs[Long]("tf")).toMap
    assert(dt == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("bigramModel: exact conditional probabilities with deterministic ranks") {
    import spark.implicits._
    val docs = Seq((0L, "a b a b a c"), (1L, "a b x"), (2L, "solo"))
      .toDF("doc_id", "text")
    // bigrams: doc0 -> ab ba ab ba ac ; doc1 -> ab bx ; doc2 -> none
    val out = TextAnalysis.bigramModel(docs, minContextCount = 1L,
        topPerContext = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("c1"), r.getAs[Long]("rank"),
          r.getAs[Double]("p"))).toMap
    assert(out(("a", "b")) == ((3L, 4L, 1L, 0.75)))
    assert(out(("a", "c")) == ((1L, 4L, 2L, 0.25)))
    assert(out(("b", "a")) == ((2L, 3L, 1L, 0.666667)))
    assert(out(("b", "x")) == ((1L, 3L, 2L, 0.333333)))
    // "c" ends doc0, "x" ends doc1, "solo" is a 1-token doc: no context
    assert(!out.keySet.exists { case (w1, _) => Set("c", "x", "solo")(w1) })
  }

  test("bigramModel: minContextCount and topPerContext prune") {
    import spark.implicits._
    val docs = Seq((0L, "a b a b a c"), (1L, "z q")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramModel(docs, minContextCount = 2L,
        topPerContext = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // context z (count 1) pruned; only rank 1 per surviving context
    assert(out == Set(("a", "b"), ("b", "a")))
  }

  test("repetitionCharSignals: hand-computed char fractions, tie-break, " +
      "short-doc edges") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a b"),   // bigrams: "a b"x3, "b a"x2; trigrams all dup'd
      (1L, "x y z w"),       // all bigrams unique (tie) -> lex-min "w"? no: min of all
      (2L, "p q"),           // exactly 2 words: bigram only, null trigram frac
      (3L, "solo")           // < 2 words: absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionCharSignals(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 0: top "a b" (3 of 5 bigram occurrences, each 3 chars):
    // 3*3 / (5*3) = 0.6; trigrams "a b a"x2 + "b a b"x2 all duplicated
    assert(out(0L).getString(1) == "a b")
    assert(out(0L).getLong(2) == 3L)
    assert(out(0L).getDouble(3) == 0.6)
    assert(out(0L).getDouble(4) == 1.0)
    // doc 1: every bigram count 1 -> tie broken to lexicographic min
    assert(out(1L).getString(1) == "x y")
    assert(out(1L).getLong(2) == 1L)
    assert(out(1L).getDouble(4) == 0.0)
    // doc 2: one bigram covering all bigram chars; no trigram -> null
    assert(out(2L).getString(1) == "p q")
    assert(out(2L).getDouble(3) == 1.0)
    assert(out(2L).isNullAt(4))
    // doc 3: no bigram -> dropped
    assert(!out.contains(3L))
  }

  test("lmCrossSurprisal: OOV terms score the smoothed zero-count mass; " +
      "in-vocab docs score below out-of-vocab docs") {
    import spark.implicits._
    // reference: 3 terms, total count 4
    val ref = Seq((100L, "cat dog cat bird")).toDF("doc_id", "text")
    val tgt = Seq((1L, "cat cat"), (2L, "zebra quux")).toDF("doc_id", "text")
    val out = TextAnalysis.lmCrossSurprisal(ref, tgt)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // C = 4, V = 3: p(cat) = (2+1)/7, p(unseen) = 1/7
    val pCat = -math.log(3.0 / 7.0)
    val pOov = -math.log(1.0 / 7.0)
    assert(out(1L)._1 == 2L)
    assert(math.abs(out(1L)._2 - BigDecimal(pCat).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(1L)._3 == 0.0)
    assert(math.abs(out(2L)._2 - BigDecimal(pOov).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(2L)._3 == 1.0)
    assert(out(2L)._2 > out(1L)._2)
    TrackedCaches.release()
  }

  test("term stats idf: rare terms weigh more") {
    import spark.implicits._
    val docs = Seq((0L, "common rare"), (1L, "common"), (2L, "common")).toDF("doc_id", "text")
    val ts = TextAnalysis.termStats(docs)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("doc_freq"), r.getAs[Double]("idf"))).toMap
    assert(ts("common")._1 == 3L)
    assert(ts("rare")._1 == 1L)
    assert(ts("rare")._2 > ts("common")._2)
    assert(math.abs(ts("rare")._2 - math.log(4.0 / 2)) < 1e-9)
  }

  test("topKeywords: rare repeated terms outrank ubiquitous ones; " +
      "k bounds per-doc output; ties break by term") {
    import spark.implicits._
    // "stopword" appears in every doc (idf = ln(4/4) = 0); doc 1's
    // "special" has tf 2 and df 1
    val docs = Seq(
      (1L, "stopword special special unique"),
      (2L, "stopword other other"),
      (3L, "stopword misc")).toDF("doc_id", "text")
    val out = TextAnalysis.topKeywords(docs, k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank")) ->
        (r.getAs[String]("term"), r.getAs[Double]("score"))).toMap
    assert(out((1L, 1L))._1 == "special")
    assert(out((1L, 1L))._2 == 1.386294) // 2 * ln(4/2)
    assert(out((1L, 2L))._1 == "unique") // 1 * ln(4/2) beats stopword's 0
    assert(out((2L, 1L))._1 == "other")
    // k = 2 everywhere, never more
    assert(out.keys.groupBy(_._1).values.forall(_.size <= 2))
  }

  test("gopherRules computes the word/line battery on a crafted doc") {
    import spark.implicits._
    val text = "- bullet one\n* bullet two\nplain line...\n\n  \nhas # and ... marks"
    val out = TextAnalysis.gopherRules(
      Seq((1L, text)).toDF("doc_id", "text"), minWords = 2L).head()
    // tokens of lower(trim(text)) split on \s+: 13 words
    assert(out.getAs[Long]("n_words") == 13L)
    // non-empty trimmed lines: 4 (the blank and whitespace-only lines drop)
    assert(out.getAs[Double]("bullet_ratio") == 2.0 / 4)
    // only "plain line..." ENDS with an ellipsis (the mid-line "..." does not)
    assert(out.getAs[Double]("ellipsis_ratio") == 1.0 / 4)
    // symbols: one '#', two '...' occurrences -> 3/13
    assert(out.getAs[Double]("symbol_ratio") == 3.0 / 13)
    // '-', '*', '#', '...' carry no letter -> 9 of 13 words are alphabetic
    assert(out.getAs[Double]("frac_alpha_words") == 9.0 / 13)
  }

  test("gopherRules keep verdict follows the thresholds") {
    import spark.implicits._
    val good = ("w" * 4 + " ") * 60 // 60 words of length 4 -> keep
    val short = "tiny doc"          // 2 words -> fail min words
    val symbols = (("word " * 60) + "# " * 30).trim // symbol ratio >= 0.1
    val out = TextAnalysis.gopherRules(
      Seq((1L, good), (2L, short), (3L, symbols)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(out(1L))
    assert(!out(2L))
    assert(!out(3L))
  }

  test("lexicalDiversity: exact TTR, Simpson and entropy on a known doc") {
    import spark.implicits._
    val out = TextAnalysis.lexicalDiversity(
      Seq((1L, "a a b"), (2L, "x")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_tokens") == 3L)
    assert(d1.getAs[Long]("n_types") == 2L)
    assert(d1.getAs[Double]("ttr") == 2.0 / 3)
    // P(two draws same type) = (2*1)/(3*2) = 1/3
    assert(d1.getAs[Double]("simpson") == 1.0 / 3)
    // -(2/3 ln 2/3 + 1/3 ln 1/3) = ln3 - 2/3 ln2 = 0.636514
    assert(d1.getAs[Double]("entropy_nats") == 0.636514)
    val d2 = out(2L)
    assert(d2.getAs[Long]("n_tokens") == 1L)
    assert(d2.isNullAt(d2.fieldIndex("simpson"))) // undefined at N = 1
    assert(d2.getAs[Double]("entropy_nats") == 0.0)
    assert(d2.getAs[Double]("ttr") == 1.0)
  }

  test("knBigram: hand-computed Kneser-Ney probabilities") {
    import spark.implicits._
    // bigrams: (a,b)x2, (b,a)x1, (a,c)x1 -> c1(a)=3, c1(b)=1;
    // successors: a->2, b->1; predecessors: each of a,b,c has 1; T=3
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.knBigram(docs, minContextCount = 1L,
        topPerContext = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("c12") == 2L && ab.getAs[Long]("c1") == 3L)
    assert(ab.getAs[Long]("n1p_fwd") == 2L && ab.getAs[Long]("n1p_back") == 1L)
    // (2-.75)/3 + (.75*2/3)*(1/3) = 0.583333
    assert(ab.getAs[Double]("p_kn") == 0.583333)
    assert(out(("a", "c")).getAs[Double]("p_kn") == 0.25)
    assert(out(("b", "a")).getAs[Double]("p_kn") == 0.5)
    // ranks: within context a, (a,b) beats (a,c)
    assert(ab.getAs[Long]("rank") == 1L)
    assert(out(("a", "c")).getAs[Long]("rank") == 2L)
  }

  test("heapsLaw: exact N and V per slice, exponent ln V / ln N") {
    import spark.implicits._
    val docs = Seq(
      ("web", "a b a c"), ("web", "a d"),      // N=6, V=4
      ("tiny", "x"))                            // N=1 -> exponent null
      .toDF("source", "text")
    val out = TextAnalysis.heapsLaw(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("web").getAs[Long]("n_tokens") == 6L)
    assert(out("web").getAs[Long]("vocab") == 4L)
    assert(math.abs(out("web").getAs[Double]("heaps_exponent") -
      math.log(4.0) / math.log(6.0)) < 1e-6)
    assert(out("tiny").getAs[Long]("n_tokens") == 1L)
    assert(out("tiny").isNullAt(out("tiny").fieldIndex("heaps_exponent")))
  }

  /** Local replay of the winnowing selection for a token list (k=4, w=4)
    * — the same md5-hex gram hashes and leftmost-min rule.
    */
  private def winnowLocal(toks: Seq[String]): Set[(Int, String)] = {
    def hhex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val grams = (1 to toks.length - 3)
      .map(p => p -> hhex(toks.slice(p - 1, p + 3).mkString(" ")))
    (1 to grams.length - 3).map { start =>
      grams.slice(start - 1, start + 3)
        .minBy { case (p, h) => (h, p) }
    }.toSet.map((t: (Int, String)) => (t._1, t._2))
  }

  test("winnowFingerprints matches a local replay and honors the " +
    "shared-run guarantee") {
    import spark.implicits._
    val run = "x1 x2 x3 x4 x5 x6 x7" // 7 tokens = w + k - 1
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, s"p q $run r s"),
      (3L, s"m n o $run"),
      (4L, "a b c d e f"), // 3 grams < w: no full window
      (5L, "a b c")) // fewer than k tokens: no grams
      .toDF("doc_id", "text")
    val out = TextAnalysis.winnowFingerprints(docs)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val byDoc = out.groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(byDoc(1L) == winnowLocal("a b c d e f g h".split(" ").toSeq))
    assert(!byDoc.contains(4L) && !byDoc.contains(5L))
    // docs 2 and 3 share the 7-token run → at least one common fingerprint
    val fp2 = byDoc(2L).map(_._2)
    val fp3 = byDoc(3L).map(_._2)
    assert(fp2.intersect(fp3).nonEmpty)
  }

  test("readability: hand-computed Flesch / FK-grade on a two-sentence " +
    "doc; wordless docs excluded") {
    import spark.implicits._
    val docs = Seq((1L, "The cat sat. It was flat!"), (2L, "   "),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    val r = out.head
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_syllables") == 6L)
    // 0.39·3 + 11.8·1 − 15.59 ; 206.835 − 1.015·3 − 84.6·1
    assert(r.getAs[Double]("fk_grade") == -2.62)
    assert(r.getAs[Double]("flesch_ease") == 119.19)
  }

  test("frequencySpectrum + goodTuring: hand-computed N_r, mass, r* " +
    "and the null fallback at the shelf edge") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val spec = TextAnalysis.frequencySpectrum(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Double]("mass"))).toMap
    assert(spec == Map(
      1L -> (1L, 0.166667), 2L -> (1L, 0.333333), 3L -> (1L, 0.5)))
    val gt = TextAnalysis.goodTuring(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(gt(1L).getAs[Double]("r_star") == 2.0) // 2·N2/N1
    assert(gt(1L).getAs[Double]("p_gt") ==
      math.rint(2.0 / 6.0 * 1e9) / 1e9)
    assert(gt(2L).getAs[Double]("r_star") == 3.0)
    assert(gt(3L).isNullAt(gt(3L).fieldIndex("r_star"))) // N4 = 0
  }

  test("phraseDetect: hand-computed discounted lift; delta suppresses " +
    "rare pairs; threshold filters") {
    import spark.implicits._
    val docs = ((1 to 10).map(i => (i.toLong, "new york")) ++
      (11 to 15).map(i => (i.toLong, "old car")) ++
      (16 to 20).map(i => (i.toLong, "car old")))
      .toDF("doc_id", "text")
    // N=40; c(new)=c(york)=10, pair 10 → δ=0 score 10·40/100 = 4;
    // (old,car)/(car,old) each 5 → 5·40/100 = 2
    val noDelta = TextAnalysis.phraseDetect(docs, threshold = 3.0,
      delta = 0L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_pair"), r.getAs[Double]("score"))).toMap
    assert(noDelta == Map(("new", "york") -> (10L, 4.0)))
    // δ=5 discounts: (new,york) → 5·40/100 = 2; (old,car) → 0
    val d5 = TextAnalysis.phraseDetect(docs, threshold = 1.0, delta = 5L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("score")).toMap
    assert(d5 == Map(("new", "york") -> 2.0))
  }

  test("tagKeywords: tags via distinct-token dictionary join, " +
    "unmatched docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Data model flows"),
      (2L, "quality Sample data data"),
      (3L, "nothing here")).toDF("doc_id", "text")
    val dict = Seq("data" -> "tech", "model" -> "tech",
      "quality" -> "curation", "sample" -> "curation")
    val out = TextAnalysis.tagKeywords(docs, dict)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getAs[Long]("n_matched_terms"))).toMap
    assert(out == Map(
      1L -> ("tech", 2L),
      2L -> ("curation,tech", 3L)))
  }

  test("winnowFingerprints is repartition-invariant and position-sound") {
    import spark.implicits._
    val docs = Seq((1L, ('a' to 'z').mkString(" "))).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.winnowFingerprints(d)
        .orderBy("doc_id", "pos", "fingerprint").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    val a = run(docs)
    assert(a == run(docs.repartition(4)))
    // every selected position is a valid gram start
    assert(a.forall { case (_, p, _) => p >= 1 && p <= 26 - 3 })
    // coverage: consecutive selected positions are never more than w apart
    val ps = a.map(_._2).distinct.sorted
    assert(ps.zip(ps.tail).forall { case (x, y) => y - x <= 4 })
  }

  test("vocabCoverageCurve: hand-computed ranks, cumulative mass and " +
    "shares; ties break by token; repartition-invariant") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b b c"), (2L, "b d"), (3L, null: String))
      .toDF("doc_id", "text")
    // freqs: a=3 b=3 c=1 d=1, total 8; rank by (freq DESC, token):
    // a(3) b(3) c(1) d(1); cum 3,6,7,8 → shares .375 .75 .875 1.0
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.vocabCoverageCurve(d).orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSeq
    val out = run(docs)
    assert(out == Seq(
      (1L, "a", 3L, 3L, 0.375), (2L, "b", 3L, 6L, 0.75),
      (3L, "c", 1L, 7L, 0.875), (4L, "d", 1L, 8L, 1.0)), out)
    assert(run(docs.repartition(4)) == out, "partitioning leaked in")
  }

  test("clusterTerms: class-based TF-IDF scores, top-m per cluster, " +
    "tie by term") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple apple banana"), (1L, "apple fruit"),
      (2L, "car car road"), (3L, "car engine")).toDF("doc_id", "text")
    val assign = Seq((0L, 0), (1L, 0), (2L, 1), (3L, 1))
      .toDF("doc_id", "cluster")
    // tf_c: c0 {apple 3, banana 1, fruit 1}, c1 {car 3, road 1,
    // engine 1}; f_t: apple 3, car 3, others 1; A = 10/2 = 5
    // score(apple|c0) = 3·ln(1+5/3) = 2.942488; ln(1+5) = 1.791759
    val out = TextAnalysis.clusterTerms(docs, assign, m = 2)
      .orderBy("cluster", "rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      (0, 1L, "apple", 2.942488, 3L, 3L),
      (0, 2L, "banana", 1.791759, 1L, 1L), // fruit ties, term asc
      (1, 1L, "car", 2.942488, 3L, 3L),
      (1, 2L, "engine", 1.791759, 1L, 1L)), out)
  }
}
