package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Semantic invariants for the PipelineOps corpus-statistics queries
  * (vocab building, hashed-feature classifier, bigram-LM scoring,
  * passage dedup, overlapping chunking). The DuckDB oracle is the
  * equivalence gate; these pin the properties a hash compare can't
  * express — and the ASCII/width precondition the XXH64 oracle chain
  * depends on.
  */
class CorpusOpsSpec extends SparkSuite {

  private def docs = Tables.load(spark, sf, "documents")

  test("quality_classifier oracle precondition: tokens are ASCII, <32 bytes") {
    // XxHash64Sql's generated chain reads bytes as ascii(t[i]) and only
    // emits the <32-byte path; a corpus change must fail HERE, not as a
    // silent oracle mismatch.
    val bad = Dedup.tokens(docs)
      .select(explode(col("t")).as("t"))
      .where(length(col("t")) >= 32 || col("t").rlike("[^\\x00-\\x7F]"))
      .count()
    assert(bad == 0L)
  }

  test("quality_classifier: score is the exact per-token weight sum") {
    val out = q("quality_classifier").cache()
    // weights live in [-128, 127], so |score| <= 128 * n_tokens
    assert(out.where(abs(col("score")) > col("n_tokens") * 128).count() == 0)
    assert(out.where(col("keep") =!= (col("score") >= 0)).count() == 0)
    // recompute one document independently (collect-side fold)
    val row = out.orderBy("doc_id").limit(1).collect()(0)
    val toks = docs.where(col("doc_id") === row.getLong(0))
      .select(explode(Dedup.tokenArr(col("text"))).as("t"))
      .select(xxhash64(col("t")).as("h")).collect()
      .map(r => (r.getLong(0) & 255L) - 128L)
    assert(toks.length.toLong == row.getLong(1))
    assert(toks.sum == row.getLong(2))
    out.unpersist()
  }

  test("lm_bigram_score: every doc scores negative log-prob, one term per bigram") {
    val out = q("lm_bigram_score")
    val n = docs.count()
    assert(out.count() == n)
    // add-one smoothing keeps every term's probability < 1 => sum < 0
    assert(out.where(col("logp_micro") >= 0).count() == 0)
    val expect = docs.select(col("doc_id"),
      (size(Dedup.tokenArr(col("text"))) - 1).cast("long").as("nb"))
    assert(out.join(expect, "doc_id")
      .where(col("n_bigrams") =!= col("nb")).count() == 0)
  }

  test("dedup_passage: planted excerpts are fully duplicated, bases flag >= 2 blocks") {
    val out = q("dedup_passage").cache()
    val excerpts = out.where(col("doc_id") >= 2000000L)
    assert(excerpts.count() > 0)
    assert(excerpts.where(col("n_dup_blocks") =!= col("n_blocks")).count() == 0)
    assert(excerpts.where(col("clean_text") =!= "").count() == 0)
    // every planted base doc's first two 8-token blocks are duplicated
    val planted = out.where(col("doc_id") % 5 === 0 && col("doc_id") < 2000000L)
    assert(planted.where(col("n_dup_blocks") < 2).count() == 0)
    // block math: n_blocks == ceil(tokens / 8) for the base corpus
    val expect = docs.select(col("doc_id"),
      ceil(size(Dedup.tokenArr(col("text"))) / lit(8.0)).cast("long").as("eb"))
    assert(out.join(expect, "doc_id")
      .where(col("n_blocks") =!= col("eb")).count() == 0)
    out.unpersist()
  }

  test("chunk_overlap: stride-24 windows, 8-token overlap, faithful payload") {
    val out = q("chunk_overlap").cache()
    // consecutive chunks start exactly stride apart, idx is dense from 0
    assert(out.where(col("start_pos") =!= col("chunk_idx") * 24 + 1).count() == 0)
    assert(out.where(col("n_tokens") > 32 || col("n_tokens") < 1).count() == 0)
    // exact width: min(32, remaining tokens from this start)
    val widths = docs.select(col("doc_id"),
      size(Dedup.tokenArr(col("text"))).cast("long").as("n"))
    assert(out.join(widths, "doc_id")
      .where(col("n_tokens") =!=
        least(lit(32L), col("n") - col("start_pos") + 1))
      .count() == 0)
    // payload check: chunk_md5 equals md5 of the independently-sliced window
    val expect = docs
      .select(col("doc_id"), Dedup.tokenArr(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(t), 24),
           s -> struct(CAST((s - 1) div 24 AS BIGINT) AS chunk_idx,
                       md5(array_join(slice(t, s, 32), ' ')) AS m))""")).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"), col("c.m").as("m"))
    assert(out.join(expect, Seq("doc_id", "chunk_idx"))
      .where(col("chunk_md5") =!= col("m")).count() == 0)
    out.unpersist()
  }

  test("vocab_topk: dense ranks, non-increasing counts, exact top-1") {
    val out = q("vocab_topk").cache()
    val rows = out.orderBy("rank").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.zipWithIndex.forall { case (r, i) => r.getAs[Int]("rank") == i + 1 })
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    val top = Dedup.tokens(docs).select(explode(col("t")).as("tok"))
      .groupBy("tok").count().orderBy(col("count").desc, col("tok"))
      .limit(1).collect()(0)
    assert(rows(0).getAs[String]("tok") == top.getString(0) &&
      cnts(0) == top.getLong(1))
    out.unpersist()
  }

  test("bpe_train precondition: corpus tokens contain neither sentinel") {
    // the BPE symbol string uses \x01 as separator and \x02 as
    // end-of-word; a corpus change that introduces them must fail HERE
    val bad = Dedup.tokens(docs).select(explode(col("t")).as("t"))
      .where(col("t").contains("\u0001") || col("t").contains("\u0002"))
      .count()
    assert(bad == 0L)
  }

  test("bpe_train: merged symbols compose, best-pair count never increases") {
    val rows = q("bpe_train").orderBy("iter").collect()
    assert(rows.length == 12)
    assert(rows.zipWithIndex.forall { case (r, i) => r.getAs[Long]("iter") == i + 1 })
    assert(rows.forall(r =>
      r.getAs[String]("merged") == r.getAs[String]("s1") + r.getAs[String]("s2")))
    // merging (s1,s2) caps every later pair containing the new symbol at
    // this pair's count, so the argmax sequence is non-increasing
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    // iteration 1 re-derived independently: the most frequent adjacent
    // char pair over (chars + end-of-word), weighted by word frequency
    val first = Dedup.tokens(docs).select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        expr("concat(regexp_extract_all(w, '.', 0), array('\u0002'))").as("s"))
      .select(col("cnt"), explode(expr(
        """transform(sequence(1, size(s) - 1),
           i -> struct(element_at(s, i) AS s1, element_at(s, i + 1) AS s2))"""))
        .as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(sum(col("cnt")).as("c"))
      .orderBy(col("c").desc, col("s1"), col("s2")).limit(1).collect()(0)
    val disp = (x: String) => x.replace("\u0002", "</w>")
    assert(rows(0).getAs[String]("s1") == disp(first.getString(0)))
    assert(rows(0).getAs[String]("s2") == disp(first.getString(1)))
    assert(rows(0).getAs[Long]("cnt") == first.getLong(2))
  }

  test("bpe loop: adversarial vocab matches a reference implementation exactly") {
    // self-overlapping merges ("aaaa" under (a,a)), interleavings
    // ("abab"), forced count ties, and a seeded random vocab — all
    // driven through the EXACT production loop via bpeLoop, compared
    // against an independent greedy left-to-right reference
    import spark.implicits._
    val eow = "\u0002"
    def refBpe(words: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
      var cur: Map[Vector[String], Long] =
        words.map { case (w, c) => (w.map(_.toString).toVector :+ eow) -> c }
      val out = Seq.newBuilder[(String, String, Long)]
      for (_ <- 1 to k) {
        val pc = scala.collection.mutable.Map[(String, String), Long]()
          .withDefaultValue(0L)
        cur.foreach { case (syms, c) =>
          syms.zip(syms.tail).foreach(p => pc(p) += c)
        }
        val ((a, b), c) = pc.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((a, b, c))
        cur = cur.toSeq.map { case (syms, n) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              buf += a + b; i += 2
            } else { buf += syms(i); i += 1 }
          }
          (buf.result(), n)
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
      out.result()
    }
    val rnd = new scala.util.Random(42)
    val randomWords = Seq.fill(60)(
      Seq.fill(1 + rnd.nextInt(6))("ab".charAt(rnd.nextInt(2))).mkString)
    val adversarial = Seq(
      "aaaa", "aaaa", "aaaa", "aaa", "aa", "abab", "abab", "aab", "baa",
      "bbbb", "bbbb", "bb", "ab", "ba", "cc", "cc", "dd", "dd")
    val toksSeq = adversarial ++ randomWords
    val counts = toksSeq.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val toks = Seq((1L, toksSeq)).toDF("doc_id", "t")
    val got = graft.operators.CorpusOps.bpeLoop(toks, 6)((merges, _) => merges)
    val disp = (x: String) => x.replace(eow, "</w>")
    val expect = refBpe(counts, 6)
    assert(got.map(m => (m._2, m._3, m._5)) ==
      expect.map { case (a, b, c) => (disp(a), disp(b), c) },
      s"got=$got expect=$expect")
    // the distributed loop (forced via driverVocabLimit = 0) must agree
    // with the in-memory fast path bit-for-bit on the same adversarial
    // vocabulary — the two paths share the argmax/replace semantics
    val distGot = graft.operators.CorpusOps.bpeLoop(toks, 6, 0L)((m, _) => m)
    assert(distGot == got)
  }

  test("bpe loop: cutover boundaries (row and byte limits ±1) are path-invariant") {
    import spark.implicits._
    val toksSeq = Seq(
      "aaaa", "aaaa", "aaaa", "aaa", "aa", "abab", "abab", "aab", "baa",
      "bbbb", "bbbb", "bb", "ab", "ba", "cc", "cc", "dd", "dd")
    val toks = Seq((1L, toksSeq)).toDF("doc_id", "t")
    val nWords = toksSeq.distinct.size.toLong
    // repr = SEP + (c SEP SEP)* + EOW SEP → 3·len(w) + 3 chars (= bytes
    // on this ASCII vocab), summed over DISTINCT words
    val reprBytes = toksSeq.distinct.map(w => 3L * w.length + 3).sum
    val base = graft.operators.CorpusOps.bpeLoop(toks, 4)((m, _) => m)
    // row-limit boundary: nWords-1 forces the distributed loop, nWords
    // and nWords+1 take the fast path — merges must be bit-identical so
    // an off-by-one in the `<=` can never change results
    for (l <- Seq(nWords - 1, nWords, nWords + 1))
      assert(graft.operators.CorpusOps.bpeLoop(toks, 4, l)((m, _) => m) == base,
        s"row limit $l diverged")
    // byte-limit boundary, same contract
    for (b <- Seq(reprBytes - 1, reprBytes, reprBytes + 1))
      assert(graft.operators.CorpusOps.bpeLoop(toks, 4,
        driverVocabByteLimit = b)((m, _) => m) == base,
        s"byte limit $b diverged")
  }

  test("bpe loop: pair inventory exhausted before k — both paths stop identically") {
    import spark.implicits._
    // single-char words: merge 1 learns (a, EOW), after which every
    // word is one symbol and no pairs remain — a 6-merge request must
    // return the 1 learnable merge, not crash (empty argmax)
    val toks = Seq((1L, Seq("a", "a", "a"))).toDF("doc_id", "t")
    val fast = graft.operators.CorpusOps.bpeLoop(toks, 6)((m, _) => m)
    val dist = graft.operators.CorpusOps.bpeLoop(toks, 6, 0L)((m, _) => m)
    assert(fast == dist)
    assert(fast.length == 1 && fast.head._2 == "a" && fast.head._3 == "</w>")
  }

  test("bpe loop: non-BMP alphabet — fast path matches the loop's UTF-8 tie-break") {
    import spark.implicits._
    // U+1F355 (4-byte UTF-8, leading 0xF0) vs U+E000 (3-byte, 0xEE):
    // Java/UTF-16 orders the surrogate pair (0xD83C unit) FIRST, UTF-8
    // binary orders it LAST. A count tie between the two words' (sym,
    // EOW) pairs forces the argmax through the string tie-break, so a
    // UTF-16 comparison in the driver replay would learn a different
    // first merge than the distributed orderBy / DuckDB oracle ordering
    val astral = "\uD83C\uDF55" // U+1F355 (pizza)
    val pua = "\uE000"
    val toks = Seq((1L, Seq(astral, pua))).toDF("doc_id", "t")
    val fast = graft.operators.CorpusOps.bpeLoop(toks, 2)((m, _) => m)
    val dist = graft.operators.CorpusOps.bpeLoop(toks, 2, 0L)((m, _) => m)
    assert(fast == dist)
    // UTF-8 ordering must pick U+E000 (0xEE 80 80 < 0xF0 9F 8D 95)
    assert(fast.head._2 == pua, s"first merge ${fast.head} not UTF-8 ordered")
  }

  test("bpe_encode: dense ranks, conservation of end-of-word mass") {
    val out = q("bpe_encode").orderBy("rank").collect()
    assert(out.nonEmpty && out.length <= 50)
    assert(out.zipWithIndex.forall { case (r, i) => r.getAs[Long]("rank") == i + 1 })
    val cnts = out.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    // the LAST learned merge's symbol is never consumed by a later
    // merge, so its subword count equals the merge's argmax count
    val lastMerge = q("bpe_train").orderBy(col("iter").desc).limit(1).collect()(0)
    val inVocab = out.find(_.getAs[String]("subword") == lastMerge.getAs[String]("merged"))
    inVocab.foreach(r => assert(r.getAs[Long]("cnt") == lastMerge.getAs[Long]("cnt")))
    // un-truncated vocab ⇒ every token occurrence contributes exactly
    // one end-of-word-bearing subword
    if (out.length < 50) {
      val eowMass = out.filter(_.getAs[String]("subword").endsWith("</w>"))
        .map(_.getAs[Long]("cnt")).sum
      val totalToks = Dedup.tokens(docs)
        .select(sum(size(col("t")))).collect()(0).getLong(0)
      assert(eowMass == totalToks)
      assert(inVocab.isDefined)
    }
  }

  test("text_rank: exact integer fixpoint matches an in-memory replay") {
    val out = q("text_rank").orderBy("rank").collect()
    assert(out.length == 20)
    assert(out.zipWithIndex.forall { case (r, i) => r.getAs[Long]("rank") == i + 1 })
    val sc = out.map(_.getAs[Long]("score"))
    assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    // every node keeps at least the teleport mass
    assert(sc.forall(_ >= 150000L))
    // replay the whole computation in plain Scala over the collected
    // sf0.001 corpus — an oracle-independent equivalence check
    val toks = Dedup.tokens(docs).select(col("t")).collect()
      .map(_.getSeq[String](0))
    val cnt = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    toks.foreach(_.foreach(t => cnt(t) += 1))
    val nodes = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(100).map(_._1).toSet
    val ew = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    toks.foreach(ts => ts.iterator.zip(ts.iterator.drop(1)).foreach { case (a, b) =>
      if (nodes(a) && nodes(b)) { ew((a, b)) += 1; ew((b, a)) += 1 }
    })
    val outw = ew.toSeq.groupBy(_._1._1).map { case (src, es) => src -> es.map(_._2).sum }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val in = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      ew.foreach { case ((src, dst), w) => in(dst) += r(src) * w * 17 / (outw(src) * 20) }
      r = nodes.map(n => n -> (150000L + in(n))).toMap
    }
    val expect = r.toSeq.sortBy { case (t, v) => (-v, t) }.take(20)
    assert(out.map(x => (x.getAs[String]("tok"), x.getAs[Long]("score"))).toSeq == expect)
  }

  test("source_overlap: strict pair order, heaviest pair re-derived by set intersect") {
    val out = q("source_overlap").cache()
    assert(out.where(col("src_a") >= col("src_b")).count() == 0)
    assert(out.where(col("n_shared_blocks") < 1).count() == 0)
    val top = out.orderBy(col("n_shared_blocks").desc, col("src_a"), col("src_b"))
      .limit(1).collect()(0)
    def blocks(src: String) = docs.where(col("source") === src)
      .select(graft.operators.Dedup.tokenArr(col("text")).as("t"))
      .select(explode(expr(
        """transform(sequence(1, size(t), 8),
           st -> md5(array_join(slice(t, st, 8), ' ')))""")).as("h"))
      .distinct()
    val n = blocks(top.getString(0)).intersect(blocks(top.getString(1))).count()
    assert(n == top.getAs[Long]("n_shared_blocks"))
    out.unpersist()
  }

  test("text_entropy: non-negative, zero iff single-symbol, exact per-doc replay") {
    val out = q("text_entropy").cache()
    assert(out.count() == docs.count())
    assert(out.where(col("ent_micro_n") < 0).count() == 0)
    // replay one document collect-side with the same quantization
    val one = docs.orderBy("doc_id").limit(1)
      .select(col("doc_id"), lower(col("text")).as("text")).collect()(0)
    val chars = one.getString(1).filterNot(_.isWhitespace)
    val n = chars.length.toLong
    val expect = chars.groupBy(identity).values.map(_.length.toLong)
      .map(c => c * math.floor(math.log(n.toDouble / c.toDouble) * 1e6).toLong).sum
    val got = out.where(col("doc_id") === one.getLong(0)).collect()(0)
    assert(got.getAs[Long]("n_chars") == n)
    assert(got.getAs[Long]("ent_micro_n") == expect)
    // a synthetic single-symbol doc scores exactly zero under the same plan
    import spark.implicits._
    val single = Seq((1L, "aaaa aaa aa")).toDF("doc_id", "text")
    val cc = single
      .select(col("doc_id"), explode(regexp_extract_all(lower(col("text")),
        lit("\\S"), lit(0))).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    val tot = cc.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    val z = cc.join(tot, "doc_id")
      .select((col("c") * floor(log(col("n").cast("double") / col("c").cast("double")) * 1e6)
        .cast("long")).as("term"))
      .agg(sum(col("term"))).collect()(0).getLong(0)
    assert(z == 0L)
    out.unpersist()
  }

  test("ngram_novelty: gram math, permille bounds, planted-dup docs score shared") {
    val out = q("ngram_novelty").cache()
    // n_grams = tokens - 7 for every eligible doc
    val expect = docs
      .select(col("doc_id"), size(Dedup.tokenArr(col("text"))).cast("long").as("n"))
      .where(col("n") >= 8)
    assert(out.count() == expect.count())
    assert(out.join(expect, "doc_id")
      .where(col("n_grams") =!= col("n") - 7).count() == 0)
    assert(out.where(col("novelty_permille") < 0 ||
      col("novelty_permille") > 1000).count() == 0)
    assert(out.where(col("n_shared") > col("n_grams")).count() == 0)
    // identical-text doc pairs exist in the corpus (dedup_exact's
    // planted signal): any doc sharing full text with another must have
    // zero novelty
    val dup = docs.select(md5(lower(col("text"))).as("k"), col("doc_id"))
      .groupBy("k").agg(count(lit(1)).as("c"), min(col("doc_id")).as("doc_id"))
      .where(col("c") >= 2)
    if (dup.count() > 0) {
      assert(out.join(dup, "doc_id")
        .where(col("novelty_permille") =!= 0).count() == 0)
    }
    out.unpersist()
  }

  test("quality_buckets: exact ceil-rank deciles, ties share a bucket") {
    val out = q("quality_buckets").cache()
    val n = docs.count()
    assert(out.count() == n)
    assert(out.where(col("bucket") < 1 || col("bucket") > 10).count() == 0)
    // ties share a bucket ⇒ bucket is a function of score
    assert(out.select("score", "bucket").distinct().count() ==
      out.select("score").distinct().count())
    // re-derive the bucket from first principles on the collected scores
    val scores = out.select("score", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sorted = scores.map(_._1).sorted
    scores.foreach { case (s, b) =>
      val cum = sorted.count(_ <= s).toLong
      assert(b == (10 * cum + n - 1) / n, s"score $s")
    }
    out.unpersist()
  }

  test("dedup_cdc: content-defined chunks survive a shifted prefix") {
    val out = q("dedup_cdc").cache()
    val planted = out.where(col("doc_id") >= 3000000L).cache()
    assert(planted.count() > 0)
    // content-defined boundaries make most planted prefixed excerpts
    // share at least one chunk with their source (needs >= 2 boundaries
    // in the copied 24 tokens, p ~ 0.8 each) — assert the mechanism
    // fires broadly, not per-doc
    val withDup = planted.where(col("n_dup_chunks") >= 1).count()
    assert(withDup * 2 > planted.count(),
      s"only $withDup of ${planted.count()} planted docs share a chunk")
    assert(out.where(col("n_chunks") < 1).count() == 0)
    assert(out.where(col("n_dup_chunks") > col("n_chunks")).count() == 0)
    // chunk-count math re-derived for one base doc: chunks = boundary
    // tokens among all but the last position, + 1
    val one = docs.orderBy("doc_id").limit(1)
      .select(col("doc_id"), Dedup.tokenArr(lower(col("text"))).as("t"))
      .collect()(0)
    val toks = one.getSeq[String](1)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex1(s: String): Char =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.charAt(0)
    val nChunks = 1 + toks.dropRight(1).count(t => "01".contains(hex1(t)))
    val got = out.where(col("doc_id") === one.getLong(0)).collect()(0)
    assert(got.getAs[Long]("n_chunks") == nChunks)
    planted.unpersist(); out.unpersist()
  }
}
