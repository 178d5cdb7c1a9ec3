package graft

import org.apache.spark.sql.functions._

class DedupSpec extends SparkSuite {

  private val nDocs = Tables.load(spark, sf, "documents").count()

  test("dedup_exact collapses every planted duplicate") {
    val rows = q("dedup_exact").collect()
    assert(rows.length == nDocs)                 // one group per distinct text
    assert(rows.forall(_.getLong(2) == 2))       // each text appears twice
    assert(rows.forall(_.getLong(1) < 1000000))  // keeper is the original id
  }

  test("dedup_ngram_jaccard finds all planted pairs at jaccard 1.0") {
    val df = q("dedup_ngram_jaccard")
    val planted = df.filter(col("doc_b") === col("doc_a") + 1000000L)
    assert(planted.count() == nDocs)
    assert(planted.filter(col("jaccard") =!= 1.0).count() == 0)
  }

  test("no shingle exceeds the stop-shingle cap (oracle-equivalence precondition)") {
    import graft.operators.Dedup
    val sh = Dedup.shingles(Dedup.corpus(spark, sf))
    val maxDf = sh.groupBy("s").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxDf <= Dedup.maxShingleDf,
      s"corpus has a shingle with df=$maxDf > cap ${Dedup.maxShingleDf}; " +
        "the full-vocabulary DuckDB oracle would diverge")
  }

  test("minhash LSH recovers every planted pair") {
    val df = q("dedup_minhash_lsh")
    assert(df.filter(col("doc_b") === col("doc_a") + 1000000L).count() == nDocs)
    // verification step bounds false positives
    assert(df.filter(col("jaccard") < 0.7).count() == 0)
  }

  test("LSH output equals the exact inverted-index result (oracle precondition)") {
    import graft.operators.Dedup
    val lsh = q("dedup_minhash_lsh").select("doc_a", "doc_b", "jaccard")
    // exact all-pairs ≥0.7 via the full (uncapped) inverted index
    val sh = Dedup.shingles(Dedup.corpus(spark, sf))
    val sizes = sh.groupBy("doc_id").count().withColumnRenamed("count", "n")
    val common = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .count().withColumnRenamed("count", "c")
    val exactAll = common
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.ExactNum.round4(
          col("c") / (col("sa.n") + col("sb.n") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= 0.7)
    assert(lsh.exceptAll(exactAll).isEmpty && exactAll.exceptAll(lsh).isEmpty,
      "LSH result diverges from exact all-pairs result — drop the oracle")
  }

  test("VT precondition: Java-\\S+ spec restatements stay sound on this corpus") {
    import graft.operators.Dedup
    import spark.implicits._
    // This suite's independent restatements (the `\\S+` literals below)
    // deliberately use JAVA regex semantics, where vertical tab is
    // whitespace; the operators and the DuckDB oracle use the RE2 class
    // (TextOps.NonWsToken), where it is not. Pin the fork explicitly:
    // (1) demonstrate the divergence is exactly the VT class —
    val vt = Seq((1L, "alpha\u000Bbeta gamma")).toDF("doc_id", "text")
    val javaN = vt.select(size(regexp_extract_all(col("text"),
      lit("\\S+"), lit(0)))).collect()(0).getInt(0)
    val opN = Dedup.tokens(vt).select(size(col("t")))
      .collect()(0).getInt(0)
    assert(javaN == 3, "Java \\S no longer splits on VT — re-audit the pin")
    assert(opN == 2, "operator tokenizer split on VT — it has drifted " +
      "from the RE2 class the oracle uses")
    // (2) the restatements are only equivalent to the operators while
    // the corpus carries no VT — make a VT fixture fail HERE, loudly,
    // instead of letting a spec pass green while the oracle forks
    val vtDocs = Tables.load(spark, sf, "documents")
      .filter(col("text").contains("\u000B")).count()
    assert(vtDocs == 0,
      s"$vtDocs corpus docs now carry vertical tabs: the Java-\\S+ " +
        "restatements in this suite are no longer equivalent to the " +
        "RE2-aligned operators — restate them with TextOps.NonWsToken")
  }

  test("corpus tokens are ASCII and < 32 bytes (simhash oracle precondition)") {
    import graft.operators.Dedup
    // The DuckDB xxhash64 twin (XxHash64Sql) reads bytes as ascii(t[i])
    // and only unrolls XXH64's sub-32-byte path; a corpus with non-ASCII
    // or 32+-byte tokens must fail HERE, not silently in the oracle.
    val bad = Dedup.corpus(spark, sf)
      .select(explode(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
        .as("tok"))
      .filter(octet_length(col("tok")) =!= length(col("tok")) ||
        octet_length(col("tok")) >= 32)
    assert(bad.isEmpty, s"oracle-incompatible tokens: ${bad.take(3).toSeq}")
  }

  test("simhash recovers every planted pair at hamming 0") {
    val df = q("dedup_simhash")
    val planted = df.filter(col("doc_b") === col("doc_a") + 1000000L)
    assert(planted.count() == nDocs)
    assert(planted.filter(col("hamming") =!= 0).count() == 0)
    assert(df.filter(col("hamming") > 3).count() == 0)
  }

  test("decontaminate flags every planted eval-source doc, covers all docs") {
    val rows = q("decontaminate").collect()
    assert(rows.length == nDocs) // one verdict per training doc
    // every eval-source doc (doc_id % 10 == 0, ≥ 30 tokens) contains its
    // own planted 20-token eval window → must flag, with all 13 windows
    // only if the window's 8-grams are distinct, so assert ≥ 1
    val eligible = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 10 === 0 &&
        size(regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))) >= 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(eligible.nonEmpty, "test data lost its eval candidates")
    val flagged = rows.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(eligible.subsetOf(flagged),
      s"unflagged planted docs: ${(eligible -- flagged).take(5)}")
    // n_overlap is consistent with the flag
    assert(rows.forall(r => (r.getLong(1) > 0) == r.getBoolean(2)))
  }

  test("eval n-gram set is filter-idempotent (the r19 subset-scan shape)") {
    // The cache-independent decontaminate derives its eval side from a
    // PRE-FILTERED scan (docs.filter(doc_id % 10 == 0)) so the filter
    // applies before the tokenize, while the streaming twin's spec
    // builds the same set from the unfiltered corpus — sound only
    // because evalNgramHashes re-applies the eligibility filter
    // internally. Pin that idempotence directly so an edit to either
    // side cannot silently fork the two eval definitions.
    import graft.operators.Dedup
    val docs = Tables.load(spark, sf, "documents")
    val full = Dedup.evalNgramHashes(docs)
    val pre = Dedup.evalNgramHashes(docs.filter(col("doc_id") % 10 === 0))
    assert(full.count() > 0, "eval set empty — corpus lost its candidates")
    assert(full.exceptAll(pre).count() == 0 &&
      pre.exceptAll(full).count() == 0,
      "pre-filtered and full-corpus eval sets diverged")
  }

  test("dedup_substring catches excerpt pairs that Jaccard provably misses") {
    import graft.operators.Dedup
    val rows = q("dedup_substring").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = rows.map(r => (r._1, r._2)).toSet
    // exact-copy pairs share ALL fingerprints, so the pair must appear
    // exactly for docs with ≥ 3 distinct fingerprints (winnowing dedups
    // consecutive windows, so short docs can fall under the threshold)
    val fpCounts = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)).as("t"))
      .filter(size(col("t")) >= 11)
      .withColumn("g", expr("transform(sequence(0, size(t)-8), " +
        "i -> md5(concat_ws(' ', slice(t, i+1, 8))))"))
      .select(col("doc_id"), size(array_distinct(
        expr("transform(sequence(0, size(t)-11), " +
          "j -> array_min(slice(g, j+1, 4)))"))).as("nf"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val eligible = fpCounts.filter(_._2 >= 3).keySet
    assert(eligible.nonEmpty)
    eligible.foreach(id =>
      assert(pairs.contains((id, id + 1000000L)), s"copy pair for $id"))
    fpCounts.keySet.diff(eligible).foreach(id =>
      assert(!pairs.contains((id, id + 1000000L)),
        s"sub-threshold copy pair for $id leaked through"))
    // excerpt pairs (original, original+2M) exist — the substring catch
    val excerptPairs = rows.filter { case (a, b, _) =>
      b == a + 2000000L && a % 3 == 0 }
    assert(excerptPairs.nonEmpty, "no excerpt pair detected")
    // and at least one caught excerpt pair sits BELOW the 0.8 Jaccard
    // bar on the same corpus — the case the near-dup family cannot see
    val toks0 = Dedup.tokens(Tables.load(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text")).as("text")))
    val excerpt = toks0.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        expr("slice(t, size(t) div 4 + 1, greatest(size(t) div 2, 1))")
          .as("t"))
    val jac = Dedup.countJaccard(
        Dedup.shinglesFromTokens(toks0.unionByName(excerpt)))
      .filter(col("doc_b") === col("doc_a") + 2000000L)
      .select(col("doc_a"), col("jac")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val caught = excerptPairs.map(_._1).toSet
    assert(caught.exists(a => jac.get(a).forall(_ < 0.8)),
      "every caught excerpt pair was also Jaccard-visible")
  }

  test("dedup_delta: planted exacts match their source, all verdicts occur") {
    val docs = Tables.load(spark, sf, "documents")
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val rows = q("dedup_delta").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // one verdict per planted batch doc: %5 exact copies, %3 revisions,
    // %7 fragments
    val expected = ids.count(_ % 5 == 0) + ids.count(_ % 3 == 0) +
      ids.count(_ % 7 == 0)
    assert(rows.length == expected, s"${rows.length} != $expected")
    // every exact copy resolves to its source doc (texts are unique in
    // the raw table — dedup_exact's 2-copies invariant)
    rows.filter(_._1 < 2000000L).foreach { case (id, v, m) =>
      assert(v == "exact" && m == id - 1000000L, s"($id, $v, $m)")
    }
    // revisions/fragments: both outcomes present, matches consistent
    val near = rows.filter(_._2 == "near")
    val nw = rows.filter(_._2 == "new")
    assert(near.nonEmpty && nw.nonEmpty)
    assert(near.forall(r => r._3 >= 0 && r._1 >= 2000000L))
    assert(nw.forall(_._3 == -1L))
    // 40% fragments never clear the 0.8 bar: every %7 batch doc is new
    // unless its fragment text exactly equals some original (possible
    // only for 1-2 token docs, which cannot be near either)
    rows.filter(_._1 >= 3000000L).foreach { case (id, v, _) =>
      assert(v != "near", s"fragment $id scored near")
    }
  }

  test("vertical tab is a token character (RE2/DuckDB \\S semantics)") {
    // Java's \s includes \x0B, RE2's does not; the Spark-side
    // tokenizers spell the RE2 class out (TextOps.WsChars) so both
    // engines see "a<VT>b c" as TWO tokens — an implicit Java \S+
    // would see three and silently fork every token-derived relation
    import spark.implicits._
    val vt = "\u000b" // explicit escape: a raw VT byte in source invites mangling
    val df = Seq((1L, s"a${vt}b c")).toDF("doc_id", "text")
    val toks = df
      .select(graft.operators.Dedup.tokenArr(col("text")).as("t"))
      .head.getSeq[String](0)
    assert(toks == Seq(s"a${vt}b", "c"), toks.mkString("|"))
    assert(df.select(graft.operators.TextOps.wsTokens(col("text")))
      .head.getInt(0) == 2)
  }

  test("graft_ngram_hashes == built-in xxhash64 window chain + distinct (r21 kernel pin)") {
    // The native kernel (NgramHash.distinctWindowHashes) replaced the
    // interpreted `CASE … transform(sequence, i -> xxhash64(t[i], …))`
    // HOF + row-level `.distinct()` in shinglesFromTokens/ngramHashes.
    // Pin the value-set equivalence per (doc_id, n) against the
    // built-in chain over the real corpus, so a seed/chaining drift in
    // the kernel is a red test here, not an oracle mismatch later.
    import graft.operators.Dedup
    val toks = Dedup.tokens(Tables.load(spark, sf, "documents"))
    graft.functions.NgramHash.register(spark)
    for (n <- Seq(3, 8)) {
      val kernel = toks.select(col("doc_id"),
        explode(graft.functions.NgramHash.distinctNgramHashes(col("t"), n))
          .as("h"))
      val builtin = toks.select(col("doc_id"), explode(expr(
          s"CASE WHEN size(t) >= $n THEN transform(sequence(0, size(t)-$n), " +
            s"i -> xxhash64(${(0 until n).map(j => s"t[i+$j]").mkString(",")})) " +
            "ELSE CAST(array() AS ARRAY<BIGINT>) END")).as("h"))
        .distinct()
      assert(kernel.exceptAll(builtin).isEmpty
          && builtin.exceptAll(kernel).isEmpty,
        s"kernel n=$n diverges from the built-in chain")
    }
    // edge semantics: short arrays drop on explode (empty array), a
    // NULL array yields NULL (explode drops the row), NULL elements
    // pass the seed through unchanged — the xxhash64 null contract
    import spark.implicits._
    val edge = Seq(
      (1L, Seq("a", "b")),             // shorter than n=3 → no rows
      (2L, Seq[String](null, "x", "y")) // null element skipped in chain
    ).toDF("doc_id", "t")
    val got = edge.select(col("doc_id"),
      explode(graft.functions.NgramHash.distinctNgramHashes(col("t"), 3))
        .as("h"))
    val want = edge.select(col("doc_id"),
      explode(expr("CASE WHEN size(t) >= 3 THEN " +
        "transform(sequence(0, size(t)-3), i -> xxhash64(t[i], t[i+1], t[i+2])) " +
        "ELSE CAST(array() AS ARRAY<BIGINT>) END")).as("h")).distinct()
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.filter(col("doc_id") === 1L).count() == 0)
  }
}
