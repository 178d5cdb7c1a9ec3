package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted-join contract: identical results to the plain join under
  * extreme skew, and the salt actually spreads the hot key.
  */
class SkewSpec extends SparkSuite {

  // worst-case skew: 90% of lineitem probes hit ONE supplier key
  private def skewed = {
    val li = Tables.load(spark, sf, "lineitem")
    li.select(
      when(col("l_linenumber") > 1, lit(7L)).otherwise(col("l_suppkey"))
        .as("l_suppkey"),
      col("l_extendedprice"))
  }
  private def sup = Tables.load(spark, sf, "supplier")
    .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))

  test("salted join equals the plain join under a hot key") {
    val saltedRes = Skew.saltedJoin(skewed, sup, "l_suppkey", 8)
    val plainRes = skewed.join(sup, Seq("l_suppkey"))
    assert(saltedRes.count() == plainRes.count())
    assert(saltedRes.exceptAll(plainRes).count() == 0)
    assert(plainRes.exceptAll(saltedRes).count() == 0)
  }

  test("the hot key's rows spread across every salt value") {
    // observe the OPERATOR's salt assignment (saltProbe is what saltedJoin
    // joins on), so a constant-salt regression in the operator fails here
    val perSalt = Skew.saltProbe(skewed.filter(col("l_suppkey") === 7L), 8)
      .groupBy("__salt").count().collect()
    assert(perSalt.length == 8, s"expected 8 salts, got ${perSalt.length}")
    val counts = perSalt.map(_.getLong(1))
    // round-robin within partitions → near-uniform spread
    assert(counts.max < counts.sum / 2,
      s"salting failed to spread the hot key: ${counts.mkString(",")}")
  }

  test("a >maxShingleDf identical mega-cluster honors each dedup family's contract") {
    // SCALE.md "Mega-cluster posture" as an executable contract (r11
    // verdict item 3) — the boilerplate-crawl worst case: one cluster
    // of identical documents LARGER than the stop-shingle df cap. The
    // r11 ad-hoc probe established the per-family split; this case
    // makes a future cap/banding edit that silently un-bounds a bucket
    // fail the suite instead of shipping. 150 identical docs; the
    // planted-duplicate corpus doubles them to n = 300 > maxShingleDf
    // = 256, so EVERY shingle/fingerprint is a stop-shingle.
    val nDocs = 150
    val n = 2 * nDocs
    assert(n > graft.operators.Dedup.maxShingleDf,
      "fixture must exceed the df cap or the case tests nothing")
    // 45 distinct tokens: enough for real shingle (>=3), 8-gram (>=11),
    // and packing (>=40 tokens) relations in every family
    val text = (1 to 45).map(i => s"boiler$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-mega").toString
    try {
      import spark.implicits._
      (0L until nDocs.toLong)
        .map(i => (i, text, "en", "crawl", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(4)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      def run(name: String) = SparkEntry.queries(name)(spark, dir)

      // exact dedup collapses the cluster to ONE digest group — linear
      // at any cluster size, which is why exact-collapse-first is the
      // documented recipe ahead of pair-emitting families
      val exact = run("dedup_exact").collect()
      assert(exact.length == 1, s"expected one group, got ${exact.length}")
      assert(exact(0).getAs[Long]("keep_id") == 0L)
      assert(exact(0).getAs[Long]("n_copies") == n.toLong)

      // df-capped families drop the cluster's shingles as stop-shingles
      // and emit ZERO pairs for it — the documented trade that bounds
      // every inverted-index bucket at the cap
      assert(run("dedup_ngram_jaccard").count() == 0L,
        "df cap must suppress the mega-cluster from the Jaccard index")
      assert(run("dedup_substring").count() == 0L,
        "df cap must suppress the mega-cluster from the fingerprint index")

      // pair-EMITTING families return exactly C(n,2) — semantically
      // exact and therefore output-quadratic in cluster size; the spec
      // pins that the count is the EXACT answer, not a blown-up or
      // silently-truncated one
      val pairs = n.toLong * (n - 1) / 2
      val mh = run("dedup_minhash_lsh")
      assert(mh.count() == pairs, s"minhash pairs != C($n,2)")
      assert(mh.agg(min(col("jaccard"))).head.getDouble(0) == 1.0)
      val sim = run("dedup_simhash")
      assert(sim.count() == pairs, s"simhash pairs != C($n,2)")
      assert(sim.agg(max(col("hamming")).cast("long")).head.getLong(0) == 0L)

      // component clustering completes without edge blowup: the capped
      // index only keeps the tail shingles unique to the 150 full docs
      // (df = 150 <= cap), so the edge relation is bounded by the cap,
      // the full docs collapse to keeper 0, and every prefix copy is a
      // singleton (its shingles were all stop-shingles)
      val comp = run("dedup_components").collect()
      assert(comp.length == 3 * nDocs, s"vertices: ${comp.length}")
      assert(comp.count(_.getAs[Long]("component") == 0L) == nDocs)
      assert(comp.map(_.getAs[Long]("component")).distinct.length ==
        2 * nDocs + 1)

      // the capstone build survives end to end: one keeper is a
      // cataloged document, so exactly one packed row comes out
      assert(run("pipeline_corpus").count() == 1L)
    } finally {
      spark.catalog.clearCache() // the dedup queries persist staging
      GraftSession.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("a >maxBucketSize identical-vector mega-cluster rides the dense-bucket path") {
    // The embedding-side twin of the document mega-cluster case: 600
    // identical vectors, doubled by dedup_embedding's planted corpus to
    // 1200 > maxBucketSize = 1024, so the level-1 sign-LSH bucket is
    // DENSE and skewSafeBuckets must swap in the banded refinement.
    // Identical vectors collide in every band by construction, so the
    // contract is the same split as the text side: the pair-emitting
    // answer is exactly C(1200,2) at cosine 1.0 (output-quadratic in
    // the ANSWER — the exact-collapse-first recipe applies here too),
    // and the refinement's job is bounding NEAR-dup dense buckets, not
    // shrinking an identical cluster no hash can split.
    val nVecs = 600
    val n = 2 * nVecs
    assert(n > graft.operators.Similarity.maxBucketSize,
      "fixture must exceed the bucket cap or the dense path never runs")
    val dim = 64
    val vec = (0 until dim).map(i => ((i * 37) % 13 - 6) / 6.0f)
    val dir = java.nio.file.Files.createTempDirectory("graft-vmega").toString
    try {
      import spark.implicits._
      (0L until nVecs.toLong).map(i => (i, vec, (i % 4).toInt))
        .toDF("vec_id", "embedding", "label")
        .repartition(4)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out = SparkEntry.queries("dedup_embedding")(spark, dir)
        .persist()
      val pairs = n.toLong * (n - 1) / 2
      assert(out.count() == pairs, s"embedding pairs != C($n,2)")
      assert(out.agg(min(col("cos_sim"))).head.getDouble(0) == 1.0)
      out.unpersist(blocking = false)
      // structural: the dense level-1 bucket really took the banded
      // refinement (band >= 0), not the under-cap pass-through (band -1)
      val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
      val bands = graft.operators.Similarity
        .skewSafeBuckets(corpus.unionByName(corpus
          .select((col("vec_id") + 1000000L).as("vec_id"), col("v"))), 16)
        .select(col("band")).distinct().collect().map(_.getInt(0)).sorted
      assert(bands.headOption.contains(0) && bands.length == 8,
        s"dense bucket did not refine into the 8 bands: ${bands.mkString(",")}")
      // the ANN surfaces must complete on the degenerate geometry (one
      // cell / one bucket holding the whole corpus)
      assert(SparkEntry.queries("ann_lsh_bucketed")(spark, dir).count() > 0)
      assert(SparkEntry.queries("dedup_semantic")(spark, dir).count() > 0)
    } finally {
      spark.catalog.clearCache()
      GraftSession.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("the physical join is keyed on (key, salt)") {
    // formatted mode renders "Left keys [2]: [l_suppkey, __salt]" — assert
    // the salt reaches the JOIN KEYS, not merely a projection somewhere
    val plan = graft.operators.Meta.explainFormatted(
      Skew.saltedJoin(skewed, sup, "l_suppkey", 8))
    assert(plan.linesIterator.exists(l =>
        l.contains("keys") && l.contains("__salt")),
      s"salt missing from the join keys:\n$plan")
  }
}
