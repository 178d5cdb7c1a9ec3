package graft

import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {

  test("ann_cosine_topk: 10 neighbours, self excluded, sims descending in [-1,1]") {
    val rows = q("ann_cosine_topk").collect()
    assert(rows.length == 10)
    assert(!rows.map(_.getLong(0)).contains(0L))
    val sims = rows.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
  }

  test("emb_cosine_pairs is symmetric-free and above threshold") {
    val rows = q("emb_cosine_pairs").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.3))
  }

  test("ann_lsh_bucketed sims agree with exact cosine for returned pairs") {
    val lsh = q("ann_lsh_bucketed")
    // recompute exact cosine for the returned (q_id, neighbor_id) pairs
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val dotExpr = (a: String, b: String) =>
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
    val joined = lsh
      .join(e.as("qa"), col("q_id") === col("qa.vec_id"))
      .join(e.as("qb"), col("neighbor_id") === col("qb.vec_id"))
      .select(col("cos_sim"),
        graft.functions.ExactNum.round4(dotExpr("qa.v", "qb.v")
          / (sqrt(dotExpr("qa.v", "qa.v")) * sqrt(dotExpr("qb.v", "qb.v"))))
          .as("exact"))
    assert(joined.filter(col("cos_sim") =!= col("exact")).count() == 0)
    // per-query at most 3 neighbours
    val perQ = lsh.groupBy("q_id").count().collect()
    assert(perQ.forall(_.getLong(1) <= 3))
  }

  test("lshBits: integer boundaries, clamp, and prefix-stable planes") {
    import operators.Similarity
    // smallest b with 2^b * 32 >= n; exact power boundaries must not
    // wobble (pure integer arithmetic — no log2 doubles)
    assert(Similarity.lshBits(1L) == Similarity.MinLshBits)
    val t = Similarity.LshTargetBucket
    for (b <- Similarity.MinLshBits until Similarity.MaxLshBits) {
      assert(Similarity.lshBits((1L << b) * t) == b, s"at 2^$b*$t")
      assert(Similarity.lshBits((1L << b) * t + 1) == b + 1, s"past 2^$b*$t")
    }
    // clamp: a corpus beyond 2^24*32 stays at MaxLshBits
    assert(Similarity.lshBits(Long.MaxValue) == Similarity.MaxLshBits)
    // prefix stability: the oracle embeds planes(MaxLshBits) and gates
    // bits on the runtime count — only sound if planes(b) is a prefix
    val all = Similarity.planes(Similarity.MaxLshBits, 64)
    val six = Similarity.planes(6, 64)
    assert(six.indices.forall(i => six(i).sameElements(all(i))))
  }

  test("adaptive bit flip: planted identical pair collides at every bit count") {
    import spark.implicits._
    graft.functions.VectorOps.register(spark)
    // recall for the planted (identical-vector) signal is invariant
    // across the adaptive cutover: buckets are deterministic functions
    // of v, so the pair collides whether the corpus count lands the
    // engine on MinLshBits or a larger count — pin both sides of a flip
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 100).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian())))
    val corpus = (vecs :+ (1000000L -> vecs.head._2)).toDF("vec_id", "v")
    for (bits <- Seq(operators.Similarity.MinLshBits, 12,
        operators.Similarity.MaxLshBits)) {
      val b = operators.Similarity.skewSafeBuckets(corpus, bits).collect()
      val cells = b.groupBy(_.getLong(0)).view
        .mapValues(_.map(r => (r.getInt(1), r.getLong(2))).toSet)
      assert(cells(0L) == cells(1000000L), s"planted pair split at $bits bits")
    }
  }

  test("dedup_embedding recovers every planted duplicate at cosine 1.0") {
    val n = Tables.load(spark, sf, "embeddings").count()
    val rows = q("dedup_embedding").collect()
    val planted = rows.filter(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(planted.length == n, s"recovered ${planted.length} of $n planted pairs")
    assert(planted.forall(_.getDouble(2) >= 0.9999))
    assert(rows.forall(_.getDouble(2) >= 0.9))
  }

  test("skewSafeBuckets splits a planted dense bucket, keeps exact dups together") {
    import spark.implicits._
    graft.functions.VectorOps.register(spark)
    // 400 diverse random 64-dim vectors + 1 planted exact duplicate.
    // With a SINGLE level-1 plane every vector lands in one of two
    // buckets — both far over the cap — forcing banded refinement.
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 400).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian())))
    val corpus = (vecs :+ (1000000L -> vecs.head._2)).toDF("vec_id", "v")
    val out = operators.Similarity
      .skewSafeBuckets(corpus, bits = 1, cap = 50L)
      .select(col("vec_id"), col("band"), col("bucket")).collect()
    // every (band, bucket) join cell is bounded far under the density
    val sizes = out.groupBy(r => (r.getInt(1), r.getLong(2))).view
      .mapValues(_.length)
    assert(sizes.values.max <= 50,
      s"dense bucket not refined: max cell ${sizes.values.max}")
    // exact duplicates collide in EVERY band — all levels are
    // deterministic functions of v
    val cells = out.groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getInt(1), r.getLong(2))).toSet)
    assert(cells(0L) == cells(1000000L))
    assert(cells(0L).size == 8, s"expected 8 banded cells, got ${cells(0L)}")
    // refined ids are disjoint from the unrefined level-1 id space
    assert(out.forall(_.getLong(2) >= (1L << 1)))
  }

  test("ann_ivf returns 3 probed-cell neighbours per query with sane recall") {
    val ivf = q("ann_ivf").collect()
    val perQ = ivf.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perQ.values.forall(_ == 3))
    assert(perQ.size == 20)
    // recall@3 vs brute force — deterministic given the fixed seeds
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val dotExpr = (a: String, b: String) =>
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
    val brute = e.as("qa").join(e.as("qb"),
        col("qa.vec_id") < 20 && col("qa.vec_id") =!= col("qb.vec_id"))
      .select(col("qa.vec_id").as("q_id"), col("qb.vec_id").as("n_id"),
        (dotExpr("qa.v", "qb.v")
          / (sqrt(dotExpr("qa.v", "qa.v")) * sqrt(dotExpr("qb.v", "qb.v"))))
          .as("sim"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("n_id"))))
      .filter(col("rk") <= 3)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet)
    val got = ivf.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet)
    val recall = got.map { case (qid, ids) =>
      ids.intersect(brute(qid)).size.toDouble / 3
    }.sum / got.size
    // Deterministic given the seeded quantizer — measured 0.8167 at
    // nprobe=3 (was 0.7667 at nprobe=2); the 0.80 bar (small margin for
    // a regenerated corpus) fails on any real probe/centroid regression.
    assert(recall >= 0.80, s"ivf recall@3 = $recall")
  }

  test("dedup_semantic flags exactly the planted same-cell copies") {
    val out = q("dedup_semantic").cache()
    // identical vectors land in the same cell deterministically, and the
    // copy carries the larger id — every planted copy must flag
    val copies = out.where(col("vec_id") >= 1000000L)
    assert(copies.count() > 0)
    assert(copies.where(!col("is_dup")).count() == 0)
    // the corpus' max non-identical cosine is far below 0.95, so no
    // original may flag (its planted twin has the LARGER id)
    assert(out.where(col("vec_id") < 1000000L && col("is_dup")).count() == 0)
    // every vector is assigned to exactly one of the 8 cells
    assert(out.select("vec_id").distinct().count() == out.count())
    assert(out.where(col("cell") < 0 || col("cell") > 7).count() == 0)
    out.unpersist()
  }
}
