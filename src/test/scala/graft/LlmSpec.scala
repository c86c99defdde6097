package graft

import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** graft.llm — dedup / similarity / text-analysis / multimodal operators. */
class LlmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat and looked at the dog"),
    (2L, "the cat sat on the mat and looked at the dog"), // exact dup of 1
    (3L, "the cat sat on the mat and looked at the fox"), // near dup of 1
    (4L, "der hund und das pferd liefen durch der wald und das feld"),
    (5L, "completely unrelated text about spark query engines and parquet")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, survivor = min id") {
    val d = Dedup.exact(docs).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(d.length == 4)
    val dup = d.filter(_._3 == 2L)
    assert(dup.length == 1 && dup.head._2 == 1L)
    val surv = Dedup.survivors(docs).select("doc_id").as[Long].collect().sorted
    assert(surv.sameElements(Array(1L, 3L, 4L, 5L)))
  }

  test("minhash+LSH surfaces the exact and near dup, not unrelated docs") {
    val sigs = Dedup.minhashSignatures(docs, shingle = 8, numHashes = 4)
    assert(sigs.columns.toSet == Set("doc_id", "mh0", "mh1", "mh2", "mh3"))
    // identical docs → identical signatures
    val s = sigs.orderBy("doc_id").collect()
    assert(s(0).toSeq.drop(1) == s(1).toSeq.drop(1))
    val pairs = Dedup.lshCandidatePairs(sigs, bands = 2, rowsPerBand = 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("jaccard on candidates: exact dup has full overlap") {
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val j = Dedup.jaccardOnCandidates(docs, pairs).orderBy("doc_a", "doc_b").collect()
    val full = j(0)
    assert(full.getLong(2) == full.getLong(3) && full.getLong(3) == full.getLong(4))
    val near = j(1) // differs by one token (dog→fox): overlap = size - 1
    assert(near.getLong(2) == near.getLong(3) - 1)
    val nj = Dedup.ngramJaccardOnCandidates(docs, pairs, n = 8)
      .orderBy("doc_a", "doc_b").collect()
    assert(nj(0).getLong(2) == nj(0).getLong(3)) // identical text: full 8-gram overlap
  }

  test("simhash: identical docs equal, near dups closer than unrelated") {
    val sh = Dedup.simhash(docs, bits = 16).orderBy("doc_id").as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(3L)) <= hamming(sh(1L), sh(5L)))
  }

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.9f, 0.1f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("ivf cell stats: exact rank picks per cell, roles collide on small cells") {
    val centroids = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f))).toDF("centroid_id", "centroid")
    val assigned = Similarity.assignCells(vecs, centroids, metric = "l2")
    val got = Similarity.ivfCellStats(assigned, centroids)
      .orderBy("cell", "role", "vec_id")
      .select("cell", "role", "vec_id", "n").as[(Long, String, Long, Long)].collect()
    // cell 1 = {0, 1} (n=2: median rank (2+1)/2 = 1 collides with nearest);
    // cell 2 = {2, 3, 4} — vec 4 (-x) is L2-closer to the y centroid
    assert(got.toSeq == Seq(
      (1L, "farthest", 1L, 2L), (1L, "median", 0L, 2L), (1L, "nearest", 0L, 2L),
      (2L, "farthest", 4L, 3L), (2L, "median", 3L, 3L), (2L, "nearest", 2L, 3L)))
    // distances are the exact fold: nearest member of each cell IS its
    // centroid vector here, at distance 0.0
    val d0 = Similarity.ivfCellStats(assigned, centroids)
      .where($"role" === "nearest").select("dist").as[Double].collect()
    assert(d0.forall(_ == 0.0))
  }

  test("truncated recall: prefix ranking overlap vs independent computation") {
    val rnd = new scala.util.Random(11)
    val data = (0L until 40L).map(i => (i, Array.fill(12)(rnd.nextFloat() * 2 - 1)))
    val emb = data.toDF("vec_id", "embedding")
    val got = Similarity.truncatedRecall(emb, dims = Seq(3, 6, 12), queryVecId = 5L, k = 4)
      .orderBy("dim").as[(Int, Long, Long)].collect()
    // independent recomputation: top-k by cosine on each prefix
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
      d / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val q = data.find(_._1 == 5L).get._2
    def topk(d: Int): Set[Long] = data.filter(_._1 != 5L)
      .map { case (id, v) => (id, cos(v.take(d), q.take(d))) }
      .sortBy { case (id, s) => (-s, id) }.take(4).map(_._1).toSet
    val full = topk(12)
    val expected = Seq(3, 6, 12).map(d => (d, (topk(d) & full).size.toLong, 4L))
    assert(got.toSeq == expected)
    assert(got.last._2 == 4L) // full width recalls everything by definition
    // a width wider than the stored embedding must fail loudly — slice()
    // would silently clamp and emit a trivially-perfect hits=k row for a
    // truncation that was never evaluated
    val wide = intercept[Exception] {
      Similarity.truncatedRecall(emb, dims = Seq(24), queryVecId = 5L, k = 4).collect()
    }
    assert(wide.getMessage.contains("exceeds the stored embedding"), wide.getMessage)
  }

  test("quantizeInt8: hand-checked codes, constant dim, endpoints, recomputation, plan shape") {
    // dims: (0..1), (10..20), (7..7 constant) — hand-check the middle rows
    val emb = Seq(
      (1L, Array(0.0f, 10.0f, 7.0f)),
      (2L, Array(1.0f, 20.0f, 7.0f)),
      (3L, Array(0.5f, 15.0f, 7.0f))).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(emb).orderBy("vec_id")
      .as[(Long, Array[Int])].collect()
    // endpoints land exactly on 0/255; 0.5 → floor(127.5 + 0.5) = 128;
    // a constant dimension quantizes to 0 instead of dividing by zero
    assert(got(0)._2.toSeq == Seq(0, 0, 0))
    assert(got(1)._2.toSeq == Seq(255, 255, 0))
    assert(got(2)._2.toSeq == Seq(128, 128, 0)) // midpoints: floor(127.5 + 0.5)
    // independent recomputation over a random frame: same definition in
    // plain scala doubles must reproduce every code
    val rnd = new scala.util.Random(23)
    val data = (0L until 30L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 4 - 2)))
    val df = data.toDF("vec_id", "embedding")
    val codes = Similarity.quantizeInt8(df).orderBy("vec_id")
      .as[(Long, Array[Int])].collect()
    val mn = (0 until 8).map(j => data.map(_._2(j).toDouble).min)
    val mx = (0 until 8).map(j => data.map(_._2(j).toDouble).max)
    data.zip(codes).foreach { case ((id, v), (cid, q)) =>
      assert(id == cid)
      (0 until 8).foreach { j =>
        val want =
          if (mx(j) == mn(j)) 0
          else math.min(255.0, math.max(0.0,
            math.floor((v(j).toDouble - mn(j)) / ((mx(j) - mn(j)) / 255.0) + 0.5))).toInt
        assert(q(j) == want, s"vec $id dim $j: got ${q(j)} want $want")
      }
    }
    // plan: the calibration side reaches the corpus via BROADCAST (never a
    // shuffled join), and no python/udf eval anywhere
    val plan = Similarity.quantizeInt8(df).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BatchEvalPython"), plan)
  }

  test("quantizedTopK: centered integer ranking matches recomputation, tracks float dot, heap-based top-k plan") {
    val rnd = new scala.util.Random(31)
    val data = (0L until 40L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = data.toDF("vec_id", "embedding")
    val got = Similarity.quantizedTopK(df, queryVecId = 5L, k = 6)
      .as[(Long, Long)].collect()
    // recompute: quantize + zero-point-center with the same double
    // definition, exact int dots
    val mn = (0 until 8).map(j => data.map(_._2(j).toDouble).min)
    val mx = (0 until 8).map(j => data.map(_._2(j).toDouble).max)
    def code(x: Double, j: Int): Long =
      if (mx(j) == mn(j)) 0L
      else math.min(255.0, math.max(0.0,
        math.floor((x - mn(j)) / ((mx(j) - mn(j)) / 255.0) + 0.5))).toLong
    def qz(v: Array[Float]): Array[Long] =
      Array.tabulate(8)(j => code(v(j).toDouble, j) - code(0.0, j))
    val qq = qz(data.find(_._1 == 5L).get._2)
    val want = data.filter(_._1 != 5L)
      .map { case (id, v) => (id, qz(v).zip(qq).map { case (a, b) => a * b }.sum) }
      .sortBy { case (id, s) => (-s, id) }.take(6)
    assert(got.toSeq == want.toSeq)
    // the centered integer ranking must TRACK the float-dot ranking (the
    // point of the zero-point: raw unsigned codes score Σa+Σb, not a·b,
    // and recall craters to ~random)
    val q = data.find(_._1 == 5L).get._2
    val floatTop = data.filter(_._1 != 5L)
      .map { case (id, v) => (id, v.zip(q).map { case (a, b) => a.toDouble * b }.sum) }
      .sortBy { case (id, s) => (-s, id) }.take(6).map(_._1).toSet
    assert(got.map(_._1).toSet.intersect(floatTop).size >= 5,
      s"int8 ranking diverged from float dot: ${got.map(_._1).toSet} vs $floatTop")
    // global top-k runs as per-partition heaps, the query side broadcasts,
    // and nothing shuffles the code vectors
    val plan = Similarity.quantizedTopK(df, 5L, 6).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("brute-force cosine top-k ranks by similarity") {
    val top = Similarity.bruteForceTopK(vecs, queryVecId = 0L, k = 2)
      .select("vec_id").as[Long].collect()
    assert(top.head == 1L)
  }

  test("k-NN join: every query gets its top-k in one pass, triples-only shuffle") {
    import spark.implicits._
    val top = Similarity.knnJoin(vecs.where(col("vec_id").isin(0L, 2L)), vecs, k = 2)
    val rows = top.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // query 0 = (1,0,0): nearest 1 (0.9,0.1,0), then the orthogonal 2/3
    // tie → lowest vec_id 2; query 2 = (0,1,0): nearest 3, then 1
    assert(rows == Set((0L, 1L, 1), (0L, 2L, 2), (2L, 3L, 1), (2L, 1L, 2)))
    // exactly ONE hash exchange (the per-query top-k window) in the final
    // AQE plan (the plan string echoes the initial plan too — slice it
    // off), it moves only (query_id, vec_id, cos_sim) triples — never the
    // payload — and Spark's rank pushdown caps it at k rows per query per
    // input partition (partial WindowGroupLimit BELOW the exchange)
    val plan = top.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning[^\\n]*".r.findAllIn(plan).toList
    assert(exchanges.length == 1, plan)
    assert(exchanges.head.contains("query_id") && !exchanges.head.contains("embedding"),
      exchanges.head)
    assert("WindowGroupLimit[^\\n]*Partial".r.findFirstIn(plan).exists(_ => true) &&
      "WindowGroupLimit[^\\n]*Partial".r.findFirstMatchIn(plan).get.start >
        plan.indexOf("Exchange hashpartitioning"), plan)
  }

  test("batch operators agree with their single-query counterparts") {
    import spark.implicits._
    // knnJoin row-for-row equals bruteForceTopK for every query
    for (q <- Seq(0L, 2L, 4L)) {
      val brute = Similarity.bruteForceTopK(vecs, q, k = 2)
        .select("vec_id").as[Long].collect().toSeq
      val joined = Similarity.knnJoin(vecs.where(col("vec_id") === q), vecs, k = 2)
        .orderBy("rank").select("vec_id").as[Long].collect().toSeq
      assert(joined == brute, s"query $q")
    }
  }

  test("IVF probes only the query cell and finds the neighbor") {
    val centroids = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("centroid_id", "centroid")
    val assigned = Similarity.assignCells(vecs, centroids)
    val cells = assigned.select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(cells(1L) == 0L && cells(2L) == 1L && cells(3L) == 1L)
    val top = Similarity.ivfTopK(assigned, centroids, queryVecId = 0L, k = 3, nprobe = 1)
      .select("vec_id").as[Long].collect()
    assert(top.contains(1L) && !top.contains(2L)) // cell 1 not probed
  }

  test("cell-count memo: path re-reads hit, retrain-in-place invalidates") {
    val dir = java.nio.file.Files.createTempDirectory("ncells").toString
    Seq((0L, Array(1.0f)), (1L, Array(0.0f)))
      .toDF("centroid_id", "centroid").write.mode("overwrite").parquet(dir)
    Similarity.invalidateCellCounts() // isolate from other tests' entries
    // hold the FIRST frame for the whole test: the memo is weak-keyed on
    // its canonicalized plan, so without a strong reference a GC between
    // the two lookups evicts the entry and the staleness assertion flakes
    val first = spark.read.parquet(dir)
    assert(Similarity.nCellsOf(first) == 2)
    // retrain IN PLACE behind the same path: a separate spark.read mints
    // fresh ExprIds but canonicalization collapses them to the same key,
    // so the memo serves the stale 2 until the documented hook runs
    Seq((0L, Array(1.0f)), (1L, Array(0.0f)), (2L, Array(0.5f)))
      .toDF("centroid_id", "centroid").write.mode("overwrite").parquet(dir)
    assert(Similarity.nCellsOf(spark.read.parquet(dir)) == 2)
    Similarity.invalidateCellCounts()
    assert(Similarity.nCellsOf(spark.read.parquet(dir)) == 3)
    assert(first.columns.nonEmpty) // keep `first` reachable to the end
  }

  test("L2 IVF: euclidean assignment and probe rank by distance") {
    import spark.implicits._
    val centroids = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("centroid_id", "centroid")
    val assigned = Similarity.assignCells(vecs, centroids, metric = "l2")
    val cells = assigned.select("vec_id", "cell").as[(Long, Long)].collect().toMap
    // d²(v0,c1)=0, d²(v1,c1)=0.02 → cell 1; v2/v3 mirror to cell 2;
    // v4=(−1,0,0): d²=4 vs 2 → cell 2
    assert(cells(0L) == 1L && cells(1L) == 1L && cells(2L) == 2L &&
      cells(3L) == 2L && cells(4L) == 2L)
    val top = Similarity.ivfTopK(assigned, centroids, queryVecId = 0L,
      k = 2, nprobe = 1, metric = "l2")
      .collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L))
    assert(top.head.getDouble(2) > 0.0) // l2_dist column, ascending
  }

  test("cell and bucket assignment are map-only: no hash shuffle in the plan") {
    val centroids = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("centroid_id", "centroid")
    val aPlan = Similarity.assignCells(vecs, centroids)
      .queryExecution.executedPlan.toString
    // the only allowed exchange is the O(k)-row SinglePartition collect
    // that builds the broadcast centroid row — the embedding payload must
    // never hash-shuffle (VERDICT r4 "What's wrong" #1)
    assert(!aPlan.contains("Exchange hashpartitioning"), aPlan)
    val planes = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("plane_id", "plane")
    val bPlan = Similarity.hyperplaneBucket(vecs, planes)
      .queryExecution.executedPlan.toString
    assert(!bPlan.contains("Exchange hashpartitioning"), bPlan)
  }

  test("embedding near-dup pairs via hyperplane buckets") {
    val planes = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("plane_id", "plane")
    val nd = Dedup.embeddingNearDups(vecs, planes, threshold = 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(nd.contains((0L, 1L)) && nd.contains((2L, 3L)))
    assert(!nd.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("semdedup: within-cell pairs only, one survivor per group, least-centroid-similar kept") {
    // two coarse cells: centroid 1 = x-axis, centroid 2 = y-axis; vec 4
    // (-x) lands in cell 2 (cos 0 beats cos -1) but pairs with nobody
    val centroids = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("centroid_id", "centroid")
    val assigned = Similarity.assignCells(vecs, centroids)
    val pairs = Dedup.semanticPairs(assigned, threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // same-cell near-dups only: (0,1) in cell 1, (2,3) in cell 2; vec 4
    // shares cell 2 but its cosine to 2/3 is 0 — below threshold
    assert(pairs == Set((0L, 1L), (2L, 3L)))
    val decision = Dedup.semDeDup(assigned, centroids, threshold = 0.9)
      .select("vec_id", "cluster_id", "keep")
      .as[(Long, Long, Int)].collect()
      .map { case (v, c, k) => v -> (c, k) }.toMap
    // groups: {0,1} labeled 0, {2,3} labeled 2, singleton 4
    assert(decision(0L)._1 == 0L && decision(1L)._1 == 0L)
    assert(decision(2L)._1 == 2L && decision(3L)._1 == 2L)
    assert(decision(4L) == (4L, 1)) // singleton always survives
    // keep = least similar to own centroid: 1 (0.9938) beats 0 (1.0);
    // 3 beats 2 the same way — the paper's prune-the-cluster-core rule
    assert(decision(0L)._2 == 0 && decision(1L)._2 == 1)
    assert(decision(2L)._2 == 0 && decision(3L)._2 == 1)
    // exactly one survivor per group
    val perGroup = Dedup.semDeDup(assigned, centroids, threshold = 0.9)
      .groupBy("cluster_id").agg(sum("keep").as("kept"))
      .select("kept").as[Long].collect()
    assert(perGroup.forall(_ == 1L))
    // the centroid-similarity pass is a broadcast shape and the pair join is
    // an equi-join on cell: no cartesian product anywhere
    val plan = Dedup.semDeDup(assigned, centroids, threshold = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("semantic decontamination: argmax over eval set, flag at threshold, map-only") {
    // eval = {0 (x-axis), 2 (y-axis)}; corpus = {1, 3, 4}
    val eval = vecs.where($"vec_id".isin(0L, 2L))
    val corpus = vecs.where(!$"vec_id".isin(0L, 2L))
    val got = Dedup.semanticContamination(corpus, eval, threshold = 0.9)
      .orderBy("vec_id").as[(Long, Double, Long, Int)].collect()
    // 1 ≈ x-axis → nearest eval 0, contaminated; 3 ≈ y-axis → nearest 2,
    // contaminated; 4 = -x → best is cos 0 vs eval 2 (beats -1 vs eval 0)
    assert(got.map(r => (r._1, r._3, r._4)).toSeq ==
      Seq((1L, 0L, 1), (3L, 2L, 1), (4L, 2L, 0)))
    assert(got(0)._2 > 0.99 && got(2)._2.abs < 1e-12)
    // map-only: no hash exchange anywhere (one broadcast of the eval row)
    val plan = Dedup.semanticContamination(corpus, eval, 0.9)
      .queryExecution.executedPlan.toString
    assert(!"Exchange hashpartitioning".r.findFirstIn(plan).isDefined, plan)
  }

  test("blocklist filter: occurrence and distinct counts, keep = zero hits, pure map") {
    val got = TextAnalysis.blocklistFilter(docs, Seq("dog", "fox"))
      .orderBy("doc_id").as[(Long, Long, Long, Int)].collect()
    // doc 1/2 end in "dog" (1 hit), doc 3 in "fox"; doc 4/5 are clean
    assert(got.toSeq == Seq(
      (1L, 1L, 1L, 0), (2L, 1L, 1L, 0), (3L, 1L, 1L, 0),
      (4L, 0L, 0L, 1), (5L, 0L, 0L, 1)))
    // occurrences vs distinct: repeated hit counts once in n_distinct_hits
    val rep = TextAnalysis.blocklistFilter(
      Seq((9L, "bad bad worse")).toDF("doc_id", "text"), Seq("bad", "worse"))
      .as[(Long, Long, Long, Int)].collect().head
    assert(rep == ((9L, 3L, 2L, 0)))
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistFilter(docs, Seq.empty)
    }
    // pure map: no exchange of any kind
    val plan = TextAnalysis.blocklistFilter(docs, Seq("dog"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("mmr select: near-dup demoted below diverse candidate, first pick pure relevance") {
    import graft.llm.Similarity
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    // query points at (1,0); candidate 1 is most relevant; candidate 2 is
    // its near-duplicate; candidate 3 is equally relevant as 2 but on the
    // OTHER side of the query — diversity should promote 3 over 2
    val emb = Seq(
      (0L, v(1.0, 0.0)),
      (1L, v(0.91, 0.415)),
      (2L, v(0.9, 0.436)),
      (3L, v(0.9, -0.436))
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(emb, queryVecId = 0L, n = 3, k = 3)
      .select("rank", "vec_id").as[(Int, Long)].collect()
    assert(got.toSeq == Seq((1, 1L), (2, 3L), (3, 2L)))
    // pure-relevance order for contrast: 1, 2, 3 — MMR reordered the tail
    val rel = Similarity.bruteForceTopK(emb, 0L, 3)
      .select("vec_id").as[Long].collect()
    assert(rel.toSeq == Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      Similarity.mmrSelect(emb, 0L, n = 2, k = 5)
    }
    // a 1-candidate shortlist has no pairwise rows at all — the selection
    // must still work (null sims map reads as similarity 0)
    val one = Similarity.mmrSelect(emb.where(col("vec_id").isin(0L, 1L)),
        queryVecId = 0L, n = 1, k = 1)
      .select("vec_id").as[Long].collect()
    assert(one.toSeq == Seq(1L))
    // k exceeding the shortlist ACTUALLY retrieved (n permits it, the
    // corpus doesn't) fails loudly instead of returning a short result
    val short = intercept[Exception] {
      Similarity.mmrSelect(emb, queryVecId = 0L, n = 20, k = 5).collect()
    }
    assert(short.getMessage.contains("exhausted"), short.getMessage)
  }

  test("batch mmr: per-query folds match the single-query selection, one job, fail-loud") {
    import graft.llm.Similarity
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    // two queries with DIFFERENT shortlists sharing candidate ids — the
    // per-query fold must select independently per query
    val shortlists = Seq(
      (100L, 1L, v(0.91, 0.415), 0.95),
      (100L, 2L, v(0.9, 0.436), 0.90),
      (100L, 3L, v(0.9, -0.436), 0.90),
      (200L, 2L, v(0.9, 0.436), 0.99),
      (200L, 3L, v(0.9, -0.436), 0.10)
    ).toDF("query_id", "vec_id", "embedding", "rel")
    val got = Similarity.mmrSelectPerQuery(shortlists, k = 2)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect()
    // query 100: pick 1 (top rel), then 3 (2 is 1's near-duplicate);
    // query 200: pick 2, then 3 (only candidates)
    assert(got.toSeq == Seq((100L, 1, 1L), (100L, 2, 3L), (200L, 1, 2L), (200L, 2, 3L)))
    // each query's selection equals running the single-query stage on its
    // own shortlist — the batch form is a pure generalization
    Seq(100L, 200L).foreach { qid =>
      val single = Similarity.mmrSelectFromShortlist(
          shortlists.where(col("query_id") === qid)
            .select("vec_id", "embedding", "rel"), k = 2)
        .select("rank", "vec_id").as[(Int, Long)].collect()
      assert(got.filter(_._1 == qid).map(t => (t._2, t._3)).toSeq == single.toSeq, s"q$qid")
    }
    // one query exhausting its shortlist fails the batch loudly — never a
    // silently short result for that query
    val bad = intercept[Exception] {
      Similarity.mmrSelectPerQuery(shortlists, k = 3).collect()
    }
    assert(bad.getMessage.contains("exhausted"), bad.getMessage)
    // shape: broadcast equi-joins only — no cartesian anywhere
    val plan = Similarity.mmrSelectPerQuery(shortlists, k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("hll sketch: register merge == union sketch, estimate near exact, bounded registers") {
    import graft.llm.Sketches
    import org.apache.spark.sql.functions.{col, lit}
    val a = (1 to 1200).map(i => ("k", s"tok$i")).toDF("g", "v")
    val b = (800 to 2000).map(i => ("k", s"tok$i")).toDF("g", "v")
    val union = a.unionByName(b)
    // HLL's defining property: bucket-wise max of two sketches IS the
    // sketch of the concatenated input — exactly, row for row
    val merged = Sketches.hllMerge(
        Sketches.hllRegisters(a, Seq("g"), "v"),
        Sketches.hllRegisters(b, Seq("g"), "v"), Seq("g"))
      .orderBy("bucket").collect().map(r => (r.getInt(1), r.getInt(2)))
    val direct = Sketches.hllRegisters(union, Seq("g"), "v")
      .orderBy("bucket").collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(merged.toSeq == direct.toSeq)
    assert(direct.length <= 256) // register bound holds whatever the input
    // raw-estimate accuracy: 2000 true distinct, m=256 ⇒ σ ≈ 1.04/√m ≈ 6.5%
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(union, Seq("g"), "v"), Seq("g"))
      .select(col("hll_est")).as[Double].collect().head
    assert(math.abs(est - 2000.0) / 2000.0 < 0.2, s"estimate $est vs 2000")
    // small-range regime (n << m): the raw estimator is biased high, and
    // the driver-side linear-counting correction recovers the count
    val small = (1 to 30).map(i => ("k", s"tok$i")).toDF("g", "v")
    val sm = Sketches.hllEstimate(Sketches.hllRegisters(small, Seq("g"), "v"), Seq("g"))
      .select(col("hll_est"), col("buckets_hit")).collect().head
    val corrected = Sketches.correctedEstimate(sm.getDouble(0), sm.getLong(1), p = 8)
    assert(math.abs(corrected - 30.0) / 30.0 < 0.15, s"corrected $corrected vs 30")
    // p must stay on hex-digit boundaries
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(a, Seq("g"), "v", p = 5)
    }
    // scale shape: the register build is ONE hash exchange on (key, bucket)
    // with a map-side partial max before it
    val plan = Sketches.hllRegisters(a, Seq("g"), "v")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("partial_max"), plan)
    // p-mismatch guard: registers built at p=8 (buckets up to 255) fed to
    // a p=4 estimate (m=16) must fail loudly, not return garbage
    val wrong = intercept[Exception] {
      Sketches.hllEstimate(Sketches.hllRegisters(a, Seq("g"), "v", p = 8),
        Seq("g"), p = 4).collect()
    }
    assert(wrong.getMessage.contains("different p"), wrong.getMessage)
    // the formerly-UNDETECTABLE direction: registers built at a SMALLER p
    // look like a sparse sketch to the bucket bound, but the carried sk_p
    // parameter column exposes them
    val wrongSmall = intercept[Exception] {
      Sketches.hllEstimate(Sketches.hllRegisters(a, Seq("g"), "v", p = 4),
        Seq("g"), p = 8).collect()
    }
    assert(wrongSmall.getMessage.contains("different p"), wrongSmall.getMessage)
    // mixed-p register frames fail loudly at merge on any colliding bucket
    // (p=4's 16 buckets are all hit by 1000 values, so collision with the
    // p=8 frame is certain)
    val wrongMerge = intercept[Exception] {
      Sketches.hllMerge(
        Sketches.hllRegisters(a, Seq("g"), "v", p = 4),
        Sketches.hllRegisters(b, Seq("g"), "v", p = 8), Seq("g")).collect()
    }
    assert(wrongMerge.getMessage.contains("different p"), wrongMerge.getMessage)
  }

  test("asof join: inclusive ties, nulls before first right row, one shuffle no join") {
    import graft.streaming.EventStreams
    import org.apache.spark.sql.functions.col
    val left = Seq((1L, 10L, 5L), (2L, 10L, 20L), (3L, 10L, 30L), (4L, 99L, 50L))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 20L, 2.0), (10L, 25L, 3.0))
      .toDF("user_id", "ts", "v")
    val got = EventStreams.asofJoin(left, right, Seq("user_id"), "ts", Seq("v"))
      .orderBy("event_id").as[(Long, Long, Long, Option[Double])].collect()
    assert(got.toSeq == Seq(
      (1L, 10L, 5L, None),        // before any right row
      (2L, 10L, 20L, Some(2.0)),  // equal ts matches (inclusive)
      (3L, 10L, 30L, Some(3.0)),  // latest preceding wins
      (4L, 99L, 50L, None)))      // key with no right rows at all
    intercept[IllegalArgumentException] {
      EventStreams.asofJoin(left, right, Seq("user_id"), "ts", Seq.empty)
    }
    // a NULL right timestamp can never satisfy ts >= right.ts — it must
    // not fill anything (it would otherwise sort first and pollute fills)
    val nullTs = Seq((Some(10L), Option.empty[Long], Some(9.0)))
      .toDF("user_id", "ts", "v")
    val gotNull = EventStreams.asofJoin(left, nullTs, Seq("user_id"), "ts", Seq("v"))
      .orderBy("event_id").select("v").as[Option[Double]].collect()
    assert(gotNull.forall(_.isEmpty))
    // the scale claim: ONE hash exchange (the key window), no join operator
    val plan = EventStreams.asofJoin(left, right, Seq("user_id"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
    // duplicate right (keys, ts) rows make the last-value fill
    // collect-order-nondeterministic — the precondition is ENFORCED, not
    // just documented: execution must fail loudly, never silently pick one
    val dupRight = Seq((10L, 20L, 2.0), (10L, 20L, 7.0), (10L, 25L, 3.0))
      .toDF("user_id", "ts", "v")
    val dup = intercept[Exception] {
      EventStreams.asofJoin(left, dupRight, Seq("user_id"), "ts", Seq("v")).collect()
    }
    assert(dup.getMessage.contains("duplicate (keys, ts)"), dup.getMessage)
    // ...and the guard only fires for the offending KEY group: a duplicate
    // under user 10 must not poison a query restricted to user 99
    val ok = EventStreams.asofJoin(left.where($"user_id" === 99L), dupRight
        .where($"user_id" === 99L), Seq("user_id"), "ts", Seq("v"))
      .select("v").as[Option[Double]].collect()
    assert(ok.toSeq == Seq(None))
  }

  test("bm25: rare term outranks frequent, length-normalized, TakeOrdered plan") {
    import org.apache.spark.sql.functions.col
    val d = Seq(
      (1L, "rare common filler filler"),
      (2L, "common filler filler filler"),
      (3L, "common common filler filler filler filler filler filler"),
      (4L, "filler filler filler filler")
    ).toDF("doc_id", "text")
    val tf = TextAnalysis.termFrequencies(d)
    val got = TextAnalysis.bm25(tf, Seq("rare", "common"), topK = 4)
      .select("doc_id").as[Long].collect()
    // doc 1 holds the rare term (idf 3 bits vs 1 bit for common-in-3-docs);
    // doc 2 beats doc 3: same tf=... no — doc 3 has tf=2 but double length;
    // exact ranking checked against an independent hand computation below
    def bitlen(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val dls = Map(1L -> 4.0, 2L -> 4.0, 3L -> 8.0, 4L -> 4.0)
    val avgdl = 20.0 / 4
    def score(tfv: Double, dfv: Long, dl: Double) =
      (bitlen(4) - bitlen(dfv)).toDouble * (tfv * (1.2 + 1.0)) /
        (tfv + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val expected = Map(
      1L -> (score(1, 1, dls(1L)) + score(1, 3, dls(1L))),
      2L -> score(1, 3, dls(2L)),
      3L -> score(2, 3, dls(3L)))
      .toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1)
    assert(got.toSeq == expected)
    assert(!got.contains(4L)) // no query term, no score row
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25(tf, Seq.empty)
    }
    // top-k is a TakeOrdered, never a global sort; the df/stats sides
    // come back as broadcasts (no sort-merge join anywhere)
    val plan = TextAnalysis.bm25(tf, Seq("rare"), topK = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("cms sketch: exact on sparse input, never under-counts, linear merge == union") {
    import graft.llm.Sketches
    import org.apache.spark.sql.functions.{col, lit}
    val items = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq("z"))
      .map(("k", _)).toDF("g", "v")
    val probes = Seq(("k", "x"), ("k", "y"), ("k", "z"), ("k", "absent"))
      .toDF("g", "v")
    // 3 distinct values in 4×64 counters: no full-row collision chain, so
    // estimates are EXACT here (deterministic md5 buckets); the absent
    // probe reads 0 unless it collides with a present value in all 4 rows
    val est = Sketches.cmsEstimate(
        Sketches.cmsRegisters(items, Seq("g"), "v"), probes, Seq("g"), "v")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(est == Map("x" -> 5L, "y" -> 3L, "z" -> 1L, "absent" -> 0L))
    // the one-sided guarantee under heavy collision pressure (w=2): every
    // estimate >= its true count
    val many = (1 to 200).flatMap(i => Seq.fill(i % 7 + 1)(s"t$i"))
      .map(("k", _)).toDF("g", "v")
    val manyProbes = (1 to 200).map(i => ("k", s"t$i")).toDF("g", "v")
    val crowded = Sketches.cmsEstimate(
        Sketches.cmsRegisters(many, Seq("g"), "v", d = 4, w = 2),
        manyProbes, Seq("g"), "v", d = 4, w = 2)
      .collect().map(r => (r.getString(1).drop(1).toInt % 7 + 1, r.getLong(2)))
    assert(crowded.forall { case (truth, e) => e >= truth })
    // linear merge: register sums over split halves == whole-input sketch
    val h1 = items.where(col("v") =!= "z")
    val h2 = items.where(col("v") === "z")
    val mergedDiff = Sketches.cmsMerge(
        Sketches.cmsRegisters(h1, Seq("g"), "v"),
        Sketches.cmsRegisters(h2, Seq("g"), "v"), Seq("g"))
      .unionByName(Sketches.cmsRegisters(items, Seq("g"), "v"))
      .groupBy(col("g"), col("row"), col("col"), col("cnt"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .where(col("n") =!= 2).count()
    assert(mergedDiff == 0)
    // register bound + build shape: one exchange, map-side partial count
    val regs = Sketches.cmsRegisters(many, Seq("g"), "v", d = 4, w = 2)
    assert(regs.count() <= 4L * 2)
    val plan = regs.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    // (d, w)-mismatch guard: registers built at w=64 probed at w=2 would
    // silently read absent counters as 0 (an under-count) — must raise
    val wrong = intercept[Exception] {
      Sketches.cmsEstimate(Sketches.cmsRegisters(items, Seq("g"), "v", d = 4, w = 64),
        probes, Seq("g"), "v", d = 4, w = 2).collect()
    }
    assert(wrong.getMessage.contains("different parameters"), wrong.getMessage)
    // ...and the formerly-UNDETECTABLE direction: registers built at a
    // SMALLER (d, w) than the probe look like a sparse sketch to the
    // row/col bounds, but the carried sk_d/sk_w parameters expose them
    val wrongSmall = intercept[Exception] {
      Sketches.cmsEstimate(Sketches.cmsRegisters(items, Seq("g"), "v", d = 4, w = 2),
        probes, Seq("g"), "v", d = 4, w = 64).collect()
    }
    assert(wrongSmall.getMessage.contains("different parameters"), wrongSmall.getMessage)
    // a merge of frames built at different parameters fails loudly on any
    // colliding counter group (w=2 registers fill every (row, col) slot, so
    // collision with the w=64 frame is certain here); frames that never
    // collide are caught later by cmsEstimate's whole-frame check
    val wrongMerge = intercept[Exception] {
      Sketches.cmsMerge(
        Sketches.cmsRegisters(many, Seq("g"), "v", d = 4, w = 2),
        Sketches.cmsRegisters(many, Seq("g"), "v", d = 4, w = 64), Seq("g")).collect()
    }
    assert(wrongMerge.getMessage.contains("different"), wrongMerge.getMessage)
    // an EMPTY register frame is a legitimate sketch of empty input: every
    // probe must read estimate 0, not trip the mismatch guard
    val emptySketch = Sketches.cmsRegisters(
      items.where(col("v") === "no-such-value"), Seq("g"), "v")
    val emptyEst = Sketches.cmsEstimate(emptySketch, probes, Seq("g"), "v")
      .select(col("cms_est")).as[Long].collect()
    assert(emptyEst.length == 4 && emptyEst.forall(_ == 0L))
  }

  test("weighted sketch builds equal raw builds (the single-corpus-pass composition shape)") {
    import graft.llm.Sketches
    import org.apache.spark.sql.functions.{col, count, lit}
    // duplicated values across groups and shards — weights > 1 everywhere
    val items = (1 to 100)
      .flatMap(i => Seq.fill(i % 5 + 1)((s"g${i % 3}", i % 4, s"v${i % 11}")))
      .toDF("g", "shard", "v")
    val grp = items.groupBy(col("g"), col("shard"), col("v"))
      .agg(count(lit(1)).as("_cnt"))
    def regSet(df: org.apache.spark.sql.DataFrame) = df
      .select("g", "row", "col", "cnt", "sk_d", "sk_w").collect()
      .map(_.toSeq).toSet
    // CMS is linear: registers from pre-counted weights == raw counting
    assert(regSet(Sketches.cmsRegistersWeighted(grp, Seq("g"), "v", "_cnt")) ==
      regSet(Sketches.cmsRegisters(items, Seq("g"), "v")))
    // pigeonhole candidates are count-derived: both forms agree exactly
    def candSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(
      candSet(Sketches.frequentCandidatesFromCounts(
        grp, Seq("g"), "v", "shard", "_cnt", 0.2)) ==
      candSet(Sketches.frequentCandidates(items, Seq("g"), "v", "shard", 0.2)))
  }

  test("sketch lookups are null-key safe: a NULL-key group estimates and probes like any other") {
    import graft.llm.Sketches
    import org.apache.spark.sql.functions.lit
    val items = (Seq.fill(4)((null: String, "x")) ++ Seq(("k", "x"), ("k", "x")))
      .toDF("g", "v")
    val probes = Seq((null: String, "x"), ("k", "x"), (null: String, "absent"))
      .toDF("g", "v")
    // CMS: the NULL-key group's counters exist in the registers (groupBy
    // keeps NULL keys); the struct-keyed lookup must read them back — a
    // bare-column join silently estimated 0, the under-count CMS rules out
    val est = Sketches.cmsEstimate(Sketches.cmsRegisters(items, Seq("g"), "v"),
        probes, Seq("g"), "v")
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) -> r.getLong(2)).toMap
    assert(est((None, "x")) == 4L && est((Some("k"), "x")) == 2L
      && est((None, "absent")) == 0L, est.toString)
    // Bloom: a NULL-key probe of a present value must read TRUE (a false
    // negative here broke the filter's defining guarantee)
    val bl = Sketches.bloomContains(Sketches.bloomRegisters(items, Seq("g"), "v"),
        probes.distinct(), Seq("g"), "v")
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(bl((None, "x")) && bl((Some("k"), "x")) && !bl((None, "absent")), bl.toString)
    // heavy hitters: the NULL-key group participates end to end
    val cand = Sketches.frequentCandidates(
      items.withColumn("shard", lit(0)), Seq("g"), "v", "shard", 0.5)
    val hh = Sketches.cmsHeavyHitters(
        Sketches.cmsRegisters(items, Seq("g"), "v"), cand, Seq("g"), "v", 0.5)
      .collect().map(r => (Option(r.getString(0)), r.getString(1))).toSet
    assert(hh == Set((None, "x"), (Some("k"), "x")), hh.toString)
  }

  test("bloom filter: no false negatives ever, union merge, param guards, empty reads false") {
    import graft.llm.Sketches
    import org.apache.spark.sql.functions.{col, lit}
    val added = (1 to 300).map(i => ("k", s"member_$i"))
    val items = added.toDF("g", "v")
    val regs = Sketches.bloomRegisters(items, Seq("g"), "v")
    // every added value MUST read true — the filter's defining guarantee —
    // including under DUPLICATE probe rows and registers that were
    // concatenated instead of bloomMerge'd (row multiplicity must never
    // read as a missing bit)
    val present = Sketches.bloomContains(regs, items.distinct(), Seq("g"), "v")
      .collect().map(r => r.getString(1) -> r.getBoolean(2)).toMap
    assert(present.size == 300 && present.values.forall(identity))
    val dupProbePresent = Sketches.bloomContains(
        regs.unionByName(regs), items.unionByName(items), Seq("g"), "v")
      .collect().map(r => r.getString(1) -> r.getBoolean(2)).toMap
    assert(dupProbePresent.size == 300 && dupProbePresent.values.forall(identity))
    // absent probes at this load factor (300·4 bits in 65536) read false
    val absent = (1 to 300).map(i => ("k", s"other_$i")).toDF("g", "v")
    val fp = Sketches.bloomContains(regs, absent, Seq("g"), "v")
      .where(col("maybe_present")).count()
    assert(fp <= 3, s"implausible false-positive count: $fp")
    // registers are bounded and sparse
    assert(regs.count() <= 4L * 300)
    // merge is set union: two half-builds merge to EXACTLY the whole build
    val h1 = items.where(col("v").substr(8, 10).cast("int") % 2 === 0)
    val h2 = items.where(col("v").substr(8, 10).cast("int") % 2 === 1)
    val mergedDiff = Sketches.bloomMerge(
        Sketches.bloomRegisters(h1, Seq("g"), "v"),
        Sketches.bloomRegisters(h2, Seq("g"), "v"), Seq("g"))
      .unionByName(regs)
      .groupBy(col("g"), col("bit"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .where(col("n") =!= 2).count()
    assert(mergedDiff == 0)
    // re-appending a batch is harmless (idempotent union)
    val reDiff = Sketches.bloomMerge(regs, Sketches.bloomRegisters(h1, Seq("g"), "v"),
        Seq("g"))
      .unionByName(regs).groupBy(col("g"), col("bit"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .where(col("n") =!= 2).count()
    assert(reDiff == 0)
    // (k, m) mismatch in EITHER direction must fail loudly — a silent
    // mismatch manufactures false negatives
    val wrongBig = intercept[Exception] {
      Sketches.bloomContains(Sketches.bloomRegisters(items, Seq("g"), "v", m = 64),
        items, Seq("g"), "v").collect()
    }
    assert(wrongBig.getMessage.contains("different parameters"), wrongBig.getMessage)
    val wrongSmall = intercept[Exception] {
      Sketches.bloomContains(regs, items, Seq("g"), "v", m = 64).collect()
    }
    assert(wrongSmall.getMessage.contains("different parameters"), wrongSmall.getMessage)
    val wrongMerge = intercept[Exception] {
      Sketches.bloomMerge(regs,
        Sketches.bloomRegisters(items, Seq("g"), "v", m = 64), Seq("g")).collect()
    }
    assert(wrongMerge.getMessage.contains("different"), wrongMerge.getMessage)
    // an empty register frame is the sketch of empty input: all-false, no guard trip
    val emptyRegs = Sketches.bloomRegisters(
      items.where(col("v") === "no-such"), Seq("g"), "v")
    val emptyProbe = Sketches.bloomContains(emptyRegs, items.limit(5), Seq("g"), "v")
      .select("maybe_present").as[Boolean].collect()
    assert(emptyProbe.length == 5 && emptyProbe.forall(!_))
  }

  test("heavy hitters: shard candidates miss no true hitter, sketch-only decision (seeded)") {
    import graft.llm.Sketches
    import org.apache.spark.sql.functions.{col, lit}
    val rnd = new scala.util.Random(23)
    // skewed corpus: a few heavy values + a long tail, rows sharded at random
    // (the lemma must hold for ANY disjoint sharding)
    val rows = (1 to 2000).map { _ =>
      val v = rnd.nextInt(100) match {
        case x if x < 30 => "heavy_a"
        case x if x < 50 => "heavy_b"
        case x if x < 58 => "mid_c"
        case x           => s"tail_${x}_${rnd.nextInt(40)}"
      }
      ("k", rnd.nextInt(8).toLong, v)
    }
    val items = rows.toDF("g", "shard", "v")
    val phi = 0.05
    val exact = rows.groupBy(_._3).view.mapValues(_.size).toMap
    val trueHitters = exact.filter(_._2 >= math.ceil(rows.size * phi)).keySet
    assert(trueHitters.nonEmpty && trueHitters.size < exact.size) // non-trivial

    // stage 1: candidates from per-shard exact frequent sets — a SUPERSET
    // of the true hitters under the pigeonhole lemma, and artifact-small
    val cand = Sketches.frequentCandidates(items, Seq("g"), "v", "shard", phi)
    val candSet = cand.select("v").as[String].collect().toSet
    assert(trueHitters.subsetOf(candSet), s"missed: ${trueHitters.diff(candSet)}")
    assert(candSet.size <= 8 * math.ceil(1 / phi).toInt)

    // stage 2: the decision runs from MERGED per-shard registers alone —
    // no raw-data pass — and its two one-sided guarantees hold: every true
    // hitter among the candidates survives, every estimate >= truth
    val regs = (0L to 7L).map(sh =>
        Sketches.cmsRegisters(items.where(col("shard") === sh), Seq("g"), "v"))
      .reduce(Sketches.cmsMerge(_, _, Seq("g")))
    val hh = Sketches.cmsHeavyHitters(regs, cand, Seq("g"), "v", phi)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(trueHitters.subsetOf(hh.keySet), s"dropped: ${trueHitters.diff(hh.keySet)}")
    assert(hh.forall { case (v, est) => est >= exact(v) })
    // n read off the sketch equals the corpus size
    val nTotal = Sketches.cmsHeavyHitters(regs, cand, Seq("g"), "v", phi)
      .select("n_total").as[Long].head()
    assert(nTotal == rows.size.toLong)
  }

  test("quantile sketch: bounds bracket exact ranks, linear merge == union, fail-loud") {
    import graft.llm.Sketches
    import org.apache.spark.sql.functions.{col, lit}
    val rnd = new scala.util.Random(17)
    val vals = (1 to 500).map(_ => ("k", rnd.nextInt(100000).toLong)) :+ (("k", 0L))
    val df = vals.toDF("g", "v")
    val qs = Seq(0.25, 0.5, 0.9, 0.99, 1.0)
    val est = Sketches.quantileEstimate(
        Sketches.quantileRegisters(df, Seq("g"), "v"), Seq("g"), qs)
      .collect().map(r => r.getDouble(1) -> ((r.getLong(3), r.getLong(4)))).toMap
    val sorted = vals.map(_._2).sorted
    qs.foreach { q =>
      val exact = sorted(math.ceil(q * sorted.size).toInt - 1)
      val (lo, hi) = est(q)
      assert(lo <= exact && exact < hi, s"q=$q exact=$exact not in [$lo, $hi)")
      // the relative-error guarantee: bucket width ≤ base/s (+1 rounding)
      assert(hi - lo <= lo / 16 + 1, s"q=$q bucket [$lo, $hi) too wide")
    }
    // linear merge: split-halves registers sum to the whole-input sketch
    val mergedDiff = Sketches.quantileMerge(
        Sketches.quantileRegisters(df.where(col("v") % 2 === 0), Seq("g"), "v"),
        Sketches.quantileRegisters(df.where(col("v") % 2 =!= 0), Seq("g"), "v"),
        Seq("g"))
      .unionByName(Sketches.quantileRegisters(df, Seq("g"), "v"))
      .groupBy(col("g"), col("qb"), col("sub"), col("cnt"), col("sk_s"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .where(col("n") =!= 2).count()
    assert(mergedDiff == 0)
    // register bound + build shape: one exchange, bounded rows per key
    val regs = Sketches.quantileRegisters(df, Seq("g"), "v")
    assert(regs.count() <= 64L * 16)
    assert("Exchange hashpartitioning".r
      .findAllIn(regs.queryExecution.executedPlan.toString).size == 1)
    // guards: negative/oversize values; s mismatch in both estimate + merge
    val neg = intercept[Exception] {
      Sketches.quantileRegisters(Seq(("k", -1L)).toDF("g", "v"), Seq("g"), "v").collect()
    }
    assert(neg.getMessage.contains("outside [0, 2^40)"), neg.getMessage)
    val wrongS = intercept[Exception] {
      Sketches.quantileEstimate(
        Sketches.quantileRegisters(df, Seq("g"), "v", s = 8), Seq("g"), qs).collect()
    }
    assert(wrongS.getMessage.contains("different s"), wrongS.getMessage)
    val wrongMerge = intercept[Exception] {
      Sketches.quantileMerge(
        Sketches.quantileRegisters(df, Seq("g"), "v", s = 8),
        Sketches.quantileRegisters(df, Seq("g"), "v", s = 16), Seq("g")).collect()
    }
    assert(wrongMerge.getMessage.contains("different s"), wrongMerge.getMessage)
  }

  test("text classifier: naive-Bayes bitlen weights, frozen apply, one corpus exchange") {
    import org.apache.spark.sql.functions.{col, conv, md5, substring}
    // labeled set: positives speak "good"/"nice", negatives "bad"/"ugly";
    // "the" appears in both classes equally
    val labeled = Seq(
      (1L, "good nice the", true), (2L, "good the", true),
      (3L, "bad ugly the", false), (4L, "bad the", false)
    ).toDF("doc_id", "text", "is_pos")
    val model = TextAnalysis.trainTextClassifier(labeled, col("is_pos"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def bucket(t: String): Int = {
      val df = Seq(t).toDF("t")
        .select(conv(substring(md5(col("t")), 1, 2), 16, 10).cast("int"))
      df.collect().head.getInt(0)
    }
    // independent weight computation: N_pos = 5, N_neg = 5 ⇒ the totals
    // term cancels; w = bitlen(c_pos+1) − bitlen(c_neg+1)
    // "good": (2+1=3 → 2 bits) − (0+1=1 → 1 bit) = +1 (assuming no
    // bucket collisions among the 5 distinct test tokens — asserted)
    assert(Seq("good", "nice", "bad", "ugly", "the").map(bucket).distinct.size == 5)
    assert(model(bucket("good")) == 1L)
    assert(model(bucket("bad")) == -1L)
    assert(model(bucket("the")) == 0L)   // balanced term carries no signal
    // frozen apply to NEW docs: unseen token ("zzz") scores 0
    val modelDf = TextAnalysis.trainTextClassifier(labeled, col("is_pos"))
    val applied = TextAnalysis.applyTextClassifier(
        Seq((10L, "good good the"), (11L, "ugly zzz"), (12L, "the"))
          .toDF("doc_id", "text"), modelDf)
      .orderBy("doc_id").as[(Long, Long, Long, Int)].collect()
    assert(applied.toSeq == Seq(
      (10L, 3L, 2L, 1), (11L, 2L, -1L, 0), (12L, 1L, 0L, 1)))
    // scale shape: the model joins as a BROADCAST onto the token stream —
    // never a sort-merge join, and the corpus side shuffles exactly once
    // (the per-doc aggregate)
    val bigApply = TextAnalysis.applyTextClassifier(docs, modelDf)
    val plan = bigApply.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("incremental semantic pairs: batch vs index only, equals cross-restriction of full pairing") {
    val centroids = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("centroid_id", "centroid")
    val assigned = Similarity.assignCells(vecs, centroids)
    val inc = Dedup.incrementalSemanticPairs(
        assigned.where($"vec_id" =!= 1L), assigned.where($"vec_id" === 1L),
        threshold = 0.9)
      .select("batch_id", "index_id").as[(Long, Long)].collect().toSet
    assert(inc == Set((1L, 0L)))
    // exactness: the incremental candidates are the full pairing restricted
    // to batch×index pairs — nothing lost, nothing self-paired
    val full = Dedup.semanticPairs(assigned, threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val crossFromFull = full.collect {
      case (a, b) if a == 1L => (a, b)
      case (a, b) if b == 1L => (b, a)
    }
    assert(inc == crossFromFull)
  }

  test("novelty stats: first occurrence wins, later copies add nothing, no gram join") {
    // doc 1 introduces everything; doc 2 repeats doc 1 exactly (0 novel);
    // doc 3 shares a prefix with 1 but adds new tail grams
    val d = Seq(
      (1L, "abcdefghij"), (2L, "abcdefghij"), (3L, "abcdefgXYZ")
    ).toDF("doc_id", "text")
    val got = Dedup.noveltyStats(Dedup.charGrams(d, n = 8))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    // 10-char docs → 3 distinct 8-grams each; doc 3 shares only "abcdefgX"'s
    // predecessor? grams of 3: abcdefgX, bcdefgXY, cdefgXYZ — all new
    assert(got.toSeq == Seq((1L, 3L, 3L), (2L, 3L, 0L), (3L, 3L, 3L)))
    // total novelty across docs == |distinct grams in corpus|
    val totalNovel = got.map(_._3).sum
    val distinctGrams = Dedup.charGrams(d, n = 8).select("gram").distinct().count()
    assert(totalNovel == distinctGrams)
    // the plan joins only docs-sized aggregates: the gram column never
    // appears in a join condition (no corpus×corpus gram join)
    val plan = Dedup.noveltyStats(Dedup.charGrams(d, n = 8))
      .queryExecution.executedPlan.toString
    assert(!"Join [a-zA-Z]*\\[gram".r.findFirstIn(plan).isDefined, plan)
  }

  test("semdedup property: one keeper per group, keeper least centroid-similar (seeded random)") {
    val rnd = new scala.util.Random(7)
    val data = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val vs = data.toDF("vec_id", "embedding")
    val cents = vs.where($"vec_id" < 3)
      .select(($"vec_id" + 1).as("centroid_id"), $"embedding".as("centroid"))
    val assigned = Similarity.assignCells(vs, cents)
    for (tau <- Seq(0.2, 0.5, 0.8)) {
      val out = Dedup.semDeDup(assigned, cents, tau).collect()
      // every vector appears exactly once
      assert(out.map(_.getAs[Long]("vec_id")).sorted.toSeq == (0L until 60L))
      out.groupBy(_.getAs[Long]("cluster_id")).values.foreach { rows =>
        // exactly one keeper per group
        assert(rows.map(_.getAs[Int]("keep")).sum == 1)
        // groups never span cells (pairs are within-cell by construction)
        assert(rows.map(_.getAs[Long]("cell")).distinct.size == 1)
        // the keeper minimizes (cent_sim, vec_id) — the paper's rule
        val keeper = rows.find(_.getAs[Int]("keep") == 1).get
        val expected = rows.minBy(r =>
          (r.getAs[Double]("cent_sim"), r.getAs[Long]("vec_id")))
        assert(keeper.getAs[Long]("vec_id") == expected.getAs[Long]("vec_id"))
      }
    }
  }

  test("simhash pairs: 4-band retrieval is lossless for hamming <= 3") {
    import spark.implicits._
    // 0x0101 vs 0x0000 differ in two DIFFERENT nibbles (b0 and b2) —
    // a 2-band high/low-byte scheme would miss this pair entirely
    val sims = Seq((1L, 0x0101L), (2L, 0x0000L), (3L, 0xffffL))
      .toDF("doc_id", "simhash")
    val got = Dedup.simhashPairs(sims, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 2L)))
    intercept[IllegalArgumentException] { Dedup.simhashPairs(sims, maxHamming = 4) }
  }

  test("duplicate clusters: min-label propagation finds connected components") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter forces multiple propagation rounds) + pair 7-8
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("doc_a", "doc_b")
    // the change check must be JOIN-FREE: `prev` rides through the round's
    // own min-aggregate, so the former per-round broadcast join + shuffle
    // in the changed-count is gone — pin it via the executed plans the
    // listener reports for every `count at Dedup` execution
    val countPlans = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.SparkPlanInfo]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
            if s.description.startsWith("count at Dedup") =>
          countPlans.add(s.sparkPlanInfo)
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val got =
      try Dedup.duplicateClusters(pairs).as[(Long, Long)].collect().toSet
      finally {
        // listener events are async: wait for the bus to drain
        var last = -1
        while (countPlans.size() != last) { last = countPlans.size(); Thread.sleep(200) }
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (7L, 7L), (8L, 7L)))
    // quality-ranked survivor selection on top of the clusters: highest
    // score wins its component, doc_id breaks ties
    val meta = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L), (7L, 2L), (8L, 2L))
      .toDF("doc_id", "score")
    val survivors = Dedup.resolveSurvivors(
        Dedup.duplicateClusters(pairs), meta,
        Seq(org.apache.spark.sql.functions.col("score").desc,
          org.apache.spark.sql.functions.col("doc_id")))
      .select("cluster_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(survivors == Set((1L, 2L), (7L, 7L))) // 2 beats 3 on tie; 7 beats 8
    def hasJoin(p: org.apache.spark.sql.execution.SparkPlanInfo): Boolean =
      p.nodeName.contains("Join") || p.children.exists(hasJoin)
    // path 1-2-3-4 converges in 4 rounds (3 propagation hops + no-change)
    assert(countPlans.size() == 4, s"expected 4 rounds, saw ${countPlans.size()}")
    countPlans.forEach(p => assert(!hasJoin(p), s"change-count plan joins: $p"))
  }

  test("winnowing: documents sharing a long substring share a fingerprint") {
    import spark.implicits._
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, "AAAA " + common + " BBBB"),
      (2L, "XXXXXXXXXX " + common + " YY"),
      (3L, "zzzz completely unrelated content qqqq wwww eeee rrrr tttt")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(docs, k = 8, w = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // guarantee: any common substring of length ≥ w+k−1 yields a shared min
    assert((fps(1L) & fps(2L)).nonEmpty)
    assert((fps(1L) & fps(3L)).isEmpty)
    // deterministic across evaluations
    val again = TextAnalysis.winnowingFingerprints(docs, k = 8, w = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == fps.toSeq.flatMap { case (d, s) => s.map(d -> _) }.toSet)
  }

  test("text analysis: lang id, token counts, quality, fingerprint") {
    val out = docs.select(col("doc_id"), TextAnalysis.langId(docs).as("lang"),
        TextAnalysis.tokenCount(col("text")).as("nt"),
        TextAnalysis.bpeishTokenCount(col("text")).as("nb"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "en" && out(3).getString(1) == "de")
    assert(out(0).getLong(2) == 11L)
    assert(out.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
    assert(out(0).getString(5) == out(1).getString(5)) // same content, same fp
    val punct = Seq((9L, "a,b c.")).toDF("doc_id", "text")
    val nb = punct.select(TextAnalysis.bpeishTokenCount(col("text"))).as[Long].head()
    assert(nb == 5L) // a , b c .
  }

  test("multimodal: byte stats, dedup, kind-dispatched decode, frame sampling, resize") {
    import Multimodal._
    // every kind carries a REAL payload: extractFeatures dispatches on kind
    // into javax.imageio / AudioSystem / the AVI demuxer — no stub path
    val pngPx = Array.tabulate(64)(i => (i * 3) % 256)
    val png = ImageIoCodec.encodeGrayPng(pngPx, 8, 8)
    val vidPx = Array.tabulate(64)(i => (i * 5 + 1) % 256)
    val avi = AviCodec.encode(
      Seq(ImageIoCodec.encodeGrayPng(vidPx, 8, 8),
        ImageIoCodec.encodeGrayPng(pngPx, 8, 8)), 8, 8, fps = 25, fourcc = "MPNG")
    val wav = WavCodec.encodePcm16(Array[Short](-32768, 0, 16384, 32767), 8000)
    val media = Seq(
      MediaRow(1L, "image", png, MediaMeta(Some(800), Some(600), None, None)),
      MediaRow(2L, "image", png, MediaMeta(Some(800), Some(600), None, None)),
      MediaRow(3L, "video", avi, MediaMeta(Some(320), Some(240), Some(2500), None)),
      MediaRow(4L, "audio", wav, MediaMeta(None, None, Some(1), Some(8000)))
    ).toDS()
    val stats = byteStats(media.toDF()).orderBy("media_id").collect()
    assert(stats(0).getLong(2) == png.length.toLong &&
      stats(0).getString(3) == stats(1).getString(3))
    val dd = dedupExact(media.toDF()).collect()
    assert(dd.length == 3 && dd.find(_.getLong(2) == 2L).get.getLong(1) == 1L)
    val feats = extractFeatures(media, dim = 4)(spark).collect().sortBy(_.media_id)
    assert(feats(0).features.length == 4)
    // real decode: features are the leading gray levels scaled to [0,1)
    assert(feats(0).features.sameElements(Array(0f, 3 / 256f, 6 / 256f, 9 / 256f)))
    assert(feats(0).features.sameElements(feats(1).features))
    // video = FIRST demuxed frame's gray levels, audio = scaled PCM samples
    assert(feats(2).features.sameElements(Array(1 / 256f, 6 / 256f, 11 / 256f, 16 / 256f)))
    assert(feats(3).features.sameElements(Array(0f, 0.5f, 0.75f, 65535 / 65536f)))
    // an undecodable payload fails the job loudly — quarantine, never skip
    for (kind <- Seq("image", "audio", "video", "hologram")) {
      val bad = Seq(MediaRow(9L, kind, Array[Byte](1, 2, 3),
        MediaMeta(None, None, None, None))).toDS()
      intercept[Exception](extractFeatures(bad, dim = 4)(spark).collect())
    }
    val frames = frameSample(media.toDF(), everyMs = 1000).collect()
    // 0, 1000, 2000 for the 2500ms video + offset 0 for the 1ms audio clip
    assert(frames.length == 4)
    val rs = resizePlan(media.toDF(), maxSide = 400).orderBy("media_id").collect()
    assert(rs(0).getInt(4) == 400 && rs(0).getInt(5) == 300)
    assert(rs(2).getInt(4) == 320 && rs(2).getInt(5) == 240) // never upscale
  }

  test("ImageIoCodec: bmp/gif lossless, jpeg tolerance-bounded, all formats fail loudly on garbage") {
    import Multimodal._
    import spark.implicits._
    val px = Array.tabulate(64)(i => (i * 37 + (i * i % 13) * 11) % 256)
    // bmp/gif: BIT-EXACT gray round-trips (the LosslessFormats contract)
    for (fmt <- Seq("bmp", "gif")) {
      val bytes = ImageIoCodec.encodeGray(px, 8, 8, fmt)
      val (w, h, back) = ImageIoCodec.decodeGray(bytes)
      assert(w == 8 && h == 8 && back.sameElements(px), s"$fmt round-trip not exact")
    }
    // real container magic per format
    assert(new String(ImageIoCodec.encodeGray(px, 8, 8, "bmp").take(2), "US-ASCII") == "BM")
    assert(new String(ImageIoCodec.encodeGray(px, 8, 8, "gif").take(4), "US-ASCII") == "GIF8")
    val jb = ImageIoCodec.encodeGray(px, 8, 8, "jpg")
    assert((jb(0) & 0xff) == 0xff && (jb(1) & 0xff) == 0xd8) // JPEG SOI
    // jpeg is lossy by contract (NOT in LosslessFormats) but q=1.0 keeps
    // the gray DCT error within a few levels — the q_image_jpeg_roundtrip
    // tolerance of 8 needs real headroom here
    val (jw, jh, jback) = ImageIoCodec.decodeGray(jb)
    val maxerr = jback.zip(px).map { case (a, b) => math.abs(a - b) }.max
    assert(jw == 8 && jh == 8, s"jpeg dims $jw x $jh")
    assert(maxerr <= 8, s"jpeg q=1.0 maxerr $maxerr exceeds the gate tolerance")
    // TRUNCATED payloads fail loudly in every container — the reader
    // claims the magic then hits EOF; nothing silently yields a raster
    for (fmt <- Seq("png", "bmp", "gif", "jpg")) {
      val full = ImageIoCodec.encodeGray(px, 8, 8, fmt)
      intercept[Exception](ImageIoCodec.decodeGray(full.take(9)))
    }
    intercept[Exception](ImageIoCodec.encodeGray(px, 8, 8, "tiff"))
    // the DISTRIBUTED mixed-container path: png/bmp/gif by id, one sniffing
    // decode — grids come back exactly, regardless of container
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val grids = (0L until 6L).map(id =>
      (id, Array.tabulate(64)(i => ((i + id.toInt * 7) * 5) % 256))).toDF("vec_id", "px")
    val mixed = encodeGrayGridAssets(grids, w = 8, h = 8,
      format = id => (id % 3) match { case 0 => "png"; case 1 => "bmp"; case _ => "gif" })
    val back = decodeGrayGrid(mixed).orderBy("media_id")
      .select("media_id", "px").as[(Long, Array[Int])].collect()
    val want = grids.orderBy("vec_id").as[(Long, Array[Int])].collect()
    back.zip(want).foreach { case ((id, got), (wid, exp)) =>
      assert(id == wid && got.sameElements(exp), s"mixed decode drifted for id $id")
    }
  }

  test("ImageIoCodec: PNG round-trip exact, non-gray converts, garbage fails loudly") {
    import Multimodal._
    // distributed round-trip: grid → real PNG bytes → javax.imageio decode →
    // identical grid, through the mapPartitions plumbing end to end
    val grids = Seq(
      (1L, Array.tabulate(64)(i => (i * 4) % 256)),
      (2L, Array.fill(64)(0)),
      (3L, Array.tabulate(64)(i => 255 - (i % 256)))).toDF("vec_id", "px")
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val png = encodePngGrid(grids, w = 8, h = 8)
    val payloads = png.collect().sortBy(_.media_id)
    // real PNGs: magic bytes present, distinct content distinct bytes
    assert(payloads.forall(p => (p.payload(1) & 0xff) == 'P'.toInt &&
      (p.payload(2) & 0xff) == 'N'.toInt && (p.payload(3) & 0xff) == 'G'.toInt))
    val back = decodeGrayGrid(png).orderBy("media_id")
      .select("media_id", "w", "h", "px")
      .as[(Long, Int, Int, Array[Int])].collect()
    val want = grids.orderBy("vec_id").as[(Long, Array[Int])].collect()
    back.zip(want).foreach { case ((id, w, h, px), (wid, wpx)) =>
      assert(id == wid && w == 8 && h == 8 && px.sameElements(wpx))
    }
    // non-gray PNG decodes through the gray conversion (band 0 = luminance)
    val rgb = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    rgb.setRGB(0, 0, 0xffffff); rgb.setRGB(1, 1, 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", bos)
    val (w2, h2, px2) = ImageIoCodec.decodeGrayPng(bos.toByteArray)
    assert(w2 == 2 && h2 == 2 && px2(0) == 255 && px2(3) == 0)
    // corrupt payloads fail loudly — quarantine, never silently skip
    val eg = intercept[Exception](ImageIoCodec.decodeGrayPng(Array[Byte](1, 2, 3)))
    assert(eg.getMessage.contains("undecodable"), eg.getMessage)
    val eo = intercept[Exception](ImageIoCodec.encodeGrayPng(Array(300, 0, 0, 0), 2, 2))
    assert(eo.getMessage.contains("out of range"), eo.getMessage)
  }

  test("downscaleGrayGrid: exact box means, crop convention, undersized rows drop") {
    import Multimodal._
    // 4×2 grid, f=2 → 2×1: means of [10,20,30,40] = 25 and [0,255,1,254] = 127
    // (integer div — exact); 3×3 with f=2 → 1×1 from the top-left 2×2 box
    // ONLY (right/bottom crop); a 1×1 grid is smaller than f and drops
    val decoded = Seq(
      (1L, 4, 2, Array(10, 30, 0, 1, 20, 40, 255, 254)),
      (2L, 3, 3, Array(8, 12, 99, 16, 20, 99, 99, 99, 99)),
      (3L, 1, 1, Array(7))).toDF("media_id", "w", "h", "px")
    val out = downscaleGrayGrid(decoded, f = 2).orderBy("media_id")
      .as[(Long, Int, Int, Array[Int])].collect()
    assert(out.length == 2)
    assert(out(0) == ((1L, 2, 1, out(0)._4)) && out(0)._4.toSeq == Seq(25, 127))
    assert(out(1) == ((2L, 1, 1, out(1)._4)) && out(1)._4.toSeq == Seq(14))
    // no UDF, no exchange: a pure codegen'd projection
    val plan = downscaleGrayGrid(decoded, 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython"), plan)
  }

  test("WavCodec: PCM16 round-trip exact through the JDK parser, features exact, garbage fails loudly") {
    import Multimodal._
    // bit-exact round-trip through AudioSystem, full amplitude range incl.
    // Short.MinValue (the abs edge) and both sample-rate header fields
    val samples = Array[Short](0, 32767, -32768, 1, -1, 0, 12345, -12345)
    for (rate <- Seq(8000, 16000, 44100)) {
      val (r2, s2) = WavCodec.decodePcm16(WavCodec.encodePcm16(samples, rate))
      assert(r2 == rate && s2.sameElements(samples), s"rate=$rate")
    }
    // features on a hand-checked frame: samples (3, -4, 0, 5, -5) →
    // peak 5, strict crossings at (3,-4) and (5,-5) [(-4,0),(0,5) excluded:
    // product is 0, not < 0], sum sq = 9+16+0+25+25 = 75, rms = sqrt(15)
    val media = Seq((7L,
      WavCodec.encodePcm16(Array[Short](3, -4, 0, 5, -5), 1000))).toDF("media_id", "payload")
    val f = audioFeatures(media).collect().head
    assert(f.getLong(0) == 7L && f.getInt(1) == 1000 && f.getLong(2) == 5L)
    assert(f.getLong(3) == 5L, "5 samples at 1 kHz = 5 ms")
    assert(f.getLong(4) == 5L && f.getLong(5) == 2L)
    assert(f.getDouble(6) == math.sqrt(15.0))
    // a non-WAV payload fails in the JDK parser — quarantine, never garbage
    intercept[Exception](WavCodec.decodePcm16(Array[Byte](1, 2, 3, 4)))
    // a WRONG format (stereo) is rejected by the post-parse require, loudly
    val stereoHeader = {
      val bb = java.nio.ByteBuffer.allocate(48).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(40).put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(2).putInt(8000).putInt(32000).putShort(4).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(4).putInt(0)
      bb.array()
    }
    val es = intercept[Exception](WavCodec.decodePcm16(stereoHeader))
    assert(es.getMessage.contains("mono"), es.getMessage)
  }

  test("AviCodec: mux/demux bit-exact incl. odd-size padding, headers round-trip, corruption fails loudly") {
    import Multimodal._
    // the container treats frames as opaque payloads; odd and even lengths
    // exercise the RIFF even-pad rule (a missing pad byte would shift every
    // later chunk) — JPEG payloads are odd-length about half the time
    val frames = Seq(
      Array.tabulate(13)(i => (i * 7 + 1).toByte),  // odd
      Array.tabulate(20)(i => (i * 3).toByte),      // even
      Array[Byte](0x42),                            // odd, single byte
      Array.tabulate(255)(i => (255 - i).toByte))
    val avi = AviCodec.encode(frames, w = 320, h = 240, fps = 30, fourcc = "MJPG")
    assert(new String(avi.take(4), "US-ASCII") == "RIFF" &&
      new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val v = AviCodec.decode(avi)
    assert(v.w == 320 && v.h == 240 && v.fourcc == "MJPG")
    assert(v.usPerFrame == 1000000 / 30)
    assert(v.frames.size == 4)
    v.frames.zip(frames).foreach { case (got, want) =>
      assert(got.sameElements(want), "frame payload drifted through the container")
    }
    // a real image pipeline end to end: PNG frames in, identical grids out
    val px1 = Array.tabulate(64)(i => (i * 11) % 256)
    val px2 = Array.tabulate(64)(i => (i * 13 + 5) % 256)
    val vid = AviCodec.encode(
      Seq(ImageIoCodec.encodeGrayPng(px1, 8, 8), ImageIoCodec.encodeGrayPng(px2, 8, 8)),
      8, 8, fps = 25, fourcc = "MPNG")
    val back = AviCodec.decode(vid).frames.map(ImageIoCodec.decodeGray)
    assert(back(0)._3.sameElements(px1) && back(1)._3.sameElements(px2))
    // corruption fails loudly, never as silently shifted frames:
    intercept[Exception](AviCodec.decode(avi.take(40)))          // truncated
    intercept[Exception](AviCodec.decode(Array[Byte](1, 2, 3)))  // not RIFF
    val notAvi = avi.clone(); "WAVE".getBytes("US-ASCII").copyToArray(notAvi, 8)
    intercept[Exception](AviCodec.decode(notAvi))                // wrong form
    // a stale idx1 entry (tampered size field) is cross-validated
    val idxPos = {
      var p = -1
      for (i <- avi.indices.dropRight(3)
           if p < 0 && avi(i) == 'i' && avi(i + 1) == 'd' && avi(i + 2) == 'x' && avi(i + 3) == '1')
        p = i
      p
    }
    assert(idxPos > 0)
    val staleIdx = avi.clone(); staleIdx(idxPos + 8 + 12) = 99   // first entry's size
    val ei = intercept[Exception](AviCodec.decode(staleIdx))
    assert(ei.getMessage.contains("idx1"), ei.getMessage)
    // a header/movi frame-count mismatch is caught (drop the last idx entry
    // AND the declared count stays — simulate by tampering avih totalFrames)
    val declPos = 12 + 12 + 8 + 16                               // avih dwTotalFrames
    val badCount = avi.clone(); badCount(declPos) = 9
    val ec = intercept[Exception](AviCodec.decode(badCount))
    assert(ec.getMessage.contains("frames"), ec.getMessage)
    // unsupported fourccs rejected on both sides
    intercept[Exception](AviCodec.encode(frames, 8, 8, 25, "H264"))
    intercept[Exception](AviCodec.encode(Seq.empty, 8, 8, 25, "MJPG"))
  }

  test("video distributed path: grids → AVI → demux+decode round-trip, uneven final video, summary") {
    import Multimodal._
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    // 11 grids, 4 frames per video → videos 0..2, the last with 3 frames
    val grids = (0L until 11L).map(id =>
      (id, Array.tabulate(64)(i => ((i * 3 + id.toInt * 17) % 256)))).toDF("vec_id", "px")
    val avis = encodeGridVideos(grids, w = 8, h = 8, framesPer = 4, fps = 10,
      fourcc = "MPNG")
    val frames = decodeVideoFrames(avis)
      .select((col("media_id") * 4 + col("frame_no")).as("vec_id"), col("w"), col("h"), col("px"))
      .orderBy("vec_id").as[(Long, Int, Int, Array[Int])].collect()
    val want = grids.orderBy("vec_id").as[(Long, Array[Int])].collect()
    assert(frames.length == 11)
    frames.zip(want).foreach { case ((id, w, h, px), (wid, wpx)) =>
      assert(id == wid && w == 8 && h == 8 && px.sameElements(wpx),
        s"video round-trip drifted for source grid $wid")
    }
    val summary = videoSummary(avis).orderBy("media_id")
      .as[(Long, Int, Int, Int, String, Int)].collect()
    assert(summary.toSeq == Seq(
      (0L, 8, 8, 100000, "MPNG", 4), (1L, 8, 8, 100000, "MPNG", 4),
      (2L, 8, 8, 100000, "MPNG", 3)))
    // MJPG frames reconstruct within the q=1.0 tolerance
    val jframes = decodeVideoFrames(encodeGridVideos(grids, 8, 8, framesPer = 4,
        fps = 10, fourcc = "MJPG"))
      .select((col("media_id") * 4 + col("frame_no")).as("vec_id"), col("px"))
      .orderBy("vec_id").as[(Long, Array[Int])].collect()
    jframes.zip(want).foreach { case ((id, px), (wid, wpx)) =>
      val maxerr = px.zip(wpx).map { case (a, b) => math.abs(a - b) }.max
      assert(id == wid && maxerr <= 8, s"MJPG maxerr $maxerr for grid $wid")
    }
  }

  test("dHash: gradient bits exact, near-dup retrieval lossless, no cross product") {
    import spark.implicits._
    // strictly increasing grid → every adjacent comparison true → all 56 bits
    val inc = Array.tabulate(64)(i => i.toFloat / 64f - 0.5f)
    // one interior pixel bumped high flips the comparison it leads
    val bumped = inc.clone(); bumped(18) = 0.499f
    // strictly decreasing → no bits set
    val dec = inc.reverse
    val vecs = Seq((1L, inc), (2L, bumped), (3L, dec)).toDF("vec_id", "embedding")
    val hashes = Multimodal.dHash(
      Multimodal.grayscaleGrid(vecs, "vec_id", "embedding"), w = 8, h = 8)
    val h = hashes.orderBy("vec_id").as[(Long, Long)].collect()
    assert(h(0)._2 == (1L << 56) - 1, s"all-gradient hash: ${h(0)._2}")
    assert(h(2)._2 == 0L, s"reverse gradient hash: ${h(2)._2}")
    val d12 = java.lang.Long.bitCount(h(0)._2 ^ h(1)._2)
    assert(d12 >= 1 && d12 <= 2, s"single-pixel bump flips 1-2 bits, got $d12")
    // a grid shorter than w×h fails loudly — silent NULL reads past the
    // array end would clear high bits and collapse unrelated images
    val short = Seq((9L, Array.fill(32)(0.1f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception](Multimodal.dHash(
      Multimodal.grayscaleGrid(short, "vec_id", "embedding")).collect())
    assert(ex.getMessage.contains("dHash needs"), ex.getMessage)
    // lossless retrieval: banded pairs == brute-force popcount filter
    val got = Dedup.bandedHammingPairs(hashes, bits = 56, bandBits = 4,
        maxHamming = 13, idCol = "vec_id", hashCol = "dhash")
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect().toSet
    val brute = (for {
      (a, ha) <- h; (b, hb) <- h if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 13
    } yield (a, b, d.toLong)).toSet
    assert(got == brute, s"banded $got vs brute $brute")
    // the candidate join is a single equi-join on the banded key — a cross
    // product here would be quadratic in the corpus
    val plan = Dedup.bandedHammingPairs(hashes, 56, 4, 13, "vec_id", "dhash")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("bandBitsFor: widest lossless banding, fail-loud when denser than brute force") {
    // radius 6 on 56 bits → 8-bit bands (7 bands > 6, fraction 7/256)
    assert(Dedup.bandBitsFor(bits = 56, maxHamming = 6, expectedN = 2000) == 8)
    // simhash shape: radius 3 on 16 bits → 4-bit bands at small n
    assert(Dedup.bandBitsFor(bits = 16, maxHamming = 3, expectedN = 200) == 4)
    // the demo-default footgun, now LOUD: radius 13 on 56 bits forces
    // 4-bit bands whose candidate stream is 14/16 of all pairs — denser
    // than the brute-force scan it claims to avoid
    val dense = intercept[IllegalArgumentException] {
      Dedup.bandBitsFor(bits = 56, maxHamming = 13, expectedN = 2000)
    }
    assert(dense.getMessage.contains("denser than brute force"), dense.getMessage)
    // near-linearity bound: 8-bit bands on 56 bits give fraction·n ≈ 2700
    // candidates per row at n = 100k — the banding nominally beats
    // all-pairs but is nowhere near linear, so it must fail loudly too
    val quad = intercept[IllegalArgumentException] {
      Dedup.bandBitsFor(bits = 56, maxHamming = 6, expectedN = 100000)
    }
    assert(quad.getMessage.contains("far from linear"), quad.getMessage)
    // no lossless banding at all: radius >= bits
    val none = intercept[IllegalArgumentException] {
      Dedup.bandBitsFor(bits = 16, maxHamming = 16, expectedN = 100)
    }
    assert(none.getMessage.contains("no lossless banding"), none.getMessage)
  }

  test("product quantization: nearest-codeword codes, ADC ranking, map-only encode") {
    import spark.implicits._
    // 4-d vectors, m=2 subspaces × 2 dims; codewords from vec 10 (code 1)
    // and vec 20 (code 2)
    val emb = Seq(
      (0L, Array(1f, 0f, 1f, 0f)), // query — identical to codeword 1
      (1L, Array(0.9f, 0.1f, 1f, 0f)), // near codeword 1 in both subspaces
      (2L, Array(0f, 1f, 0f, 1f)), // matches codeword 2
      (3L, Array(0.9f, 0.1f, 0f, 1f)), // mixed: sub0→1, sub1→2
      (10L, Array(1f, 0f, 1f, 0f)),
      (20L, Array(0f, 1f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebook(emb, Seq(10L -> 1, 20L -> 2), m = 2, subDim = 2)
    assert(cb.count() == 4) // 2 subspaces × 2 codewords
    val enc = Similarity.pqEncode(emb, cb, m = 2, subDim = 2)
    val codes = enc.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(codes(1L) == ((1, 1)) && codes(2L) == ((2, 2)) && codes(3L) == ((1, 2)))
    assert(codes(10L) == ((1, 1)) && codes(20L) == ((2, 2)))
    // the encode plan must never hash-shuffle the embedding payload (same
    // discipline as assignCells/hyperplaneBucket)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    // ADC: query == codeword 1, so codes (1,1) score exactly 0.0; the
    // (1,1)-coded vectors tie and break on vec_id; the mixed code ranks
    // between full-match and full-mismatch
    val topDf = Similarity.pqAdcTopK(enc, cb, emb.where(col("vec_id") === 0L),
        queryVecId = 0L, k = 4, m = 2, subDim = 2)
    val top = topDf.collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 10L, 3L, 2L))
    assert(top(0).getDouble(3) == 0.0 && top(1).getDouble(3) == 0.0)
    assert(top(2).getDouble(3) > 0.0 && top(3).getDouble(3) > top(2).getDouble(3))
    // the ADC lookup is a pure-arithmetic element_at into the dense table —
    // NO per-row filter() scan over the broadcast array (that shape is
    // O(|table|) per candidate per subspace: a constant-factor scale-killer
    // at production ks=256, m=16)
    val adcPlan = topDf.queryExecution.executedPlan.toString
    assert(!adcPlan.contains("filter(tbl"), adcPlan)
    assert(adcPlan.contains("element_at(tbl"), adcPlan)
  }

  test("trained PQ: per-subspace L2 k-means codebook separates clusters") {
    import spark.implicits._
    // two clusters per subspace, membership chosen so the deterministic
    // seeds (vec 0 and vec 1, the lowest ids) land in DIFFERENT clusters in
    // BOTH subspaces: sub0 cluster = i%2, sub1 cluster = (i%2) xor (i/2)%2
    def a(i: Int) = i % 2
    def c(i: Int) = (i % 2) ^ ((i / 2) % 2)
    val emb = (0 until 16).map { i =>
      val av = if (a(i) == 0) Array(1f, 0f) else Array(0f, 1f)
      val bv = if (c(i) == 0) Array(1f, 0f) else Array(0f, 1f)
      val jit = 0.02f * (i / 4)
      (i.toLong, Array(av(0) + jit, av(1), bv(0), bv(1) + jit))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.pqTrainCodebook(emb, m = 2, subDim = 2, ks = 2, iters = 3)
    assert(cb.count() == 4) // 2 subspaces × 2 trained codewords
    val codes = Similarity.pqEncode(emb, cb, m = 2, subDim = 2).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    // codes must reproduce the planted sub-cluster structure, independently
    // per subspace
    (0 until 16).foreach { i =>
      assert((codes(i.toLong)._1 == codes(0L)._1) == (a(i) == 0), s"sub0 of vec $i")
      assert((codes(i.toLong)._2 == codes(0L)._2) == (c(i) == 0), s"sub1 of vec $i")
    }
    // ADC with the trained codebook: the query's own quadrant (same codes
    // as vec 0) ranks strictly before any cross-quadrant doc
    val enc = Similarity.pqEncode(emb, cb, m = 2, subDim = 2)
    val top = Similarity.pqAdcTopK(enc, cb, emb.where(col("vec_id") === 0L),
        queryVecId = 0L, k = 15, m = 2, subDim = 2).collect()
    val sameQuadrant = (1 until 16).filter(i => a(i) == 0 && c(i) == 0)
    assert(top.take(sameQuadrant.size).map(_.getLong(0)).toSet ==
      sameQuadrant.map(_.toLong).toSet)
  }

  test("IVF-PQ: residual encode keeps cell, per-cell ADC tables, probe prunes cells") {
    import spark.implicits._
    // two well-separated cells; residuals live on a ±0.1 cross around each
    // centroid, so a 2-codeword residual codebook reconstructs them exactly
    val emb = Seq(
      (0L, Array(2.1f, 0.1f, 0f, 0f)),
      (1L, Array(2.1f, -0.1f, 0f, 0f)),
      (2L, Array(0f, 0f, 2.1f, 0.1f)),
      (3L, Array(0f, 0f, 2.1f, -0.1f)),
      (9L, Array(2.1f, 0.1f, 0f, 0f)) // query — same residual as vec 0
    ).toDF("vec_id", "embedding")
    val centroids = Seq(
      (1L, Array(2f, 0f, 0f, 0f)),
      (2L, Array(0f, 0f, 2f, 0f))
    ).toDF("centroid_id", "centroid")
    val assigned = Similarity.assignCells(emb, centroids, metric = "l2")
    // residuals subtract the OWN cell's centroid, exactly
    val res = Similarity.residuals(assigned, centroids).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2).map(x => math.rint(x * 10) / 10)).toMap
    assert(res(0L) == Seq(0.1, 0.1, 0.0, 0.0))
    assert(res(2L) == Seq(0.0, 0.0, 0.1, 0.1))
    // fixed residual codebook carved from vec 0 / vec 1 residuals
    val cb = Similarity.pqCodebook(
      Similarity.residuals(assigned, centroids)
        .select(col("vec_id"), col("residual").as("embedding")),
      Seq(0L -> 1, 1L -> 2), m = 2, subDim = 2)
    val enc = Similarity.ivfPqEncode(assigned, centroids, cb, m = 2, subDim = 2)
    // the composed encode must stay map-only (assign → residual → code)
    assert(!enc.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"))
    val rows = enc.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3)))).toMap
    assert(rows(0L) == ((1L, 1, 1)) && rows(1L) == ((1L, 2, 1)))
    assert(rows(2L)._1 == 2L && rows(9L) == ((1L, 1, 1)))
    val cached = enc.cache(); cached.count()
    // nprobe=1 probes only the query's cell: cell-2 vectors never scanned;
    // the query's own residual matches codeword 1 exactly → ADC 0
    val top1 = Similarity.ivfPqTopK(cached, centroids, cb,
      emb.where(col("vec_id") === 9L), queryVecId = 9L, k = 4, nprobe = 1,
      m = 2, subDim = 2).collect()
    assert(top1.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(top1(0).getDouble(4) == 0.0 && top1(1).getDouble(4) > 0.0)
    // nprobe=2 widens to cell 2, scored off THAT cell's own distance table
    // (query residual re-anchored to centroid 2 → large but finite ADC)
    val top2 = Similarity.ivfPqTopK(cached, centroids, cb,
      emb.where(col("vec_id") === 9L), queryVecId = 9L, k = 4, nprobe = 2,
      m = 2, subDim = 2).collect()
    assert(top2.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(top2(2).getDouble(4) > top2(1).getDouble(4))
    // BATCH shape: two queries in different cells answered in one pass,
    // each probing only its own cell (nprobe=1) and scored off its own
    // per-(query, cell) table
    val batch = Similarity.ivfPqKnnJoin(cached, centroids, cb,
      emb.where(col("vec_id").isin(9L, 2L)), k = 2, nprobe = 1,
      m = 2, subDim = 2)
    val brows = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(brows == Set((9L, 0L, 1), (9L, 1L, 2), (2L, 3L, 1)))
    // two-stage refinement: ADC shortlist + exact re-rank — the final
    // ordering and distances are exact L2 within the shortlist
    val rr = Similarity.ivfPqTopKRerank(cached, centroids, cb, emb,
      queryVecId = 9L, k = 4, c = 4, nprobe = 2, m = 2, subDim = 2).collect()
    assert(rr.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    // the default-operating-point overload == the explicit form at
    // (defaultNprobe(nCells), defaultRerankWidth(k)); calling it twice
    // exercises the memoized cell count (a second call must not change
    // the result — and with a canonicalized key, not even re-count)
    val defExplicit = Similarity.ivfPqTopKRerank(cached, centroids, cb, emb,
      queryVecId = 9L, k = 2,
      c = Similarity.defaultRerankWidth(2),
      nprobe = Similarity.defaultNprobe(centroids.count().toInt),
      m = 2, subDim = 2).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    (1 to 2).foreach { _ =>
      val d = Similarity.ivfPqTopKRerank(cached, centroids, cb, emb,
        queryVecId = 9L, k = 2, m = 2, subDim = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(d == defExplicit, s"$d != $defExplicit")
    }
    assert(rr(0).getDouble(1) == 0.0)
    assert(math.abs(rr(2).getDouble(1) - 8.84) < 1e-5) // exact, not the 8.0 ADC
    // a one-query batch equals the single-query variant, ADC scores included
    val batchQ9 = Similarity.ivfPqKnnJoin(cached, centroids, cb,
      emb.where(col("vec_id") === 9L), k = 4, nprobe = 1, m = 2, subDim = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(batchQ9 == top1.map(r => (r.getLong(0), r.getDouble(4))).toSeq)
    // the per-query top-k exchange moves (query_id, vec_id, adc) triples,
    // never a vector payload
    val bplan = batch.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val bexchanges = "Exchange hashpartitioning[^\\n]*query_id[^\\n]*".r
      .findAllIn(bplan).toList
    assert(bexchanges.nonEmpty, bplan)
    bexchanges.foreach(e =>
      assert(!e.contains("embedding") && !e.contains("residual"), e))
    // dense-table ADC in both the single-query and batch plans: arithmetic
    // element_at lookups only, no per-row filter() scan over the table array
    Seq(Similarity.ivfPqTopK(cached, centroids, cb,
          emb.where(col("vec_id") === 9L), queryVecId = 9L, k = 4, nprobe = 2,
          m = 2, subDim = 2).queryExecution.executedPlan.toString,
        bplan).foreach { p =>
      assert(!p.contains("filter(tbl"), p)
      assert(p.contains("element_at(tbl"), p)
    }
    cached.unpersist()
  }

  test("length quantiles: rank-picked exact values per stratum, empty text = 0") {
    import spark.implicits._
    val d = Seq(
      (1L, "s", "a"), (2L, "s", "a b"), (3L, "s", "a b c"),
      (4L, "s", "a b c d"), (5L, "s", "a b c d e"),
      (6L, "t", "") // zero tokens
    ).toDF("doc_id", "source", "text")
    val r = TextAnalysis.lengthQuantiles(d).orderBy("source").collect()
    // n=5: p50 = value at ceil(2.5)=3rd → 3; p90 at ceil(4.5)=5th → 5
    assert(r(0).toSeq == Seq("s", 5L, 3L, 5L, 5L))
    assert(r(1).toSeq == Seq("t", 1L, 0L, 0L, 0L))
  }

  test("repetition stats: bigram totals, distinct count, top frequency") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b a b a"), // bigrams: "a b","b a","a b","b a" → 4 total, 2 uniq, top 2
      (2L, "x y z"), // 2 total, 2 uniq, top 1
      (3L, "solo") // no bigrams: drops out (and must not throw on explode)
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(d).orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) == ((4L, 2L, 2L)))
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3)) == ((2L, 2L, 1L)))
  }

  test("vocab coverage: deterministic cut, exact counts, broadcast probe") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b b c"),   // freqs: a=3 b=2 c=1(+doc2) d=1
      (2L, "c d a"),
      (3L, "")               // empty text: zero tokens, still reported? no rows
    ).toDF("doc_id", "text")
    // vocabSize=2 → counts a=4, b=2, c=2, d=1; tie b/c at 2 breaks
    // lexicographically → vocab = {a, b}
    val r = TextAnalysis.vocabCoverage(docs, vocabSize = 2)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 6L, 5L), (2L, 3L, 1L)))
    // the corpus-side probe broadcasts the vocab — no shuffle on the token
    val plan = TextAnalysis.vocabCoverage(docs, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("winnow overlap: matches brute force, boilerplate capped, no self-join") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val boiler = " COMMON-FOOTER-TEXT-IN-EVERY-DOC"
    val docs = Seq(
      (1L, s"alpha $shared beta$boiler"),
      (2L, s"gamma $shared delta$boiler"), // shares the fox span with 1
      (3L, s"completely unrelated content about spark plans here$boiler"),
      (4L, s"another independent document with its own words$boiler")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(docs, k = 8, w = 4)
    val got = TextAnalysis.winnowOverlapPairs(fps, minShared = 2, maxDocsPerFp = 3)
      .as[(Long, Long, Long)].collect().toSet
    // brute force from the same fingerprints, same boilerplate cap
    val rows = fps.as[(Long, String)].collect()
    val byFp = rows.groupBy(_._2).filter(_._2.length <= 3)
    val expected = byFp.values.flatMap { ds =>
      val ids = ds.map(_._1).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
    }.groupBy(identity).map { case (p, v) => (p._1, p._2, v.size.toLong) }
      .filter(_._3 >= 2L).toSet
    assert(got == expected, s"got $got vs $expected")
    // the copied span pairs 1-2; the boilerplate footer (in all 4 docs,
    // over the cap) must not pair 3 or 4 with anything
    assert(got.exists(p => p._1 == 1L && p._2 == 2L))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L))
    // pair expansion is map-side from grouped lists: no join operator
    val plan = TextAnalysis.winnowOverlapPairs(fps, 2, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("pii scan: exact counts, ordered redaction, map-only plan") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail a@b.co and c.d+x@e.org, call 555-123-4567 from 10.0.0.1 ok"),
      (2L, "version 1.2.3.4 is an ip shape; v1.2 is not"),
      (3L, "clean text with no identifiers at all"),
      (4L, "reach 555-123-4567@corp.co or 555-123-4567")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.piiScan(d).orderBy("doc_id").collect()
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) == ((2L, 1L, 1L)))
    assert(r(0).getString(4) ==
      "mail [EMAIL] and [EMAIL], call [PHONE] from [IP] ok")
    // dotted quads match the IPv4 SHAPE even mid-version-string — the scan
    // counts candidates, it does not validate octet ranges
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3)) == ((0L, 0L, 1L)))
    assert(r(2).getString(4) == "clean text with no identifiers at all")
    // a phone shape INSIDE an email local part counts once (as the email):
    // counts are staged on progressively-redacted text, so each count
    // reconciles with its placeholder occurrences in `redacted`
    assert((r(3).getLong(1), r(3).getLong(2), r(3).getLong(3)) == ((1L, 1L, 0L)))
    assert(r(3).getString(4) == "reach [EMAIL] or [PHONE]")
    // per-row regex work only: no exchange anywhere in the plan
    val plan = TextAnalysis.piiScan(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("split leakage: straddling pairs flagged; quarantine closes in one pass") {
    import graft.llm.Sampling
    import spark.implicits._
    // hand-labeled splits + a crafted pair artifact: (1,2) and (3,4)
    // straddle, (2,3) is val-internal, (1,4) train-internal
    val splits = Seq((1L, "train"), (2L, "val"), (3L, "val"), (4L, "train"))
      .toDF("doc_id", "split")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("doc_a", "doc_b")
    val leaks = Sampling.splitLeakage(splits, pairs)
      .orderBy("doc_a").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(leaks.toSeq == Seq((1L, 2L), (3L, 4L)))

    // quarantine DROPS the leaked val side (2 and 3): re-assignment to
    // train could chain-leak, removal cannot — the audit over the
    // surviving train/val labels is empty in one pass
    val post = Sampling.quarantineLeakedVal(splits, pairs)
    assert(post.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      == Map(1L -> "train", 2L -> "quarantined", 3L -> "quarantined", 4L -> "train"))
    assert(Sampling.splitLeakage(
      post.where(col("split") =!= "quarantined"), pairs).count() == 0)

    // splitAssign is a deterministic pure map with both labels present
    val docs = (0 until 256).map(i => (i.toLong, "x")).toDF("doc_id", "text")
    val assigned = Sampling.splitAssign(docs)
    assert(assigned.collect().toSeq == Sampling.splitAssign(docs).collect().toSeq)
    val bySplit = assigned.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val") && bySplit("train") > bySplit("val"))
    assert(!Sampling.splitAssign(docs).queryExecution.executedPlan.toString
      .contains("Exchange"))
    // the threshold format is validated up-front: anything but two
    // lowercase hex digits would silently compare wrong lexicographically
    Seq("CC", "c", "0xcc", "zz", "").foreach { bad =>
      val e = intercept[IllegalArgumentException] {
        Sampling.splitAssign(docs, trainThreshold = bad)
      }
      assert(e.getMessage.contains("lowercase hex"), s"$bad: ${e.getMessage}")
    }
  }

  test("corpus diff: four statuses from hash projections only") {
    import graft.llm.Dedup
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val b = Seq((1L, "x"), (2L, "y2"), (4L, "w")).toDF("doc_id", "text")
    val got = Dedup.corpusDiff(a, b).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    // only (id, hash) projections reach the join: each join input's output
    // is exactly (doc_id, hash) — the text payload never crosses the shuffle
    val opt = Dedup.corpusDiff(a, b).queryExecution.optimizedPlan
    val joins = opt.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      Seq(j.left, j.right).foreach { side =>
        val names = side.output.map(_.name).toSet
        assert(!names.contains("text"), s"text leaked into join input: $names")
        assert(names.size == 2 && names.contains("doc_id"), names.toString)
      }
    }
    val plan = Dedup.corpusDiff(a, b).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("corpus drift: integer cross-multiplied shift ranks moved terms first") {
    import graft.llm.TextAnalysis
    import spark.implicits._
    // a: 4 tokens (x x y z), b: 4 tokens (x y y w) -> N_a = N_b = 4.
    // shift = |cnt_a*4 - cnt_b*4|: x=4, y=4, z=4, w=4 ... make asymmetric:
    val a = Seq("x x y z").toDF("text")
    val b = Seq("x y y y").toDF("text")
    val drifted = TextAnalysis.corpusDrift(a, b, k = 10)
    // overflow-proof score: the cross-multiply runs in Decimal(38,0) (LongType
    // wraps past ~3e9 tokens/snapshot and corrupts the top-k), but the
    // published column is the stable LongType schema with a fail-loud guard
    assert(drifted.schema("shift").dataType ==
      org.apache.spark.sql.types.LongType, drifted.schema.treeString)
    val planStr = drifted.queryExecution.analyzed.toString.toLowerCase
    assert(planStr.contains("raise_error"), planStr)
    val got = drifted.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // N_a=4, N_b=4: shifts -> x: |2*4-1*4|=4, y: |1*4-3*4|=8, z: |1*4-0|=4, w absent
    assert(got.toList == List(("y", 1L, 3L, 8L), ("x", 2L, 1L, 4L), ("z", 1L, 0L, 4L)))
    // the vocab-sized totals are broadcast, never shuffled with the join
    val plan = TextAnalysis.corpusDrift(a, b, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("retention cohorts: hand-built matrix matches; stream collapses before the join") {
    import graft.streaming.EventStreams
    import spark.implicits._
    // period = 10: user 1 first seen period 0, active 0 and 2; user 2 first
    // seen 0, active 0 only (3 raw events); user 3 first seen 2, active 2, 3
    val ev = Seq(
      (1L, 5L), (1L, 25L),
      (2L, 7L), (2L, 8L), (2L, 9L),
      (3L, 21L), (3L, 29L), (3L, 35L)).toDF("user_id", "ts")
    val got = EventStreams.retentionCohorts(ev, periodNanos = 10L)
      .orderBy("cohort", "period_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 2L), (0L, 2L, 1L), (2L, 0L, 1L), (2L, 1L, 1L)))
    // plan: every exchange keys on the user (aggregates + join) or the
    // final (cohort, offset) rollup — the raw stream never shuffles twice
    val plan = EventStreams.retentionCohorts(ev, 10L)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("partial"), plan)
  }

  test("interval join: equals the naive range join, plans as an equi-join, span guard fails loudly") {
    import graft.streaming.EventStreams
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (0 until 400).map(i => (i.toLong % 5, i.toLong, rnd.nextInt(10000).toLong))
      .toDF("k", "pid", "t")
    val ivs = (0 until 60).map { i =>
      val lo = rnd.nextInt(9500).toLong
      (i.toLong % 5, i.toLong, lo, lo + rnd.nextInt(500).toLong)
    }.toDF("k", "iid", "lo", "hi")
    val got = EventStreams.pointInIntervalJoin(pts, ivs, Seq("k"), "t", "lo", "hi",
        bucketWidth = 500L)
      .select("k", "pid", "iid").as[(Long, Long, Long)].collect().toSet
    val want = pts.as("p").join(ivs.as("i"),
        $"p.k" === $"i.k" && $"p.t" >= $"i.lo" && $"p.t" <= $"i.hi")
      .select($"p.k", $"p.pid", $"i.iid").as[(Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    // plan shape: equi-join on (k, bucket) — never a nested loop or
    // cartesian product (what the naive BETWEEN condition plans as)
    val plan = EventStreams.pointInIntervalJoin(pts, ivs, Seq("k"), "t", "lo", "hi", 500L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
    // an interval spanning more buckets than allowed fails loudly in-plan
    val wide = Seq((1L, 1L, 0L, 10000L)).toDF("k", "iid", "lo", "hi")
    val e = intercept[Exception] {
      EventStreams.pointInIntervalJoin(pts, wide, Seq("k"), "t", "lo", "hi", 500L).count()
    }
    assert(e.getMessage != null || e.getCause != null)
    // an INVERTED interval (hi < lo) fails loudly BEFORE the bucket
    // sequence: sequence(lo, hi) with hi < lo generates a descending list
    // (implicit step −1), so a deeply-inverted interval would otherwise
    // materialize a huge bucket explosion under a negative span the
    // max-span check can't see
    val inverted = Seq((1L, 1L, 5000L, -4000000000L)).toDF("k", "iid", "lo", "hi")
    val ei = intercept[Exception] {
      EventStreams.pointInIntervalJoin(pts, inverted, Seq("k"), "t", "lo", "hi", 500L).count()
    }
    val msg = Option(ei.getMessage).getOrElse("") +
      Option(ei.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("inverted interval"), msg)
  }

  test("interval join: exact at epoch-nano magnitudes (above double's 2^53 range)") {
    import graft.streaming.EventStreams
    import spark.implicits._
    // timestamps ~2^62 with a width small enough that the BUCKET ids
    // themselves exceed double's 2^53 exact range: double bucketing drifts
    // off floor(t/W) on most values here (verified by the probe below),
    // and the join must still equal the naive range join exactly
    val w = 101L
    val base = 1L << 62
    val drift = (0 until 10000).iterator.map(i => base + i.toLong)
      .find(t => math.floor(t.toDouble / w).toLong != Math.floorDiv(t, w))
    assert(drift.nonEmpty, "no double-drift candidate found — widen the search")
    val rnd = new scala.util.Random(11)
    val ts = (drift.get +: (0 until 50).map(_ => base + math.abs(rnd.nextLong()) % (8 * w)))
    val pts = ts.zipWithIndex.map { case (t, i) => (1L, i.toLong, t) }.toDF("k", "pid", "t")
    val ivs = (0 until 20).map { i =>
      val lo = base + math.abs(rnd.nextLong()) % (8 * w)
      (1L, i.toLong, lo, lo + math.abs(rnd.nextLong()) % (2 * w))
    }.toDF("k", "iid", "lo", "hi")
    val got = EventStreams.pointInIntervalJoin(pts, ivs, Seq("k"), "t", "lo", "hi", w,
        maxBucketsPerInterval = 4)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = pts.as("p").join(ivs.as("i"),
        $"p.k" === $"i.k" && $"p.t" >= $"i.lo" && $"p.t" <= $"i.hi")
      .select($"p.pid", $"i.iid").as[(Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty, s"got=${got.size} want=${want.size}")
    // the FULL long domain: timestamps within bucketWidth of Long.MinValue
    // (a pmod-subtract floor formulation wraps there and drops the pair)
    val ptsMin = Seq((1L, 1L, Long.MinValue + 5L)).toDF("k", "pid", "t")
    val ivsMin = Seq((1L, 9L, Long.MinValue, Long.MinValue + 50L))
      .toDF("k", "iid", "lo", "hi")
    assert(EventStreams.pointInIntervalJoin(ptsMin, ivsMin, Seq("k"), "t", "lo", "hi", w)
      .select("pid", "iid").as[(Long, Long)].collect().toList == List((1L, 9L)))
  }

  test("data card: integer metrics match hand counts; dup window runs over contents, payload never shuffles") {
    import graft.llm.TextAnalysis
    import spark.implicits._
    // src A: two copies of the same content (one dup pair), one quality doc
    // src B: one copy of A's content (cross-source dup!), one unique junk doc
    val good = "the quick brown fox jumps over the lazy dog today fine"
    val docs = Seq(
      (1L, "A", good), (2L, "A", good), (3L, "A", "x y"),
      (4L, "B", good), (5L, "B", "zz zz zz")).toDF("doc_id", "source", "text")
    val card = TextAnalysis.dataCard(docs).orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // A: 3 docs, 11+11+2 tokens, 2 quality (good has stopword+length+uniq
    // ratio 10/11 -> (0.909+1+1)/3 = 0.97; "x y" is short, no stopword,
    // ratio 1 -> 0.33), 2 dup docs (both copies of good; its content
    // appears 3x globally), 2 distinct contents
    assert(card(0) == ("A", 3L, 24L, 2L, 2L, 2L))
    // B: 2 docs, 11+3 tokens, 1 quality, 1 dup doc (the cross-source copy
    // counts), 2 distinct contents
    assert(card(1) == ("B", 2L, 14L, 1L, 1L, 2L))
    // scale shape: three exchanges in the final plan — (h, source) fold,
    // the content window, the source rollup — and none of them carries the
    // text payload (it dies in the first partial aggregate)
    val plan = TextAnalysis.dataCard(docs).queryExecution.executedPlan
      .toString.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
    assert(exchanges.length == 3, plan)
    assert(exchanges.forall(!_.contains("text")), exchanges.mkString("\n"))
  }

  test("epoch shuffle: dense global rank equals the naive window, no corpus single-partition stage") {
    import graft.llm.Sampling
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val docs = (0 until 500).map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    val ord = Sampling.epochOrder(docs, epoch = 1).cache()
    // dense 0..n-1
    val n = ord.count()
    assert(n == 500)
    assert(ord.agg(min("position"), max("position"), countDistinct("position"))
      .as[(Long, Long, Long)].head() == (0L, 499L, 500L))
    // exactly the naive unpartitioned-window spec (the thing we refuse to
    // run at scale), tie-broken identically
    val naive = docs.select(col("doc_id"),
        md5(concat(lit("epoch1:"), col("doc_id").cast("string"))).as("k"))
      .withColumn("naive_pos",
        row_number().over(Window.orderBy(col("k"), col("doc_id"))).cast("long") - 1L)
      .select("doc_id", "naive_pos")
    assert(ord.join(naive, Seq("doc_id"))
      .where(col("position") =!= col("naive_pos")).count() == 0)
    // a new epoch is a different permutation; the same epoch is stable
    assert(Sampling.epochOrder(docs, epoch = 2)
      .withColumnRenamed("position", "pos2").join(ord, Seq("doc_id"))
      .where(col("pos2") =!= col("position")).count() > 0)
    assert(Sampling.epochOrder(docs, epoch = 1)
      .withColumnRenamed("position", "pos1").join(ord, Seq("doc_id"))
      .where(col("pos1") =!= col("position")).count() == 0)
    // scale shape: NO single-partition exchange anywhere — the offsets
    // frame rides a constant-key hash partitioning (tiny, and free of the
    // WindowExec unpartitioned warning), the corpus rides shard-keyed
    // exchanges plus one broadcast join (AQE's toString repeats every node
    // in its "Initial Plan" section, so count within the final plan only)
    val plan = Sampling.epochOrder(docs, epoch = 1)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange SinglePartition".r.findAllIn(plan).isEmpty, plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    // positions are BIT-IDENTICAL across shard widths: _shard is a prefix
    // of the sort key _k, so (shard, _k, id) order == (_k, id) order — the
    // property that lets a deployment widen rank parallelism 16× per extra
    // hex char without perturbing any training order
    (1 to 3).foreach { w =>
      assert(Sampling.epochOrder(docs, epoch = 1, shardChars = w)
        .withColumnRenamed("position", "pw").join(ord, Seq("doc_id"))
        .where(col("pw") =!= col("position")).count() == 0, s"shardChars=$w")
    }
    // sparse shards (17 docs leave hex prefixes unpopulated): offsets are
    // computed from actual counts, so density still holds
    val few = (0 until 17).map(i => (i.toLong, "y")).toDF("doc_id", "text")
    assert(Sampling.epochOrder(few, epoch = 1)
      .agg(min("position"), max("position"), countDistinct("position"))
      .as[(Long, Long, Long)].head() == (0L, 16L, 17L))

    // resumable slice: identical to filtering the full order, and the
    // rank window only ever sees the shards intersecting the slice
    val slice = Sampling.epochSlice(docs, from = 200L, until = 250L, epoch = 1)
    val expected = ord.where(col("position") >= 200 && col("position") < 250)
    assert(slice.count() == 50)
    assert(slice.withColumnRenamed("position", "p").join(expected, Seq("doc_id"))
      .where(col("p") =!= col("position")).count() == 0)
    // shard pruning is real: a 50/500 slice lives in a strict subset of
    // the 256 default shards (those are the only rows the rank window
    // sees — the offsets frame is filtered to intersecting shards before
    // the join); a contiguous position range maps to a contiguous run of
    // hex prefixes, so even the coarse 1-char projection stays partial
    val shardsHit = slice
      .select(substring(md5(concat(lit("epoch1:"), col("doc_id").cast("string"))), 1, 1))
      .distinct().count()
    assert(shardsHit < 16, s"slice of 50/500 should not touch all 16 coarse shards")
    // boundary slices: first row, and a slice running past the end
    assert(Sampling.epochSlice(docs, 0L, 1L, epoch = 1)
      .select("position").as[Long].collect().toSeq == Seq(0L))
    assert(Sampling.epochSlice(docs, 490L, 9999L, epoch = 1).count() == 10)
    ord.unpersist()
  }

  test("stratified sampling: deterministic, stratum-scoped, rate-proportional") {
    import graft.llm.Sampling
    import spark.implicits._
    val docs = (0 until 512).map(i => (i.toLong, s"s${i % 2}")).toDF("doc_id", "source")
    val thr = when(col("source") === "s0", "80").otherwise("zz")
    val report = Sampling.mixReport(docs, "source", thr).orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(report.map(t => (t._1, t._2)).toSeq == Seq(("s0", 256L), ("s1", 256L)))
    val (s0kept, s1kept) = (report(0)._3, report(1)._3)
    assert(s1kept == 256L) // "zz" threshold keeps everything
    assert(s0kept > 256 * 0.3 && s0kept < 256 * 0.7, s"50% stratum kept $s0kept")
    // the sample IS the reported population (same predicate), and re-running
    // reproduces it exactly (salted hash, no RNG state)
    val sampled = Sampling.stratifiedSample(docs, thr).select("doc_id").as[Long].collect()
    assert(sampled.length == s0kept + s1kept)
    val again = Sampling.stratifiedSample(docs, thr).select("doc_id").as[Long].collect()
    assert(sampled.sorted.sameElements(again.sorted))
  }

  test("sequence packing: per-stream running offsets and chunk boundaries") {
    import graft.llm.Sampling
    import spark.implicits._
    val d = Seq(
      (1L, "a", ("w " * 3).trim), // 3 tokens → offset 0, bin 0
      (2L, "a", ("w " * 4).trim), // offset 3, bin 0
      (3L, "a", ("w " * 2).trim), // offset 7, bin 1 (capacity 5)
      (4L, "b", ("w " * 9).trim) // separate stream: offset 0, bin 0
    ).toDF("doc_id", "source", "text")
    val r = Sampling.packSequences(d, capacity = 5).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq((1L, 3L, 0L, 0L), (2L, 4L, 3L, 0L), (3L, 2L, 7L, 1L), (4L, 9L, 0L, 0L)))
    // empty / multi-space docs count ZERO tokens (ADVICE r5: split("")
    // yields [""] — the filtered count must not fabricate offsets)
    val e = Sampling.packSequences(Seq(
        (1L, "a", ""), (2L, "a", "x  y"), (3L, "a", " ")
      ).toDF("doc_id", "source", "text"), capacity = 5)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(2), x.getLong(3)))
    assert(e.toSeq == Seq((0L, 0L), (2L, 0L), (0L, 2L)))
  }

  test("sequence packing: hierarchical == single-window for random ids and widths") {
    import graft.llm.Sampling
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { trial =>
      // distinct ids with gaps, NEGATIVE ids included (truncating DIV must
      // still yield non-decreasing, range-contiguous sub-streams), random
      // token counts including zero
      val docs = (0 until 60).map { i =>
        (i.toLong * 997 - 20000 + rnd.nextInt(900),
          s"s${rnd.nextInt(2)}", ("w " * rnd.nextInt(5)).trim)
      }.toDF("doc_id", "source", "text")
      val wide = Sampling.packSequences(docs, capacity = 7)
        .orderBy("source", "doc_id").collect().toSeq
      for (width <- Seq(1L, 13L, 1000L, 50000L)) {
        val split = Sampling.packSequences(docs, capacity = 7, subStreamWidth = width)
          .orderBy("source", "doc_id").collect().toSeq
        assert(split == wide, s"trial $trial width $width diverged")
      }
    }
  }

  test("sequence packing: one dominant stream splits across sub-streams, offsets exact") {
    import graft.llm.Sampling
    import spark.implicits._
    // ONE stream, 100 docs, doc_id gaps included — the pretraining shape
    // where stream-keyed windows would serialize the whole corpus onto one
    // partition
    val docs = (0 until 100).map(i =>
      (i.toLong * 3, "mono", ("w " * (1 + i % 7)).trim)).toDF("doc_id", "source", "text")
    val wide = Sampling.packSequences(docs, capacity = 16) // single window
    val split = Sampling.packSequences(docs, capacity = 16, subStreamWidth = 30L)
    // offsets are BIT-IDENTICAL to the single-window form for any width
    assert(split.orderBy("doc_id").collect().toSeq ==
      wide.orderBy("doc_id").collect().toSeq)
    // and the heavy window really partitions by (stream, sub): 10 ranges of
    // 30 ids → the payload exchange keys on _sub, not on the stream alone
    val plan = split.queryExecution.executedPlan.toString
    assert(plan.contains("_sub"), plan)
    assert("hashpartitioning\\(source[^)]*_sub".r.findFirstIn(plan).isDefined, plan)
    // the stitch join's two branches must SHARE the tokenize+shuffle stage
    // (canonically identical subtrees → AQE stage reuse): exactly one scan
    // of the corpus in the EXECUTED final plan, not one per branch (reuse
    // happens at runtime — collect first)
    split.collect()
    val finalPlan = split.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("LocalTableScan".r.findAllIn(finalPlan).length == 1, finalPlan)
  }

  test("benchmark decontamination: overlapping shingles counted, clean docs zero") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat on the mat and more words here"), // shares 8-grams
      (2L, "qqqq wwww eeee rrrr completely disjoint text")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = Dedup.benchmarkOverlap(Dedup.charGrams(corpus), Dedup.charGrams(bench))
      .orderBy("doc_id").collect()
    assert(r.length == 2)
    // doc 1 contains the benchmark's full text minus edges: every benchmark
    // 8-gram appears in it
    val benchGramCount = Dedup.charGrams(bench).count()
    assert(r(0).getLong(2) == benchGramCount)
    assert(r(0).getLong(1) > r(0).getLong(2)) // plus its own extra grams
    assert(r(1).getLong(2) == 0L && r(1).getLong(1) > 0L)

    // the Bloom-prefiltered two-phase form is EXACTLY equal (no false
    // negatives by construction, FPs killed by the verify join) — probe a
    // deliberately tiny m so collisions are plentiful and the verify path
    // is genuinely exercised, not vacuously clean. exactMaxBytes=0 forces
    // the Bloom path (the size cut-over would otherwise delegate straight
    // to benchmarkOverlap on fixture-sized inputs); m=100 covers the
    // PARTIAL final bitmap word (m % 64 != 0), whose floor-sized array
    // used to drop bits 64..99 at build — silent false negatives.
    val exact = Dedup.benchmarkOverlap(Dedup.charGrams(corpus), Dedup.charGrams(bench))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.decontam.exactMaxBytes", "0")
    try {
      Seq(1 << 16, 1000, 100, 64, 8).foreach { m =>
        val pre = Dedup.benchmarkOverlapPrefiltered(
            Dedup.charGrams(corpus), Dedup.charGrams(bench), k = 4, m = m)
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
        assert(pre == exact, s"m=$m diverged: $pre vs $exact")
      }
      // plan shape: the corpus side never SortMergeJoins against the
      // benchmark — the register probe and the verified-hit probe are both
      // broadcast, so the gram stream crosses no gram-keyed exchange
      val plan = Dedup.benchmarkOverlapPrefiltered(
          Dedup.charGrams(corpus), Dedup.charGrams(bench))
        .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
    } finally spark.conf.unset("spark.graft.decontam.exactMaxBytes")
    // default conf: fixture-sized bench grams sit under the cut-over, the
    // operator delegates to the exact broadcast form — same rows
    val cut = Dedup.benchmarkOverlapPrefiltered(
        Dedup.charGrams(corpus), Dedup.charGrams(bench))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(cut == exact, s"cut-over path diverged: $cut vs $exact")
  }

  test("kmeans-trained IVF: pure clusters, stable assignment, nprobe=1 recall") {
    import graft.llm.Similarity
    import spark.implicits._
    // three well-separated direction clusters in 4-d, 8 vectors each,
    // with small deterministic jitter
    val base = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val vecs = (0 until 24).map { i =>
      val c = i % 3
      val jit = 0.01f * ((i / 3) % 5)
      val v = base(c).clone()
      v((c + 1) % 4) += jit
      (i.toLong, v)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val centroids = Similarity.kmeansCentroids(emb, k = 3, iters = 3)
    assert(centroids.count() == 3)
    val assigned = Similarity.assignCells(emb, centroids)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // purity: cluster-mates share a cell, different clusters differ
    (0 until 24).foreach { i =>
      assert(assigned(i.toLong) == assigned((i % 3).toLong), s"vec $i strayed")
    }
    assert(Set(assigned(0L), assigned(1L), assigned(2L)).size == 3)
    // one more Lloyd round changes nothing (converged fixture)
    val again = Similarity.assignCells(emb,
      Similarity.kmeansCentroids(emb, k = 3, iters = 4))
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again == assigned)
    // nprobe=1 IVF returns exactly the brute-force top-k for an in-cluster
    // query (the other clusters are orthogonal - recall 1.0 here)
    val withCells = Similarity.assignCells(emb, centroids)
    val ivf = Similarity.ivfTopK(withCells, centroids, queryVecId = 0L, k = 5, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, queryVecId = 0L, k = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf == brute)
    // the deterministic (sorted-fold) update: bit-identical centroids across
    // independent trainings, and the same cluster structure as avg mode
    def train() = Similarity.kmeansCentroids(emb, k = 3, iters = 2, deterministic = true)
      .orderBy("centroid_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toVector))
    val first = train()
    assert(first.sameElements(train())) // exact float equality, run to run
    val detAssigned = Similarity.assignCells(emb,
      Similarity.kmeansCentroids(emb, k = 3, iters = 3, deterministic = true))
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(detAssigned == assigned)
  }

  test("chunk dedup: shared tiles dropped everywhere, unique docs reconstruct exactly") {
    val corpus = Seq(
      (1L, "a b c d e f g h"),             // tiles: "a b c d", "e f g h"
      (2L, "a b c d x y z w"),             // shares tile "a b c d" with doc 1
      (3L, "p q r s t u v")                // unique tiles (incl. short tail "t u v")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(Dedup.tokenTiles(corpus, n = 4))
      .orderBy("doc_id").collect()
    // doc 1: "a b c d" duplicated (appears in doc 2) → only "e f g h" kept
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 1)
    assert(out(0).getString(3) == "e f g h")
    assert(out(1).getString(3) == "x y z w")
    // doc 3 has no duplicated tile → retained text IS the original text,
    // including the 3-token tail tile
    assert(out(2).getLong(2) == 0 && out(2).getString(3) == "p q r s t u v")
  }

  test("chunk dedup reconstruction property: dup-free corpus survives unchanged") {
    val rng = new scala.util.Random(7)
    // random token-soup docs over a large vocab → tiles effectively unique
    val docsGen = (1 to 30).map { i =>
      val nTok = 1 + rng.nextInt(17)
      (i.toLong, (0 until nTok).map(_ => s"w${rng.nextInt(100000)}").mkString(" "))
    }
    val df = docsGen.toDF("doc_id", "text")
    val out = Dedup.chunkDedup(Dedup.tokenTiles(df, n = 4))
      .select("doc_id", "retained_text").as[(Long, String)].collect().toMap
    docsGen.foreach { case (id, text) => assert(out(id) == text, s"doc $id") }
  }

  test("cross-set candidates pair the batch against the index only") {
    val corpus = Seq(
      (1L, "the cat sat on the mat and looked at the dog"),
      (5L, "the cat sat on the mat and looked at the dog"),  // batch dup of 1
      (2L, "der hund und das pferd liefen durch der wald"),
      (10L, "completely unrelated text about spark engines")  // batch, no match
    ).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(corpus, shingle = 8, numHashes = 4)
    val cand = Dedup.crossSetCandidates(
      sigs.where($"doc_id" % 5 =!= 0), sigs.where($"doc_id" % 5 === 0),
      bands = 2, rowsPerBand = 2)
      .as[(Long, Long)].collect().toSet
    assert(cand == Set((5L, 1L)))  // batch doc 5 matches index doc 1; 10 matches nothing
    // and no index-index pair (1,2) can appear by construction
  }

  test("hard negatives: nearest other-label only, same-label never surfaces") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.99f, 0.1f), 1),   // same label as 0: must never appear for query 0
      (2L, Array(0.9f, 0.2f), 2),    // closest other-label
      (3L, Array(0.0f, 1.0f), 2)     // far other-label
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(emb.where($"vec_id" === 0), emb, k = 2)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(out == Set((0L, 2L, 1), (0L, 3L, 2)))
    // the scored exchange never carries the embedding payload
    val plan = Similarity.hardNegatives(emb.where($"vec_id" === 0), emb, k = 2)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning[^\n]*".r.findAllIn(plan).toList
    assert(exchanges.nonEmpty && exchanges.forall(!_.contains("qe")), plan)
  }

  test("contrastive tuples: one positive, k hard negatives, one corpus pass") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.99f, 0.1f), 1),   // nearest same-label → THE positive
      (2L, Array(0.5f, 0.5f), 1),    // same label but farther: excluded (only 1 pos)
      (3L, Array(0.9f, 0.2f), 2),    // hard negative 1
      (4L, Array(0.0f, 1.0f), 2)     // hard negative 2
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.contrastiveTuples(emb.where($"vec_id" === 0), emb, kNeg = 2)
      .select("query_id", "role", "vec_id", "rank")
      .as[(Long, String, Long, Int)].collect().toSet
    assert(out == Set((0L, "pos", 1L, 1), (0L, "neg", 3L, 1), (0L, "neg", 4L, 2)))
  }

  test("span dedup: duplicated spans masked at any offset, short docs untouched") {
    val corpus = Seq(
      (1L, "a b c d e f g"),   // shares span "c d e f g" at pos 2
      (2L, "z c d e f g y"),   // ...same span at pos 1 — different alignment
      (3L, "m n o p")          // shorter than n: no windows, fully retained
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(corpus, n = 5).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 7L, 5L, "a b")))
    assert(out(1) == ((2L, 7L, 5L, "z y")))
    assert(out(2) == ((3L, 4L, 0L, "m n o p")))
    // the tiled form would MISS this: doc 2's span starts mid-tile
    val tiled = Dedup.chunkDedup(Dedup.tokenTiles(corpus, n = 5))
      .orderBy("doc_id").select("n_dup_tiles").as[Long].collect()
    assert(tiled.sameElements(Array(0L, 0L, 0L)))
  }

  test("span coverage dominates tile coverage (property, injected duplicates)") {
    // every position of a duplicated FULL-LENGTH tile is, by construction,
    // covered by the identical stride-1 WINDOW starting at the tile offset —
    // so for the same n, span dedup must cover at least n × n_dup_tiles
    // positions in every document. Doc lengths are kept multiples of n
    // (partial tail tiles are not windows, so the bound holds only for
    // full tiles); a violation means one of the two operators mis-keys its
    // duplication test
    val rng = new scala.util.Random(11)
    val shared = (0 until 10).map(i => s"dup$i").mkString(" ") // an injected 10-token run
    val docsGen = (1 to 40).map { i =>
      val base = (0 until 5 * (1 + rng.nextInt(3))).map(_ => s"w${rng.nextInt(50)}").mkString(" ")
      // a third of the docs embed the shared run at a random-parity offset
      (i.toLong, if (i % 3 == 0) {
        if (rng.nextBoolean()) s"$shared $base" else s"$base $shared"
      } else base)
    }
    val df = docsGen.toDF("doc_id", "text")
    val n = 5
    val tiles = Dedup.chunkDedup(Dedup.tokenTiles(df, n))
      .select("doc_id", "n_dup_tiles").as[(Long, Long)].collect().toMap
    val spans = Dedup.spanDedup(df, n)
      .select("doc_id", "n_covered").as[(Long, Long)].collect().toMap
    assert(docsGen.exists { case (id, _) => spans(id) > 0 }) // dups actually injected
    docsGen.foreach { case (id, _) =>
      assert(spans(id) >= n * tiles(id),
        s"doc $id: covered=${spans(id)} < $n*dupTiles=${tiles(id)}")
    }
  }

  test("span/chunk dedup: a window duplicated across 50k docs streams through the spillable frame") {
    // the r15 skew guard (guide §5): r14's collect_list(struct(id, pos))
    // form put EVERY occurrence of a boilerplate window into ONE
    // aggregation-buffer array — unspillable and unbounded at web-corpus
    // scale. The window-aggregate form buffers the hot group in WindowExec's
    // spillable row array (past spark.sql.windowExec.buffer.spill.threshold
    // = 4096 rows this group spills to disk) and never materializes an
    // occurrence array. One window shared by all 50k docs exercises exactly
    // that path; the output is pinned per doc.
    val boiler = "x1 x2 x3 x4 x5"
    val docs = spark.range(50000).select($"id".as("doc_id"),
      concat(lit(boiler + " u"), $"id".cast("string")).as("text"))
    val spans = Dedup.spanDedup(docs, n = 5)
    assert(spans.where($"n_tokens" =!= 6L || $"n_covered" =!= 5L ||
      $"retained_text" =!= concat(lit("u"), $"doc_id".cast("string"))).isEmpty)
    assert(spans.count() == 50000L)
    val chunks = Dedup.chunkDedup(Dedup.tokenTiles(docs, n = 5))
    assert(chunks.where($"n_tiles" =!= 2L || $"n_dup_tiles" =!= 1L ||
      $"retained_text" =!= concat(lit("u"), $"doc_id".cast("string"))).isEmpty)
    assert(chunks.count() == 50000L)
  }

  test("new-operator plan shapes: keyed exchanges only, no cartesian anywhere") {
    val corpus = (1 to 40).map(i => (i.toLong, s"tok$i a b c d e f g")).toDF("doc_id", "text")
    // chunk dedup: every join is an equi-join on the tile / doc key — a
    // cartesian or nested-loop fallback would be O(corpus²) at scale
    val cPlan = Dedup.chunkDedup(Dedup.tokenTiles(corpus, n = 4))
      .queryExecution.executedPlan.toString
    assert(!cPlan.contains("CartesianProduct") && !cPlan.contains("BroadcastNestedLoopJoin"), cPlan)
    // incremental candidates: exactly ONE join (batch bands vs index
    // bands) — a second join would mean the index got self-paired
    val sigs = Dedup.minhashSignatures(corpus, shingle = 8, numHashes = 4)
    val iPlan = Dedup.crossSetCandidates(
        sigs.where($"doc_id" % 5 =!= 0), sigs.where($"doc_id" % 5 === 0),
        bands = 2, rowsPerBand = 2)
      .queryExecution.executedPlan.toString
    assert("Join".r.findAllIn(iPlan.replace("JoinExec", "Join")).size >= 1)
    assert(!iPlan.contains("CartesianProduct") && !iPlan.contains("BroadcastNestedLoopJoin"), iPlan)
    // funnel: every hash exchange keys on user_id — the funnel never
    // shuffles on anything except its join/aggregation key
    val events = Seq((1L, "view", 100L), (1L, "purchase", 150L)).toDF("user_id", "event_type", "ts")
    val fPlan = graft.streaming.EventStreams.funnel(events, "view", "purchase")
      .queryExecution.executedPlan.toString
    "Exchange hashpartitioning\\(([a-z_]+)".r.findAllMatchIn(fPlan).foreach { m =>
      assert(m.group(1) == "user_id", fPlan)
    }
  }

  test("funnel: earliest view, earliest purchase at-or-after it, null when none") {
    val events = Seq(
      (1L, "view", 100L), (1L, "purchase", 90L), (1L, "purchase", 150L),
      (2L, "view", 200L),                       // never purchases after
      (2L, "purchase", 120L),                   // pre-view purchase must not count
      (3L, "purchase", 500L)                    // purchases but never views → excluded
    ).toDF("user_id", "event_type", "ts")
    val out = graft.streaming.EventStreams.funnel(events, "view", "purchase")
      .orderBy("user_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 100L && out(0).getLong(2) == 150L)
    assert(out(1).getLong(0) == 2L && out(1).getLong(1) == 200L && out(1).isNullAt(2))
  }

  test("bigram surprisal: exact integer bits under the corpus bigram LM") {
    import spark.implicits._
    val d = Seq((1L, "abab"), (2L, "abcd"), (3L, "x")).toDF("doc_id", "text")
    // model: ab:3 ba:1 bc:1 cd:1; ctx: a:3 b:2 c:1
    // doc1 = ab,ba,ab → (bitlen3-bitlen3)+(bitlen2-bitlen1)+(0) = 0+1+0 = 1
    // doc2 = ab,bc,cd → (2-2)+(2-1)+(1-1) = 1; doc3: <2 chars → dropped
    val r = TextAnalysis.bigramSurprisal(d).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 3L, 1L), (2L, 3L, 1L)))
    // rare-sequence docs surface: a RARE CONTINUATION OF A COMMON CONTEXT
    // ("ab" when 'a' almost always continues as "aa") scores more bits per
    // bigram than the dominant transition. (A bigram that is the ONLY
    // continuation of its context — however rare — scores zero: P=1 is the
    // correct conditional-LM behavior, not a bug.)
    val corpus = (Seq((100L, "ab")) ++
      (1L to 20L).map(i => (i, "aaaa"))).toDF("doc_id", "text")
    val bits = TextAnalysis.bigramSurprisal(corpus)
      .select(col("doc_id"), (col("surprisal_bits").cast("double") / col("n_bigrams")).as("bpb"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(bits(100L) > bits(1L), bits.toString)
    // model broadcasts: the scoring plan must not shuffle the corpus on the
    // bigram — both model joins are broadcast, never sort-merge/shuffled-hash
    val scored = TextAnalysis.bigramSurprisal(d)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
    // model build + scoring probe share the (doc, bigram) aggregate's
    // exchange (canonically identical subtrees → AQE stage reuse): the
    // corpus is scanned and exploded ONCE in the executed final plan
    scored.collect()
    val finalPlan = scored.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("LocalTableScan".r.findAllIn(finalPlan).length == 1, finalPlan)
  }

  test("normalized dedup: case/punctuation/whitespace variants collapse, raw forms counted") {
    import spark.implicits._
    val d = Seq(
      (1L, "Hello, World!"), (2L, "hello   world"), (3L, "hello world"),
      (4L, "different text")).toDF("doc_id", "text")
    val r = Dedup.normalizedExact(d).orderBy("keep_id").collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3)))
    // 1,2,3 collapse into one group (3 copies, 3 distinct raw byte forms)
    assert(r.toSeq == Seq((1L, 3L, 3L), (4L, 1L, 1L)))
    // raw exact dedup sees them all as distinct — the audit gap this pass closes
    assert(Dedup.exact(d).count() == 4L)
  }

  test("shard assignment: md5-nibble shards, contiguous hash-ranked positions, reproducible") {
    import spark.implicits._
    val d = (1L to 64L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val r = graft.llm.Sampling.shardAssignment(d).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    assert(r.length == 64)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // shard = first hex nibble of md5(salt ‖ id) — pinned against the JVM's
    // own md5 so the column can't silently drift from the documented scheme
    r.foreach { case (id, shard, _) => assert(shard == md5hex(s"shard$id").substring(0, 1)) }
    // positions are exactly 1..n within each shard, ranked by the full hash
    r.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
      val byPos = rows.sortBy(_._3).map(x => md5hex(s"shard${x._1}"))
      assert(byPos.sameElements(byPos.sorted))
    }
    val again = graft.llm.Sampling.shardAssignment(d).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    assert(r.toSet == again.toSet)
  }

  test("budget-capped sample: fill in rank order, boundary doc kept, oversized top doc kept") {
    import spark.implicits._
    val d = Seq(
      (1L, "a", "w w w w", 4.0),   // rank 2 in a → cum 9, before=5 < 8 → kept (boundary)
      (2L, "a", "w w w w w", 9.0), // rank 1 → cum 5, kept
      (3L, "a", "w w", 1.0),       // rank 3 → before=9 ≥ 8 → dropped
      (4L, "b", "w w w w w w w w w w w w", 5.0) // lone oversized doc → kept
    ).toDF("doc_id", "source", "text", "r")
    val out = graft.llm.Sampling.budgetCappedSample(d, tokenBudget = 8L, rankCol = col("r"))
      .orderBy("source", "cum_tokens").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", 2L, 5L, 5L), ("a", 1L, 4L, 9L), ("b", 4L, 12L, 12L)))
    // above the cut-over the running-sum exchange keys on (stratum,
    // rank-range bucket) — a stratum ranks as ≤rankBuckets tasks, never
    // one; no payload exchange keys on the stratum alone
    spark.conf.set("spark.graft.sample.budget.singleWindowMaxBytes", "0")
    try {
      val plan = graft.llm.Sampling.budgetCappedSample(d, 8L, col("r"))
        .queryExecution.executedPlan.toString
      assert("hashpartitioning\\(_g[#0-9L]*, _b[#0-9L]*, (4|32|200)\\)".r
        .findFirstIn(plan).isDefined, plan)
    } finally spark.conf.unset("spark.graft.sample.budget.singleWindowMaxBytes")
    // under the cut-over (fixture-sized input, default conf) the same rows
    // come from the single-window form — one stratum-keyed exchange only
    val planSmall = graft.llm.Sampling.budgetCappedSample(d, 8L, col("r"))
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(_g[#0-9L]*, (4|32|200)\\)".r
      .findFirstIn(planSmall).isDefined, planSmall)
  }

  test("budget-capped sample: kept set and positions bit-identical across bucket widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // adversarial rank column: heavy TIES (r quantized to 5 levels, so
    // sampled cut points land ON tied values), plus NULL ranks and a NULL
    // stratum — every edge the bucketing must route exactly like the
    // single-window form
    val d = (1L to 300L).map { i =>
      val src = if (i % 7 == 0) null else s"s${i % 3}"
      val r: java.lang.Double = if (i % 11 == 0) null else (rnd.nextInt(5) + 1).toDouble
      (i, src, (1 to (1 + rnd.nextInt(9))).map(_ => "w").mkString(" "), r)
    }.toDF("doc_id", "source", "text", "r")
    // decomposed variants run with the size cut-over disabled (conf = 0)
    // so fixture-sized input still exercises the rank-range machinery; the
    // LAST variant runs under the DEFAULT conf and takes the single-window
    // path — pinning the cut-over's bit-identity against every other form
    val wide = Seq[Option[(Double, Double)]](None, None, None,
        Some((1.0, 5.0)),      // arithmetic cuts, true range
        Some((100.0, 200.0)))  // arithmetic cuts, WRONG range — advisory only
      .zip(Seq(1, 32, 64, 64, 64)).map { case (rng, b) =>
      spark.conf.set("spark.graft.sample.budget.singleWindowMaxBytes", "0")
      try graft.llm.Sampling.budgetCappedSample(d, tokenBudget = 40L, rankCol = col("r"),
          rankBuckets = b, rankRange = rng)
        .collect().map(x => (Option(x.getString(0)), x.getLong(1), x.getLong(2), x.getLong(3)))
        .toSet
      finally spark.conf.unset("spark.graft.sample.budget.singleWindowMaxBytes")
    } :+ graft.llm.Sampling.budgetCappedSample(d, tokenBudget = 40L, rankCol = col("r"))
      .collect().map(x => (Option(x.getString(0)), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toSet
    assert(wide.forall(_ == wide.head),
      s"kept sets differ across bucket widths / cut sources: ${wide.map(_.size)}")
    // NULL stratum forms its own stratum (window semantics) — it must fill
    // its own budget, not vanish in the offsets join
    assert(wide(0).exists(_._1.isEmpty), "NULL-stratum rows were dropped")
    // NULL ranks sort LAST within their stratum: every kept null-rank row's
    // cum_tokens ≥ every kept non-null-rank row's in the same stratum
    val nullRankIds = d.where(col("r").isNull).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    wide(0).groupBy(_._1).foreach { case (_, rows) =>
      val (nullR, nonNullR) = rows.partition(r => nullRankIds.contains(r._2))
      if (nullR.nonEmpty && nonNullR.nonEmpty)
        assert(nullR.map(_._4).min >= nonNullR.map(_._4).max)
    }
  }

  test("temperature mix: sqrt-share flattens the head, exact at perfect squares") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w w", "big"), (2L, "w w", "big"),  // 4 tokens → sqrt 2
      (3L, "w", "small")                       // 1 token  → sqrt 1
    ).toDF("doc_id", "text", "source")
    val got = graft.llm.Sampling.temperatureMixWeights(docs)
      .orderBy("source").as[(String, Long, Double, Double)].collect()
    // raw shares 4/5 vs 1/5; sqrt shares 2/3 vs 1/3 — the tail more than
    // doubles its probability while the head keeps its majority
    assert(got.toSeq == Seq(
      ("big", 4L, 4.0 / 5.0, 2.0 / 3.0),
      ("small", 1L, 1.0 / 5.0, 1.0 / 3.0)))
    // single corpus aggregation; totals come back as a broadcast, never a
    // second corpus pass
    val plan = graft.llm.Sampling.temperatureMixWeights(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan) // 1-row totals dim
  }

  test("dsir weights: exact integer log-ratio vs independent computation, target-heavy scores higher") {
    import spark.implicits._
    val rows = Seq(
      (1L, "wiki wiki good", "en"),  // all-target tokens
      (2L, "spam spam junk", "de"),  // all-non-target tokens
      (3L, "wiki good", "de"),       // non-target doc of target-heavy tokens
      (4L, "", "en")                 // token-less: drops out
    )
    val docs = rows.toDF("doc_id", "text", "lang")
    val got = graft.llm.Sampling.importanceWeights(docs, isTarget = $"lang" === "en")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    // independent reimplementation of the exact formula (md5 buckets,
    // add-1-smoothed bucket models, bitlen quantization)
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(t: String): Int = Integer.parseInt(md5hex(t).substring(0, 2), 16)
    def bitlen(n: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(n)
    val toks = rows.flatMap { case (id, text, lang) =>
      text.split(" ").filter(_.nonEmpty).map(t => (id, lang == "en", bucket(t))) }
    val raw = toks.groupBy(_._3).map { case (b, ts) => b -> ts.size.toLong }
    val tgt = toks.filter(_._2).groupBy(_._3).map { case (b, ts) => b -> ts.size.toLong }
    val (nRaw, nTgt) = (raw.values.sum, tgt.values.sum)
    val expected = toks.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, ts) =>
      (id, ts.size.toLong, ts.map { case (_, _, b) =>
        bitlen(tgt.getOrElse(b, 0L) + 1) - bitlen(raw(b) + 1) +
          bitlen(nRaw + 1) - bitlen(nTgt + 1) }.sum)
    }
    assert(got.toSeq == expected)
    assert(!got.exists(_._1 == 4L)) // token-less doc dropped
    // the target-exclusive doc outscores the non-target-exclusive one
    // per token (dsir_bits are length-weighted; both docs have 3 tokens)
    val byId = got.map(r => r._1 -> r._3).toMap
    assert(byId(1L) > byId(2L))
    // the model joins back onto the count stream as a BROADCAST (the
    // corpus-sized side never shuffles on the bucket for scoring; the only
    // b-keyed exchange is the model build itself, which moves pre-aggregated
    // (doc, bucket) rows with map-side combine)
    val plan = graft.llm.Sampling.importanceWeights(docs, $"lang" === "en")
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin \\[b".r.findFirstIn(plan).isDefined, plan)
  }

  test("pmi phrases: collocations outrank frequent-but-independent pairs, exact bits") {
    import spark.implicits._
    val rows = Seq(
      (1L, "new york new york new york"),          // perfect collocation
      (2L, "the cat the dog the cat the dog"))     // "the" spreads thin
    val d = rows.toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.pmiPhrases(d, k = 10, minCount = 2)
      .as[(String, String, Long, Long)].collect().toSeq
    // independent reimplementation of the exact bitlen-PMI formula
    def bitlen(n: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(n)
    val uni = rows.flatMap(_._2.split(" ")).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val prs = rows.flatMap { case (_, t) =>
      t.split(" ").sliding(2).map(a => (a(0), a(1))).toSeq }
    val pc = prs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nP, nU) = (prs.size.toLong, uni.values.sum)
    val expected = pc.filter(_._2 >= 2).toSeq.map { case ((a, b), c) =>
      (a, b, c, bitlen(c) + 2 * bitlen(nU) - bitlen(nP)
        - bitlen(uni(a)) - bitlen(uni(b))) }
      .sortBy { case (a, b, _, s) => (-s, a, b) }.take(10)
    assert(got == expected)
    // the true collocation wins (ties break lexically on the pair)
    assert((got.head._1, got.head._2) == (("new", "york")))
    // top-k plans as TakeOrderedAndProject — never a global sort
    val plan = graft.llm.TextAnalysis.pmiPhrases(d, k = 10, minCount = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("phrase apply: greedy non-overlapping fusion, sequential phrases compose, map-only") {
    import spark.implicits._
    val d = Seq(
      (1L, "new york city is in new york"),
      (2L, "new new york york"), // only the middle pair matches; no chaining
      (3L, ""),                  // empty doc → empty tokens
      (4L, "york new")           // reversed order never fuses
    ).toDF("doc_id", "text")
    // second phrase consumes the first's fusion → new_york_city
    val got = graft.llm.TextAnalysis.applyPhrases(d,
        Seq("new" -> "york", "new_york" -> "city"))
      .orderBy("doc_id").select("doc_id", "fused_text")
      .as[(Long, String)].collect()
    assert(got.toSeq == Seq(
      (1L, "new_york_city is in new_york"),
      (2L, "new new_york york"), (3L, ""), (4L, "york new")))
    intercept[IllegalArgumentException] {
      graft.llm.TextAnalysis.applyPhrases(d, Seq.empty)
    }
    // self-pairs are rejected: their matches would overlap, and greedy
    // resolution of overlaps needs the sequential fold this operator
    // deliberately avoids (O(len²) per doc)
    intercept[IllegalArgumentException] {
      graft.llm.TextAnalysis.applyPhrases(d, Seq("a" -> "a"))
    }
    // one map pass: no exchange anywhere
    val plan = graft.llm.TextAnalysis.applyPhrases(d, Seq("new" -> "york"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("phrase apply property: linear pass equals greedy fold (random streams)") {
    import spark.implicits._
    // reference implementation: the O(len²) greedy left-to-right fold the
    // linear transform+filter claims to equal for l != r phrases
    def greedy(tokens: Seq[String], phrases: Seq[(String, String)]): Seq[String] =
      phrases.foldLeft(tokens) { case (ts, (l, r)) =>
        ts.foldLeft(Vector.empty[String]) { (acc, t) =>
          if (acc.nonEmpty && acc.last == l && t == r)
            acc.init :+ (l + "_" + r)
          else acc :+ t
        }
      }
    val rnd = new scala.util.Random(13)
    val phrases = Seq("a" -> "b", "a_b" -> "c", "c" -> "a")
    val docs = (1L to 40L).map { i =>
      (i, Seq.fill(rnd.nextInt(13))(("abc") (rnd.nextInt(3)).toString).mkString(" "))
    }
    val got = graft.llm.TextAnalysis.applyPhrases(docs.toDF("doc_id", "text"), phrases)
      .select("doc_id", "fused_text").as[(Long, String)].collect().toMap
    docs.foreach { case (id, text) =>
      val expected = greedy(text.split(" ").filter(_.nonEmpty), phrases).mkString(" ")
      assert(got(id) == expected, s"doc $id: '$text' -> '${got(id)}' vs '$expected'")
    }
  }

  test("phrase apply: 24-phrase list analyzes and runs (linear chained passes)") {
    import spark.implicits._
    // Each pass references its input array 3× — composed into ONE nested
    // Column the tree triples per level (3^24 ≈ 3e11 structural paths:
    // analysis alone would hang). The chained-projection form is linear;
    // a generous wall bound distinguishes the two regimes unambiguously.
    val phrases = (0 until 24).map(i => s"w$i" -> s"w${i + 1}")
    val d = Seq((1L, (0 to 25).map("w" + _).mkString(" ")), (2L, "x y z"))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val got = graft.llm.TextAnalysis.applyPhrases(d, phrases)
      .orderBy("doc_id").select("fused_text").as[String].collect()
    assert((System.nanoTime() - t0) / 1e9 < 60.0, "phrase passes are not linear")
    // sequential greedy semantics across the whole chain: w0_w1 fuses
    // first, so (w1,w2) no longer matches; (w2,w3) does, and so on —
    // pairs fuse at even offsets; (w23,w24) finds its left side consumed,
    // leaving the w24 w25 tail untouched
    assert(got(0) == ((0 to 22 by 2).map(i => s"w${i}_w${i + 1}") ++
      Seq("w24", "w25")).mkString(" "))
    assert(got(1) == "x y z")
  }

  test("bpe merge candidates: within-word pairs only, deterministic top-k, TakeOrdered plan") {
    import spark.implicits._
    val d = Seq((1L, "aaa ab"), (2L, "aa xy")).toDF("doc_id", "text")
    // pairs: aaa → aa,aa; ab → ab; aa → aa; xy → xy  ⇒ aa:3, ab:1, xy:1
    val r = graft.llm.TextAnalysis.bpeMergeCandidates(d, k = 2)
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq == Seq(("aa", 3L), ("ab", 1L))) // tie ab < xy broken lexically
    // single-char words contribute nothing; pairs never span the space
    val r2 = graft.llm.TextAnalysis.bpeMergeCandidates(
      Seq((1L, "a b c")).toDF("doc_id", "text"), k = 10).collect()
    assert(r2.isEmpty)
    // top-k plans as TakeOrderedAndProject — never a full global sort
    val plan = graft.llm.TextAnalysis.bpeMergeCandidates(d, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("bpe training loop: greedy merges in frequency order, early stop when dry") {
    import spark.implicits._
    val d = Seq((1L, "hug hug pug")).toDF("doc_id", "text")
    // chars: h,u,g ×2 words + p,u,g → pairs (u,g):3 (h,u):2 (p,u):1
    // merge 0: (u,g)→ug n=3; then (h,ug):2 → merge 1; then (p,ug):1 < 2 → stop
    val m = graft.llm.TextAnalysis.bpeTrain(d, merges = 10)
      .orderBy("step").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getString(3), x.getLong(4)))
    assert(m.toSeq == Seq((0, "u", "g", "ug", 3L), (1, "h", "ug", "hug", 2L)))
    // greedy left-to-right fusion handles overlapping runs: "aaaa" with
    // merge (a,a) fuses to [aa, aa], so round 2 merges (aa, aa)
    val m2 = graft.llm.TextAnalysis.bpeTrain(
      Seq((1L, "aaaa aaaa")).toDF("doc_id", "text"), merges = 3)
      .orderBy("step").collect()
      .map(x => (x.getString(1), x.getString(2), x.getLong(4)))
    assert(m2.toSeq == Seq(("a", "a", 6L), ("aa", "aa", 2L)))
  }

  test("bpe encode: trained merges tokenize to a fixpoint, unseen chars stay atomic") {
    import spark.implicits._
    val corpus = Seq((1L, "hug hug pug")).toDF("doc_id", "text")
    val merges = graft.llm.TextAnalysis.bpeTrain(corpus, merges = 10)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = graft.llm.TextAnalysis.bpeEncode(corpus, merges)
      .orderBy("doc_id", "word_idx").collect().map(_.getSeq[String](2).toList)
    // training merged (u,g) then (h,ug): hug → [hug], pug → [p, ug]
    assert(enc.toSeq == Seq(List("hug"), List("hug"), List("p", "ug")))
    // FIXPOINT: re-counting pairs on the encoded corpus finds nothing the
    // trainer would still merge (no pair with count >= 2) — encode really
    // is the training loop's final symbol state
    val pairs = graft.llm.TextAnalysis.bpeEncode(corpus, merges)
      .where(size(col("symbols")) >= 2)
      .select(explode(sequence(lit(1), size(col("symbols")) - 1)).as("i"), col("symbols"))
      .groupBy(element_at(col("symbols"), col("i")),
        element_at(col("symbols"), col("i") + 1)).count()
    assert(pairs.where(col("count") >= 2).count() == 0L)
    // words with chars never seen in training pass through as single chars
    val unseen = graft.llm.TextAnalysis.bpeEncode(
      Seq((9L, "zz hug")).toDF("doc_id", "text"), merges)
      .orderBy("word_idx").collect().map(_.getSeq[String](2).toList)
    assert(unseen.toSeq == Seq(List("z", "z"), List("hug")))
  }

  test("bpe encode property: chained passes equal the greedy fold (random words, self-pairs)") {
    import spark.implicits._
    // reference implementation: the per-merge greedy left-to-right fold
    // the linear transform+filter pass (and the self-pair fold) must equal
    def greedy(word: String, merges: Seq[(String, String)]): List[String] =
      merges.foldLeft(word.split("").toList) { case (syms, (l, r)) =>
        syms.foldLeft(Vector.empty[String]) { (acc, s) =>
          if (acc.nonEmpty && acc.last == l && s == r) acc.init :+ (l + r)
          else acc :+ s
        }.toList
      }
    val rnd = new scala.util.Random(29)
    // alphabet {a, b} maximizes run/overlap collisions; merge list mixes
    // self-pairs, distinct pairs, and second-order merges of products
    val merges = Seq("a" -> "a", "a" -> "b", "b" -> "a", "aa" -> "b", "b" -> "b")
    val docs = (1L to 50L).map { i =>
      (i, Seq.fill(3)(Seq.fill(rnd.nextInt(10) + 1)(
        ("ab") (rnd.nextInt(2))).mkString).mkString(" "))
    }
    val got = graft.llm.TextAnalysis.bpeEncode(docs.toDF("doc_id", "text"), merges)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[String](2).toList).toMap
    docs.foreach { case (id, text) =>
      text.split(" ").zipWithIndex.foreach { case (w, wi) =>
        val expected = greedy(w, merges)
        assert(got((id, wi.toLong)) == expected,
          s"doc $id word '$w': ${got((id, wi.toLong))} vs $expected")
      }
    }
  }

  test("bpe encode: 200-merge table stays one constant-size expression and runs") {
    import spark.implicits._
    val d = Seq((1L, "the cat sat on the mat"), (2L, "zq")).toDF("doc_id", "text")
    val letters = "etaoinshrdlucmfw"
    def mergeList(n: Int): Seq[(String, String)] =
      (for { l <- letters; r <- letters if l != r } yield (l.toString, r.toString)).take(n)
    def optimizedLen(n: Int): Int =
      graft.llm.TextAnalysis.bpeEncode(d, mergeList(n))
        .queryExecution.optimizedPlan.toString.length
    // the merge table is DATA (one array literal), so 4x the merges may
    // grow the optimized-plan text at most ~linearly (the literal itself)
    // — the nested-fold shape tripled the TREE per merge (analysis hangs
    // by ~50 merges), and one-projection-per-merge paid a per-merge
    // serialization boundary per row (measured 111 s at sf0.1)
    val p50 = optimizedLen(50)
    val p200 = optimizedLen(200)
    assert(p200 < 6L * p50, s"optimized plan not linear: 50 merges -> $p50 chars, " +
      s"200 merges -> $p200 chars")
    // ...and the whole encode is ONE projection over the explode — no
    // per-merge operator chain in the optimized plan
    val projections = graft.llm.TextAnalysis.bpeEncode(d, mergeList(200))
      .queryExecution.optimizedPlan.collect {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
      }.length
    assert(projections <= 3, s"expected a constant projection count, got $projections")
    // and the full 200-merge pipeline executes end-to-end in bounded time
    val t0 = System.nanoTime()
    val rows = graft.llm.TextAnalysis.bpeEncode(d, mergeList(200)).collect()
    assert((System.nanoTime() - t0) / 1e9 < 120.0, "200-merge encode not linear")
    assert(rows.length == 7)
  }

  test("bpe training: batched rounds accept only disjoint pairs, counts stay exact") {
    import spark.implicits._
    // pairs by count: (u,g):3, (x,y):3, (h,u):2, (p,u):1. Round 1 at j=3
    // takes (u,g) [n=3] and (x,y) [n=3, disjoint]; (h,u) shares u → skipped
    // in that round, accepted next round with its RE-COUNTED post-merge
    // adjacency gone (h now precedes ug, not u), so it re-ranks as (h,ug):2
    val d = Seq((1L, "hug hug pug xy xy xy")).toDF("doc_id", "text")
    val batched = graft.llm.TextAnalysis.bpeTrain(d, merges = 4, mergesPerRound = 3)
      .orderBy("step").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(4)))
    assert(batched.toSeq == Seq(
      (0, "u", "g", 3L), (1, "x", "y", 3L), (2, "h", "ug", 2L)))
    // on merge tables whose accepted pairs never overlap, batched training
    // IS sequential training: same merges, same counts, same final symbols
    val seq1 = graft.llm.TextAnalysis.bpeTrain(d, merges = 4).orderBy("step")
      .collect().map(x => (x.getString(1), x.getString(2), x.getLong(4)))
    assert(batched.map(t => (t._2, t._3, t._4)).toSeq == seq1.toSeq)
  }

  test("bpe training: the batched trainer's job count is pinned to ceil(merges/j)") {
    import spark.implicits._
    // six symbol-disjoint self-pair candidates (3 adjacencies each), so
    // every round fills: rounds — one corpus count job each — must equal
    // exactly ceil(merges / mergesPerRound), the scaling contract that
    // makes a 32k-merge tokenizer 32k/j jobs instead of 32k
    val d = Seq((1L, "aaaa bbbb cccc dddd eeee ffff")).toDF("doc_id", "text")
    for ((j, expectRounds) <- Seq(1 -> 6, 2 -> 3, 3 -> 2, 4 -> 2, 6 -> 1)) {
      val (df, rounds) = graft.llm.TextAnalysis.bpeTrainCounted(
        d, merges = 6, mergesPerRound = j)
      assert(rounds == expectRounds,
        s"mergesPerRound=$j: expected $expectRounds rounds, got $rounds")
      assert(df.count() == 6L, s"mergesPerRound=$j must still learn 6 merges")
    }
  }

  test("quality token curve: per-stratum equal-frequency bins, token mass, score range") {
    import spark.implicits._
    val d = Seq(
      (1L, "a", "x x x x"),                              // low: no stopword, repetitive, short
      (2L, "a", "the quick brown fox jumps over the lazy dog now"), // high
      (3L, "a", "y y"),                                  // low
      (4L, "a", "the cat and the dog walked over the hill today"), // high
      (5L, "b", "the one and only document here today")  // lone doc in b
    ).toDF("doc_id", "source", "text")
    val r = graft.llm.TextAnalysis.qualityTokenCurve(d, bins = 2)
      .orderBy("source", "qbin").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // source a: 2 bins of 2 docs; the low-quality pair (1,3) lands in bin 1
    assert(r.toSeq == Seq(("a", 1L, 2L, 6L), ("a", 2L, 2L, 20L), ("b", 1L, 1L, 7L)))
    // the ranking exchange keys on (stratum, score-range bucket) — a global
    // ntile would serialize the corpus onto one partition, a stratum-only
    // key onto one task per stratum; the rollup's exchange moves only
    // map-side-combined (source, qbin) partials
    val plan = graft.llm.TextAnalysis.qualityTokenCurve(d, bins = 2)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(_g[#0-9L]*, _b[#0-9L]*, (4|32|200)\\)".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("quality token curve: NULL stratum forms its own stratum, not dropped by the offsets join") {
    import spark.implicits._
    val d = Seq(
      (1L, null, "x x x x"), (2L, null, "the cat and the dog walked over the hill today"),
      (3L, "a", "y y")
    ).toDF("doc_id", "source", "text")
    val r = graft.llm.TextAnalysis.qualityTokenCurve(d, bins = 2)
      .collect().map(x => (Option(x.getString(0)), x.getLong(1), x.getLong(2), x.getLong(3)))
    // the two NULL-stratum docs bin together (2 bins of 1 doc); the window
    // form ranked NULL as its own partition — the decomposed join must too
    assert(r.filter(_._1.isEmpty).map(x => (x._2, x._3)).sorted.toSeq ==
      Seq((1L, 1L), (2L, 1L)), r.toSeq.toString)
    assert(r.filter(_._1.nonEmpty).toSeq == Seq((Some("a"), 1L, 1L, 2L)))
  }

  test("chunk with overlap: minimal grid cover, partial tail, zero-token docs drop") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens, w=8 s=4 → chunks at 0 (8) and 4 (6)
      (2L, "a b c"),               // shorter than window → one chunk of 3
      (3L, ""), (4L, "  ")         // zero tokens → no chunks
    ).toDF("doc_id", "text")
    val r = graft.llm.Sampling.chunkWithOverlap(d, window = 8, stride = 4)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4)))
    assert(r.toSeq == Seq(
      (1L, 0L, 0L, 8L, "a b c d e f g h"),
      (1L, 1L, 4L, 6L, "e f g h i j"),
      (2L, 0L, 0L, 3L, "a b c")))
    // coverage invariant on a larger doc: every token index lands in ≥1
    // chunk, consecutive chunks overlap by window − stride
    val big = Seq((9L, (1 to 103).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val ch = graft.llm.Sampling.chunkWithOverlap(big, window = 16, stride = 10)
      .orderBy("chunk_idx").collect()
      .map(x => (x.getLong(2), x.getLong(3)))
    assert(ch.head == (0L, 16L) && ch.last._1 + ch.last._2 == 103L)
    assert(ch.sliding(2).forall { case Array((s1, n1), (s2, _)) => s2 <= s1 + n1 })
    // pure map: chunking itself plans no exchange at all
    val plan = graft.llm.Sampling.chunkWithOverlap(d, 8, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("chunk with overlap: invariants hold for random window/stride/lengths") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 5).foreach { trial =>
      val window = 1 + rnd.nextInt(12)
      val stride = 1 + rnd.nextInt(window)
      val docs = (0 until 8).map(i =>
        (i.toLong, (1 to rnd.nextInt(40)).map(j => s"w$j").mkString(" ")))
        .toDF("doc_id", "text")
      val lens = docs.collect().map(r => r.getLong(0) ->
        r.getString(1).split(" ").count(_.nonEmpty)).toMap
      val chunks = graft.llm.Sampling.chunkWithOverlap(docs, window, stride)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
        .groupBy(_._1)
      lens.foreach { case (id, n) =>
        val cs = chunks.getOrElse(id, Array.empty).sortBy(_._2)
        if (n == 0) assert(cs.isEmpty, s"trial $trial: empty doc chunked")
        else {
          // minimal grid cover: expected count, grid starts, full coverage,
          // last chunk ends at n, only the last may be partial
          val m = 1 + math.ceil(math.max(0, n - window).toDouble / stride).toInt
          assert(cs.length == m, s"trial $trial doc $id: ${cs.length} != $m")
          cs.zipWithIndex.foreach { case ((_, k, start, nc), i) =>
            assert(k == i && start == i.toLong * stride)
            assert(nc == math.min(window.toLong, n - start))
            if (i < m - 1) assert(nc == window)
          }
          assert(cs.last._3 + cs.last._4 == n, s"trial $trial doc $id tail")
        }
      }
    }
  }

  test("balanced sample: per-group cap, group totals, hash-uniform pick") {
    import spark.implicits._
    val rows = ((1L to 10L).map(i => (i, "big")) ++ Seq((20L, "small")))
      .toDF("doc_id", "grp")
    val r = graft.llm.Sampling.balancedSample(rows, "grp", cap = 3).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    val big = r.filter(_._2 == "big")
    assert(big.length == 3 && big.forall(_._4 == 10L))
    assert(big.map(_._3).sorted.sameElements(Seq(1L, 2L, 3L)))
    val small = r.filter(_._2 == "small")
    assert(small.length == 1 && small.head._4 == 1L)
    // the pick is by salted hash, not by id: kept ids are the 3 smallest
    // md5('bal'‖id), which differs from the 3 smallest ids for this fixture
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = (1L to 10L).sortBy(i => md5hex(s"bal$i")).take(3).toSet
    assert(big.map(_._1).toSet == expect)
    assert(expect != Set(1L, 2L, 3L))
  }

  test("balanced sample: NULL group forms its own group, not dropped by the offsets join") {
    import spark.implicits._
    val rows = ((1L to 5L).map(i => (i, null: String)) ++ Seq((20L, "g")))
      .toDF("doc_id", "grp")
    val r = graft.llm.Sampling.balancedSample(rows, "grp", cap = 2).collect()
      .map(x => (x.getLong(0), Option(x.getString(1)), x.getLong(2), x.getLong(3)))
    // the pre-decomposition window ranked NULL as its own partition; the
    // null-safe (struct-keyed) join must keep that: cap applies to the NULL
    // group like any other, with its true group total
    val nulls = r.filter(_._2.isEmpty)
    assert(nulls.length == 2 && nulls.forall(_._4 == 5L), r.toSeq.toString)
    assert(nulls.map(_._3).sorted.sameElements(Seq(1L, 2L)))
    assert(r.filter(_._2.nonEmpty).map(x => (x._1, x._3, x._4)).toSeq ==
      Seq((20L, 1L, 1L)))
  }
}
