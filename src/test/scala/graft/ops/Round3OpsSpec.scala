package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-3 operators: star connected components, Bloom join pruning,
  * multi-canopy fuzzy matching, product quantization, count-min sketch,
  * triangle counting. */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  // ── StarComponents ────────────────────────────────────────────────────

  test("star CC labels a long chain min-label propagation cannot finish") {
    // one 200-node chain: diameter 199 ≫ min-label's default 20 rounds,
    // but O(log n) star rounds close it.
    val nodes = (0L until 200L).toDF("id")
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = StarComponents.connectedComponents(nodes, edges)
    val labels = cc.select("cluster_id").distinct().as[Long].collect()
    assert(labels.toSeq == Seq(0L), "whole chain must collapse to root 0")
    assert(cc.count() == 200)
  }

  test("star CC matches min-label CC on a random shallow graph") {
    val rnd = new scala.util.Random(7)
    val n = 120L
    val nodes = (0L until n).toDF("id")
    // clustered edges: random links within 10-id bands → shallow components
    val pairs = (0 until 150).map { _ =>
      val base = rnd.nextInt(12) * 10
      (base + rnd.nextInt(10).toLong, base + rnd.nextInt(10).toLong)
    }.filter(p => p._1 != p._2)
    val edges = pairs.toDF("a", "b")
    val star = StarComponents.connectedComponents(nodes, edges)
      .withColumnRenamed("cluster_id", "star_label")
    val minl = Dedup.connectedComponents(nodes, edges)
      .withColumnRenamed("cluster_id", "min_label")
    val diff = star.join(minl, "id")
      .filter(col("star_label") =!= col("min_label")).count()
    assert(diff == 0, "star and min-label CC must agree on shallow graphs")
  }

  test("auto CC: min-label handles shallow graphs, star fallback finishes chains") {
    // shallow: triangles — converges inside the probe
    val n1 = (0L until 9L).toDF("id")
    val e1 = Seq((0L, 1L), (1L, 2L), (2L, 0L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val m1 = StarComponents.auto(n1, e1).as[(Long, Long)].collect().toMap
    assert(m1(2L) == 0L && m1(6L) == 4L && m1(8L) == 8L)
    // deep: 150-node chain, probe budget 4 — star fallback on the
    // collapsed graph must still converge to root 0
    val n2 = (0L until 150L).toDF("id")
    val e2 = (0L until 149L).map(i => (i, i + 1)).toDF("a", "b")
    val m2 = StarComponents.auto(n2, e2, probeRounds = 4).as[(Long, Long)].collect()
    assert(m2.forall(_._2 == 0L), s"chain must fully collapse, got ${m2.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("star CC labels isolated nodes with themselves") {
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val m = StarComponents.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 9L -> 9L))
  }

  // ── BloomJoin ─────────────────────────────────────────────────────────

  test("bloom prune join is result-identical to the plain join") {
    val fact = (1L to 500L).map(i => (i % 37, i)).toDF("fk", "payload")
    val dim = Seq(1L, 5L, 11L).toDF("dk")
    val pruned = BloomJoin.pruneJoin(fact, dim, "fk", "dk")
      .select("fk", "payload").orderBy("fk", "payload").collect()
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload").orderBy("fk", "payload").collect()
    assert(pruned.sameElements(plain))
  }

  test("bloom filter has no false negatives and does prune") {
    val dim = (0L until 50L).filter(_ % 10 == 0).toDF("dk")
    val bitmap = BloomJoin.buildBitmap(dim, "dk")
    val probe = (0L until 1000L).toDF("x")
      .withColumn("hit", BloomJoin.mightContain(col("x").cast("string"), bitmap))
    val misses = probe.filter(col("x") < 50 && col("x") % 10 === 0 && !col("hit")).count()
    assert(misses == 0, "members must always pass")
    val passed = probe.filter(col("hit")).count()
    assert(passed < 100, s"8192-bit/3-hash filter on 5 keys should prune hard, passed=$passed")
  }

  // ── Dedup.incrementalStatus ───────────────────────────────────────────

  test("incremental dedup classifies exact/near/novel against a corpus") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact copy of 1
      (11L, "one two three four five six seven eight nine ten eleven twelve appended tail"), // near of 2
      (12L, "completely different fresh content with no shared shingles whatsoever here"))
      .toDF("doc_id", "text")
    val st = Dedup.incrementalStatus(incoming, corpus)
      .as[(Long, String)].collect().toMap
    assert(st == Map(10L -> "exact_dup", 11L -> "near_dup", 12L -> "novel"), s"got $st")
  }

  // ── FuzzyJoin.multiCanopy ─────────────────────────────────────────────

  test("multi-canopy catches head typos the prefix canopy misses") {
    val clean = Seq("almond", "antique", "burnished").toDF("k")
    val dirty = Seq("xlmond", "entique", "burnishet").toDF("k")
    val single = FuzzyJoin.byEditDistance(clean, dirty, "k")
      .select("l_key", "r_key").as[(String, String)].collect().toSet
    val multi = FuzzyJoin.multiCanopy(clean, dirty, "k")
      .select("l_key", "r_key").as[(String, String)].collect().toSet
    // xlmond/entique corrupt the 2-char prefix → invisible to prefix blocking
    assert(!single.contains(("almond", "xlmond")))
    assert(!single.contains(("antique", "entique")))
    assert(multi.contains(("almond", "xlmond")), "suffix canopy must catch")
    assert(multi.contains(("antique", "entique")), "phonetic canopy must catch")
    assert(multi.contains(("burnished", "burnishet")))
    assert(single.subsetOf(multi), "multi-canopy recall dominates single-canopy")
  }

  // ── Similarity PQ ─────────────────────────────────────────────────────

  test("pq encode+adc ranks the query's own vector first") {
    val vecs = (0L until 40L).map { i =>
      (i, (0 until 8).map(j => math.sin(i * 8 + j).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    val e = Similarity.cast(vecs).select(col("vec_id"), col("ev"))
    val cb = e.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("long").as("code"),
        explode(sequence(lit(0), lit(1))).as("sub"), col("ev"))
      .select(col("sub"), col("code"), expr("slice(ev, sub * 4 + 1, 4)").as("cw"))
    val q = e.filter(col("vec_id") === 7).select(col("ev").as("qv"))
    val enc = Similarity.pqEncode(e, cb, 2, 8)
    assert(enc.count() == 80, "every vector gets one code per subspace")
    val top = Similarity.pqTopK(enc, cb, q, 2, 8, 3).as[(Long, Long)].collect()
    // vec 7 quantizes to SOME codes; its ADC distance equals the distance of
    // every vector sharing those codes — it must appear in the top block.
    val bestD = top.head._2
    assert(top.filter(_._2 == bestD).map(_._1).contains(7L) || top.head._1 == 7L,
      s"query vector must sit in the minimal ADC block, got ${top.mkString(",")}")
  }

  // ── Sketches (count-min) ──────────────────────────────────────────────

  test("cms estimates are never below exact counts; exact when collision-free") {
    val items = (Seq.fill(30)("heavy") ++ (1 to 40).map(i => s"light$i")).toDF("item")
    val counters = Sketches.cmsBuild(items, "item")
    val exact = items.groupBy("item").agg(count(lit(1)).as("exact_cnt"))
    val est = Sketches.cmsEstimate(exact, counters, "item")
      .join(exact, "item")
    assert(est.filter(col("cms_est") < col("exact_cnt")).count() == 0,
      "CMS never underestimates")
    val heavy = est.filter(col("item") === "heavy")
      .select("cms_est").as[Long].head()
    assert(heavy >= 30 && heavy <= 70, s"heavy estimate sane, got $heavy")
  }

  // ── Graph.triangleCount ───────────────────────────────────────────────

  test("triangle count: K4 has 4 triangles, a square has 0, circulant n") {
    val k4 = (for { a <- 0 to 3; b <- 0 to 3 if a < b } yield (a.toLong, b.toLong)).toDF("a", "b")
    assert(Graph.triangleCount(k4).as[Long].head() == 4L)
    val square = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("a", "b")
    assert(Graph.triangleCount(square).as[Long].head() == 0L)
    // circulant C_n with +1/+2 chords: exactly n triangles
    val n = 20L
    val circ = (0L until n).flatMap(i => Seq((i, (i + 1) % n), (i, (i + 2) % n))).toDF("a", "b")
    assert(Graph.triangleCount(circ).as[Long].head() == n)
    // duplicate + reversed edges must not inflate the count
    val noisy = circ.unionByName(circ.select(col("b").as("a"), col("a").as("b")))
    assert(Graph.triangleCount(noisy).as[Long].head() == n)
  }
}
