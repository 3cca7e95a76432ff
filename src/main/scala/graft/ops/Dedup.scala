package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines: exact
  * (content-hash groupBy), MinHash+LSH (shingle → k minhashes → banded
  * buckets → candidate-pair join), SimHash fingerprints, and exact n-gram
  * Jaccard. All engines' favorite text-dedup stack, expressed as
  * shuffle-lean DataFrame transforms:
  *
  *  - exact dedup: one hash-aggregate on md5(text) — the 100 TB baseline.
  *  - MinHash/LSH: per-doc work is narrow (explode → hash → min); the only
  *    shuffles are the per-(doc,hash) min aggregate and the band-bucket
  *    self-join, which touches candidate buckets only — never all-pairs.
  *  - SimHash: narrow explode + one aggregate; fingerprints join on equal
  *    (or near) values downstream.
  *
  * The 48-bit hash is the first 12 hex chars of md5, parsed as an integer —
  * chosen because it is portable: any ANSI engine can reproduce it from
  * md5 hex with string ops, so dedup decisions are auditable outside Spark.
  */
object Dedup {

  /** 48-bit integer hash of a string column (salted). */
  def hash48(c: Column, salt: Column): Column =
    conv(substring(md5(concat(salt, lit("|"), c)), 1, 12), 16, 10).cast("long")

  /** Exact dedup: keep the smallest doc_id per distinct text. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("dup_cnt"))

  /** Normalization-sensitive dedup audit: how much duplicate mass is
    * FORMATTING-only (case/punctuation) versus byte-identical. Texts
    * group by md5 of the normalized form (lowercase, strip every char
    * outside [a-z0-9 ] — a pattern whose semantics agree between Java
    * regex and RE2, so the oracle reproduces it); each group also counts
    * its distinct RAW digests. One-row summary:
    * (n_docs, n_groups, n_dup_groups, n_format_only_groups,
    *  docs_in_dup_groups). A group is a dup group when it holds > 1 doc;
    * format-only when additionally all raw digests differ — i.e. the
    * rows exact dedup would MISS. One keyed aggregate + one global. */
  def normalizedStats(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(col("text")).as("raw_md5"),
        md5(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""))
          .as("norm_md5"))
      .groupBy(col("norm_md5"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("raw_md5")).as("raw_variants"))
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_groups"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup_groups"),
        sum(when(col("n") > 1 && col("raw_variants") === col("n"), 1L)
          .otherwise(0L)).as("n_format_only_groups"),
        sum(when(col("n") > 1, col("n")).otherwise(0L))
          .as("docs_in_dup_groups"))

  /** Word k-shingles (docs with fewer than k words are dropped — they have
    * no k-shingle). */
  def shingles(docs: DataFrame, k: Int = 3): DataFrame = {
    val arrEls = (0 until k).map(i => s"ws[i + $i]").mkString(", ")
    docs.withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= k)
      .select(col("doc_id"), explode(
        expr(s"transform(sequence(0, size(ws) - $k), i -> concat_ws(' ', $arrEls))"))
        .as("shingle"))
  }

  /** MinHash signatures: k independent 32-bit hashes, min per doc.
    * Output: (doc_id, j, mh) — long format scales better than a wide
    * signature array (no 100-col row, groupBy stays partial-aggregable).
    *
    * The k hashes are 8-hex-char slices of two md5 digests (md5(s) ++
    * md5('x'+s)) rather than k salted digests: one quarter the hashing
    * work per shingle, same independence for banding purposes. */
  def minhash(sh: DataFrame, k: Int = 8): DataFrame = {
    require(k <= 8, "k hashes are sliced from two md5 digests (64 hex chars)")
    // r13 negative results, recorded so they are not re-chased (both
    // variants oracle-identical but MEASURED no better or worse at sf0.1;
    // medians of the q_dedup_* family):
    //  - hash each DISTINCT shingle once + join back (9.6x occurrence
    //    duplication at sf0.1): the two shingle-string exchanges the
    //    distinct+join add cost more than the ~0.3 s of md5 they save
    //    (q_dedup_canonical 1.99 -> 2.78 s). Revisit only where hashing
    //    dominates the exchange (very long shingles / costly digests).
    //  - wide 8-min aggregate (no k-wide explode, 1 row/doc through the
    //    exchange): within noise of this form (2.0 -> 2.2-2.5 s) — the
    //    partial aggregate already collapses the exploded rows map-side,
    //    so the explode never reaches the exchange to begin with.
    sh.withColumn("hx", concat(md5(col("shingle")), md5(concat(lit("x"), col("shingle")))))
      .select(col("doc_id"), explode(sequence(lit(0), lit(k - 1))).as("j"), col("hx"))
      .select(col("doc_id"), col("j"),
        conv(expr("substring(hx, j * 8 + 1, 8)"), 16, 10).cast("long").as("h"))
      .groupBy(col("doc_id"), col("j")).agg(min(col("h")).as("mh"))
  }

  /** LSH banding (rows-per-band = 2): band value joins equal buckets. */
  def lshBands(sig: DataFrame): DataFrame =
    sig.groupBy(col("doc_id"), expr("j div 2").as("band"))
      .agg(concat(
        min(when(col("j") % 2 === 0, col("mh"))).cast("string"), lit(":"),
        min(when(col("j") % 2 === 1, col("mh"))).cast("string")).as("bv"))

  /** Candidate pairs: docs sharing ≥1 LSH bucket, with #shared bands and
    * #equal minhashes (estimated Jaccard = n_eq / k). */
  def candidates(sigIn: DataFrame, k: Int = 8): DataFrame = {
    // sig/bands feed multiple differently-aliased plan branches that
    // ReuseExchange does NOT unify (benchmarked: uncached the full query
    // is 4x slower at sf0.1 — the shingle+hash subtree re-executes per
    // branch). Cached blocks are released by the ContextCleaner when the
    // result frame becomes unreachable, so this is bounded, not a leak.
    val sig = sigIn.persist()
    val bands = lshBands(sig).persist()
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
    val sa = sig.select(col("doc_id").as("doc_a"), col("j"), col("mh").as("mha"))
    val sb = sig.select(col("doc_id").as("doc_b"), col("j"), col("mh").as("mhb"))
    pairs.join(sa, "doc_a").join(sb, Seq("doc_b", "j"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_bands"))
      .agg(sum(when(col("mha") === col("mhb"), 1L).otherwise(0L)).as("n_eq"))
      .withColumn("est_jaccard", round(col("n_eq").cast("double") / k, 6))
  }

  /** SimHash fingerprint over word unigrams, `bits` wide (default 16).
    * Bit j is the sign of Σ±1 over words (bit j of word hash). */
  def simhash(docs: DataFrame, bits: Int = 16): DataFrame = {
    val w = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .withColumn("h", hash48(col("w"), lit("sim")))
    val sums = (0 until bits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j"))
    val fp = (0 until bits).map(j =>
      when(col(s"s$j") > 0, 1L << j).otherwise(0L)).reduce(_ + _)
    w.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  /** Connected components over an undirected edge list — the pairs→clusters
    * step of a dedup pipeline (LSH emits candidate PAIRS; keep-one-per-
    * cluster needs the transitive closure). Iterative min-label
    * propagation: every node starts labeled with its own id; each round a
    * node takes the min label among itself and its neighbors; converged
    * when no label shrinks. Rounds needed = graph diameter, which for
    * near-dup clusters is tiny (chains of edited copies).
    *
    * Scale notes: each round is one join + one min-aggregate on the
    * (node,label) frame — all partial-aggregable, no driver-side state
    * beyond the convergence counter. Each round's result is eagerly
    * local-checkpointed: without the lineage cut the logical plan doubles
    * per round and analysis cost grows exponentially (on a cluster with
    * lineage-loss concerns, point `spark.sparkContext.setCheckpointDir` at
    * durable storage and swap in `checkpoint()`). For graphs with large
    * diameter at 100 TB, swap the round body for the alternating
    * large-star/small-star rewrite (Kiveris et al., "Connected Components
    * in MapReduce and Beyond") — same loop skeleton, O(log n) rounds.
    *
    * @param nodes single column `id`; @param edges columns `a`, `b`.
    * @return (id, cluster_id) with cluster_id = min node id in component.
    */
  /** Partial-propagation result: `labels` (id, label) where each label is
    * the min id within `maxIter` hops; `converged` true iff that is the
    * component fixpoint. */
  case class CcProbe(labels: DataFrame, converged: Boolean)

  /** The min-label loop with its convergence status exposed — the probe
    * primitive [[graft.ops.StarComponents.auto]] composes with the star
    * fallback. */
  def connectedComponentsProbe(nodes: DataFrame, edges: DataFrame,
                               maxIter: Int = 20): CcProbe = {
    val bi = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct().persist()
    var labels = nodes.select(col("id"), col("id").as("label")).localCheckpoint(false)
    // Convergence via the label-sum invariant: labels only ever shrink, so
    // Σlabel strictly decreases until the fixpoint — a single tiny aggregate
    // per round instead of a join-and-compare against the previous frame.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val msgs = bi.as("e").join(labels.as("l"), col("e.a") === col("l.id"))
        .select(col("e.b").as("id"), col("l.label").as("label"))
      labels = labels.unionByName(msgs)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(false)
      val s = labelSum(labels)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    bi.unpersist()
    CcProbe(labels, converged)
  }

  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val probe = connectedComponentsProbe(nodes, edges, maxIter)
    if (!probe.converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents exited at maxIter=$maxIter WITHOUT reaching the " +
          "label-sum fixpoint — cluster labels are NOT final (graph diameter " +
          "exceeds maxIter). Raise maxIter, switch to StarComponents, or use " +
          "StarComponents.auto which falls back automatically.")
    probe.labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** SimHash near-dup candidate pairs: by the pigeonhole principle, two
    * 16-bit fingerprints within Hamming distance 3 agree exactly on at
    * least one of 4 disjoint 4-bit bands — so candidates join on band
    * equality (never all-pairs), then exact Hamming
    * (`bit_count(fp_a XOR fp_b)`) filters to `maxHamming`. Same
    * bucket-join scale shape as MinHash-LSH, over the fingerprints
    * [[simhash]] already computed. */
  def simhashPairs(fps: DataFrame, maxHamming: Int = 3, bands: Int = 4,
                   bits: Int = 16): DataFrame = {
    val width = bits / bands
    val banded = fps.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bv", expr(s"(simhash >> (band * $width)) & ${(1 << width) - 1}"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("fp_a"), col("b.simhash").as("fp_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Incremental dedup: classify an INCOMING batch against an EXISTING
    * corpus — the daily-ingest shape (new crawl vs historical index),
    * where self-join dedup of the union would re-pair the whole corpus
    * against itself every day. Statuses per incoming doc:
    *  - `exact_dup`: content hash present in the corpus;
    *  - `near_dup`: shares an LSH bucket with a corpus doc AND ≥ `minEq`
    *    of the k minhashes agree (the q_dedup_clusters edge rule);
    *  - `novel`: neither.
    *
    * Scale shape: the exact leg is a semi-join on md5 (broadcast if the
    * incoming batch is small). The near leg joins incoming bands against
    * CORPUS bands — at steady state the corpus signatures/bands are a
    * precomputed index that only gets appended, so daily cost is
    * |incoming| signature computation + a bucket-equijoin, never a corpus
    * self-join. */
  def incrementalStatus(incoming: DataFrame, corpus: DataFrame,
                        minEq: Long = 6L, k: Int = 8): DataFrame = {
    // Join orientation everywhere: the incoming-batch side broadcasts and
    // the corpus side STREAMS — a daily batch vs a 100 TB corpus must
    // never shuffle the corpus. (The corpus md5/signature scans below are
    // the steady-state precomputed index; recomputing them here keeps the
    // operator self-contained.)
    val inMd5 = incoming.select(col("doc_id"), md5(col("text")).as("m"))
    val exactIds = corpus.select(md5(col("text")).as("m"))
      .join(broadcast(inMd5), "m").select(col("doc_id")).distinct()
      .withColumn("is_exact", lit(1))
    val inSig = minhash(shingles(incoming), k).persist()
    val corpSig = minhash(shingles(corpus), k).persist()
    val cand = lshBands(corpSig).as("b").join(broadcast(lshBands(inSig)).as("a"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv"))
      .select(col("a.doc_id").as("in_id"), col("b.doc_id").as("corp_id"))
      .distinct()
    val nearIds = corpSig
      .select(col("doc_id").as("corp_id"), col("j"), col("mh").as("mh_c"))
      .join(broadcast(cand
        .join(inSig.select(col("doc_id").as("in_id"), col("j"), col("mh").as("mh_in")),
          "in_id")), Seq("corp_id", "j"))
      .groupBy(col("in_id"), col("corp_id"))
      .agg(sum(when(col("mh_in") === col("mh_c"), 1L).otherwise(0L)).as("n_eq"))
      .filter(col("n_eq") >= minEq)
      .select(col("in_id").as("doc_id")).distinct()
      .withColumn("is_near", lit(1))
    val out = incoming.select(col("doc_id"))
      .join(exactIds, Seq("doc_id"), "left")
      .join(nearIds, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact").isNotNull, lit("exact_dup"))
          .when(col("is_near").isNotNull, lit("near_dup"))
          .otherwise(lit("novel")).as("status"))
      .localCheckpoint(false)
    inSig.unpersist(); corpSig.unpersist()
    out
  }

  /** Exact word-set Jaccard for all pairs in `docs` (quadratic — callers
    * must pre-restrict, e.g. to LSH candidates or a bounded id range). */
  /** Exact Jaccard-threshold self-join with PREFIX FILTERING (the
    * PPJoin/AllPairs trick): a pair with Jaccard ≥ τ must share at least
    * one token among each side's first L = |s| − ⌈τ·|s|⌉ + 1 tokens under
    * a GLOBAL rarest-first ordering — so only prefix tokens generate
    * candidates, and the frequent tokens that dominate the quadratic
    * blow-up of the naive token join never pair up. Verification then
    * computes the exact intersection for the (few) candidates, so the
    * result is IDENTICAL to filtering [[jaccardPairs]] at τ — the filter
    * is lossless by the prefix pigeonhole.
    *
    * Scale: candidate generation shuffles only prefix tokens (rarest
    * first ⇒ smallest possible join fan-out); verification is two
    * equi-joins of the candidate pairs back to the token table, keyed by
    * doc — no quadratic stage touches full token lists. τ is an e6
    * integer and the threshold test is cross-multiplied
    * (inter·1e6 ≥ τ·union), so no division rounding.
    */
  def jaccardPrefixJoin(docs: DataFrame, tauE6: Long): DataFrame = {
    require(tauE6 > 0L && tauE6 <= 1000000L, "tauE6 must be in (0, 1e6]")
    val w = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "").distinct().localCheckpoint(false)
    val freq = w.groupBy(col("word")).agg(count(lit(1)).as("df"))
    // rarest-first global order; doc-local rank + size drive the prefix cut
    val ranked = w.join(freq, "word")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("word"))))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("pfx", col("sz") - expr(s"(sz * ${tauE6}L + 999999) div 1000000") + 1)
    val prefix = ranked.filter(col("rk") <= col("pfx"))
      .select(col("doc_id"), col("word"), col("sz"))
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id") &&
          // length filter: |b| ≥ τ·|a| is necessary for J ≥ τ (a < b by id,
          // sizes unordered — bound both directions)
          col("b.sz") * lit(1000000L) >= col("a.sz") * lit(tauE6) &&
          col("a.sz") * lit(1000000L) >= col("b.sz") * lit(tauE6))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sza"), col("b.sz").as("szb"))
      .distinct()
    cands
      .join(w.select(col("doc_id").as("doc_a"), col("word")), "doc_a")
      .join(w.select(col("doc_id").as("doc_b"), col("word")), Seq("doc_b", "word"))
      .groupBy(col("doc_a"), col("doc_b"), col("sza"), col("szb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("sza") + col("szb") - col("inter"))
      .filter(col("inter") * lit(1000000L) >= lit(tauE6) * col("uni"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"))
  }

  /** WEIGHTED (term-frequency) Jaccard self-join: J_w(A,B) =
    * Σ_t min(tf_A(t), tf_B(t)) / Σ_t max(tf_A(t), tf_B(t)) — repeated
    * terms count, so boilerplate-heavy near-dups that set-Jaccard misses
    * (same vocabulary, very different emphasis) separate cleanly. Uses
    * the identity Σ max = tot_A + tot_B − Σ min: only the SHARED terms
    * ever join; per-doc totals ride in from a pre-aggregate. Threshold
    * test is cross-multiplied (min·1e6 ≥ τ·union) — all-integer.
    *
    * Scale: one token-count aggregate, one equi-join on the term
    * (frequent terms dominate fan-out exactly as in [[jaccardPairs]] —
    * the prefix filter of [[jaccardPrefixJoin]] composes here too), one
    * pair aggregate, two broadcast-size joins for the totals.
    */
  def weightedJaccardPairs(docs: DataFrame, tauE6: Long): DataFrame = {
    require(tauE6 > 0L && tauE6 <= 1000000L, "tauE6 must be in (0, 1e6]")
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val tot = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("tot"))
    val shared = tf.as("a").join(tf.as("b"),
        col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(least(col("a.tf"), col("b.tf"))).as("wmin"))
    shared
      .join(tot.select(col("doc_id").as("doc_a"), col("tot").as("tota")), "doc_a")
      .join(tot.select(col("doc_id").as("doc_b"), col("tot").as("totb")), "doc_b")
      .withColumn("wuni", col("tota") + col("totb") - col("wmin"))
      .filter(col("wmin") * lit(1000000L) >= lit(tauE6) * col("wuni"))
      .select(col("doc_a"), col("doc_b"), col("wmin"), col("wuni"))
  }

  /** [[jaccardPrefixJoin]] with a LENGTH-SCALED threshold: short
    * documents demand a stricter Jaccard than long ones (a 4-token doc
    * matching 2 tokens is noise; a 400-token doc overlapping 55% is a
    * near-dup), so τ is a step function of the SMALLER document's size,
    * supplied as a broadcast table (len_lo, len_hi, tau_e6) of
    * disjoint [lo, hi) bands covering every size. A pair qualifies iff
    * jacc ≥ τ(min(|A|, |B|)).
    *
    * Lossless prefix filtering still holds per doc with τ_doc = the
    * threshold at ITS OWN size under one condition on the table: τ must
    * be NON-INCREASING in length. Then for any valid pair,
    * τ_pair = τ(min size) ≤ τ_doc of each side… and the pigeonhole
    * needs α ≥ ⌈τ_doc·|D|⌉ for each doc D: α ≥ τ_pair·|A∪B| ≥
    * τ_pair·|D| — which only bounds τ_pair prefixes. So each doc's
    * prefix uses τ(its own size) when it is the SMALLER side, i.e. the
    * safe per-doc prefix takes the threshold AT the doc's size, which
    * for the larger side over-extends (τ non-increasing ⇒ its τ is ≤
    * the pair's τ ⇒ longer prefix ⇒ superset of candidates). Lossless
    * either way; the monotonicity requirement is validated.
    */
  def jaccardPrefixJoinAdaptive(docs: DataFrame,
                                thresholds: DataFrame): DataFrame = {
    val bands = thresholds.select(col("len_lo"), col("len_hi"), col("tau_e6"))
    // validate non-increasing τ over ascending bands (driver-side: the
    // table is definitionally tiny)
    val collected = bands.orderBy(col("len_lo")).collect()
    require(collected.nonEmpty, "thresholds must be non-empty")
    collected.sliding(2).foreach {
      case Array(a, b) =>
        require(a.getLong(1) == b.getLong(0),
          "threshold bands must tile contiguously")
        require(a.getLong(2) >= b.getLong(2),
          "tau must be non-increasing in length (else the prefix filter is lossy)")
      case _ => ()
    }
    val w = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "").distinct().localCheckpoint(false)
    val freq = w.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val ranked = w.join(freq, "word")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("word"))))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .join(broadcast(bands),
        col("sz") >= col("len_lo") && col("sz") < col("len_hi"))
      .withColumn("pfx",
        col("sz") - expr("(sz * tau_e6 + 999999) div 1000000") + 1)
    val prefix = ranked.filter(col("rk") <= col("pfx"))
      .select(col("doc_id"), col("word"), col("sz"))
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sza"), col("b.sz").as("szb"))
      .distinct()
    cands
      .join(w.select(col("doc_id").as("doc_a"), col("word")), "doc_a")
      .join(w.select(col("doc_id").as("doc_b"), col("word")), Seq("doc_b", "word"))
      .groupBy(col("doc_a"), col("doc_b"), col("sza"), col("szb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("sza") + col("szb") - col("inter"))
      .join(broadcast(bands),
        least(col("sza"), col("szb")) >= col("len_lo") &&
          least(col("sza"), col("szb")) < col("len_hi"))
      .filter(col("inter") * lit(1000000L) >= col("tau_e6") * col("uni"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"),
        col("tau_e6").as("tau_applied_e6"))
  }

  def jaccardPairs(docs: DataFrame): DataFrame = {
    val w = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "").distinct()
    val sizes = w.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = w.as("a").join(w.as("b"),
        col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("sza") + col("szb") - col("inter")).as("uni"),
        round(col("inter") * lit(1.0) / (col("sza") + col("szb") - col("inter")), 6).as("jacc"))
  }

  /** Sorted-neighborhood blocking for entity resolution: order the
    * corpus by a cheap blocking key (here (lang, n_chars, doc_id) — a
    * TOTAL order, doc_id breaks ties), slide a window of `w`, and score
    * only pairs within rank distance ≤ w by exact token Jaccard,
    * keeping pairs with jac_e6 ≥ `tauE6` (truncating e6 division on
    * positives — both engines agree). Output: (doc_a, doc_b, gap,
    * jac_e6), doc_a the lower-ranked side.
    *
    * Scale: the global rank is DISTRIBUTED — range-repartition on the
    * key, per-partition row_number (keyed window), plus broadcast
    * partition-count offsets; no single-partition sort. Pair generation
    * is a keyed self-join on rank blocks of size w (each row probes its
    * own and its successor block), so candidates are exactly n·w, never
    * quadratic; the Jaccard verify joins token lists only for
    * candidates. */
  def sortedNeighborPairs(docs: DataFrame, w: Int, tauE6: Long,
                          parts: Int = 8): DataFrame = {
    require(w >= 1 && tauE6 >= 0L)
    // Global sort-key rank via Ranks.globalRowNumber (range partitions +
    // monotonic-id local index + broadcast offsets): the earlier inline
    // form windowed by partition id, which re-shuffled the full corpus a
    // second time; the helper's local index needs no window at all.
    val ranked = Ranks.globalRowNumber(
        docs.select(col("doc_id"), col("lang"), col("n_chars")),
        Seq(col("lang"), col("n_chars"), col("doc_id")), "r", parts)
      .select(col("doc_id"), col("r"))
      .withColumn("blk", expr(s"(r - 1) div $w")) // integer div: `/` is double
      .localCheckpoint(false)
    val probes = ranked.select(col("doc_id"), col("r"),
      explode(array(col("blk"), col("blk") + 1L)).as("blk"))
    val cands = probes.as("a")
      .join(ranked.as("b"), col("a.blk") === col("b.blk") &&
        col("b.r") > col("a.r") && col("b.r") <= col("a.r") + w)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (col("b.r") - col("a.r")).as("gap"))
      .distinct()
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "").distinct().localCheckpoint(false)
    val sizes = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    cands
      .join(tok.select(col("doc_id").as("doc_a"), col("word")), "doc_a")
      .join(tok.select(col("doc_id").as("doc_b"), col("word")),
        Seq("doc_b", "word"))
      .groupBy(col("doc_a"), col("doc_b"), col("gap"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
      .selectExpr("doc_a", "doc_b", "gap",
        "CAST(inter * 1000000 div (sza + szb - inter) AS BIGINT) AS jac_e6")
      .filter(col("jac_e6") >= tauE6)
  }

  /** Asymmetric CONTAINMENT self-join: directed pairs (A, B) with
    * C(A→B) = |tok(A) ∩ tok(B)| / |tok(A)| ≥ τ — catches documents
    * swallowed whole by longer ones (the case symmetric Jaccard misses,
    * and the one that matters for training-data dedup: a page embedded
    * in a crawl of its site). Threshold test is cross-multiplied
    * (inter·10⁶ ≥ τ·|A|): all-integer. Output: (doc_a, doc_b, inter,
    * sza) with doc_a the CONTAINED side; both directions can emit.
    *
    * Lossless prefix filter, containment flavor: a qualifying pair has
    * inter ≥ ⌈τ·|A|⌉, so A misses at most |A| − ⌈τ|A|⌉ of its tokens
    * from B — A's rarest-first prefix of length |A| − ⌈τ|A|⌉ + 1 must
    * hit B (pigeonhole). Only A is prefixed (B is unconstrained in
    * containment); the candidate join probes A-prefix tokens against
    * the full index, and those tokens are globally rarest-first, so
    * posting lists stay short. |B| ≥ τ·|A| prunes before the verify. */
  def containmentPrefixJoin(docs: DataFrame, tauE6: Long): DataFrame = {
    require(tauE6 > 0L && tauE6 <= 1000000L, "tauE6 must be in (0, 1e6]")
    val w = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "").distinct().localCheckpoint(false)
    val freq = w.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val ranked = w.join(freq, "word")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("word"))))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("pfx", col("sz") - expr(s"(sz * ${tauE6}L + 999999) div 1000000") + 1)
    val prefix = ranked.filter(col("rk") <= col("pfx"))
      .select(col("doc_id"), col("word"), col("sz"))
    val sizes = ranked.select(col("doc_id"), col("sz")).distinct()
    val full = w.join(sizes, "doc_id")
    val cands = prefix.as("a").join(full.as("b"),
        col("a.word") === col("b.word") && col("a.doc_id") =!= col("b.doc_id") &&
          col("b.sz") * lit(1000000L) >= col("a.sz") * lit(tauE6))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sza"))
      .distinct()
    cands
      .join(w.select(col("doc_id").as("doc_a"), col("word")), "doc_a")
      .join(w.select(col("doc_id").as("doc_b"), col("word")), Seq("doc_b", "word"))
      .groupBy(col("doc_a"), col("doc_b"), col("sza"))
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter") * lit(1000000L) >= lit(tauE6) * col("sza"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("sza"))
  }
}
