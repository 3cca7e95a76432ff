package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Hand-worked fixtures for the round-10 additions. The driver's oracle
  * gate proves Spark == DuckDB, but both twins encode the SAME authored
  * math — a shared semantic error (wrong quadrant rule, a mis-derived
  * IRLS step, a wrong ladder constant) would sail through it. Each test
  * here runs the REGISTRY query fn on a tiny synthetic table directory
  * and checks against numbers derived independently (plain-Scala
  * arithmetic from the textbook definition, or a closed form the
  * fixture was designed to hit).
  */
class QueryHandFixtureSpec extends SparkSpec {

  private def dir(): String =
    Files.createTempDirectory("graft_fix").toString

  private def run(name: String, d: String) =
    SparkEntry.queries(name)(spark, d)

  private def writeOrders(d: String,
                          rows: Seq[(Long, Long, String, Double, String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "od", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("od")))
      .drop("od")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
  }

  private def writeCustomer(d: String,
                            rows: Seq[(Long, String, Int, Double, String)]): Unit = {
    import spark.implicits._
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
  }

  private def writeEvents(d: String,
                          rows: Seq[(Long, String, Long, String, Double, String)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "ts0", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts0")))
      .drop("ts0")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
  }

  // ── LISA: independent plain-Scala reimplementation on a 3-band grid.
  test("q_local_morans matches a from-scratch Scala LISA on a hand grid") {
    val d = dir()
    // user ids chosen for known bands: band(u) = (u*37 % 17000) div 500
    //   u=100 → 3700 → band 7;  u=200 → 7400 → band 14;  u=300 → 11100 → 22
    // counts: band7 ×6, band14 ×1, band22 ×2  (n=3 bands, sx=9)
    val us = Seq.fill(6)(100L) ++ Seq(200L) ++ Seq.fill(2)(300L)
    writeEvents(d, us.zipWithIndex.map { case (u, i) =>
      (i.toLong, "2024-01-01 00:00:00", u, "ping", 1.0, "{}")
    })
    // independent math: z_b = n*x_b - sx over bands sorted by id
    val counts = Map(7L -> 6L, 14L -> 1L, 22L -> 2L)
    val n = counts.size.toLong
    val sx = counts.values.sum
    val z = counts.map { case (b, x) => b -> (n * x - sx) } // 7→9,14→-6,22→-3
    // rook adjacency on the band AXIS (|Δband|=1): these bands are all
    // isolated → every lag is 0, every quadrant NA, local_i = 0
    val out = run("q_local_morans", d)
      .select("band", "z", "wdeg", "lag_z", "quadrant")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(7L, 14L, 22L))
    out.foreach { case (b, zv, wdeg, lag, quad) =>
      assert(zv === z(b), s"z mismatch at band $b")
      assert(wdeg === 0L && lag === 0L && quad === "NA",
        s"isolated band $b must have no neighbors and quadrant NA")
    }

    // second grid: adjacent hot bands 7,8 vs a cold 22 → HH/HH/NA.
    val u8 = (1L to 5000L).find(u => (u * 37 % 17000) / 500 == 8).get
    val us2 = Seq.fill(5)(100L) ++ Seq.fill(5)(u8) ++ Seq.fill(2)(300L)
    val d2 = dir()
    writeEvents(d2, us2.zipWithIndex.map { case (u, i) =>
      (i.toLong, "2024-01-01 00:00:00", u, "ping", 1.0, "{}")
    })
    // counts: b7=5, b8=5, b22=2; n=3, sx=12 → z: 7→3, 8→3, 22→-6
    // lag: b7←z8=3, b8←z7=3, b22→0; zz=54; I₇ = 3·3·3/54 = 0.5
    val out2 = run("q_local_morans", d2)
      .select("band", "z", "lag_z", "quadrant", "local_i")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).sortBy(_._1)
    assert(out2.toSeq === Seq((7L, 3L, 3L, "HH", 0.5),
      (8L, 3L, 3L, "HH", 0.5), (22L, -6L, 0L, "NA", 0.0)))
  }

  // ── AIPW: closed hand computation on a 2-segment / 2-band fixture.
  test("q_aipw_att equals the hand-computed doubly-robust ATT") {
    val d = dir()
    // customers: segment A band0 (bal 0), segment B band1 (bal 2000)
    writeCustomer(d, Seq(
      (1L, "a", 0, 0.0, "SEGA"), (2L, "b", 0, 0.0, "SEGA"),
      (3L, "c", 0, 2000.0, "SEGB"), (4L, "d", 0, 2000.0, "SEGB")))
    // orders: y in hecto-dollars = floor(price)/100
    //   SEGA: cust1 urgent y=30, cust2 control y=10  → e=1/2, w=e/(1-e)=1
    //   SEGB: cust3 urgent y=50, cust4 control y=20  → e=1/2, w=1
    // bands: band(bal0)=(0+1000)div2000=0, band(2000)=(3000)div2000=1
    // μ0(band0)=10, μ0(band1)=20
    // treated resid: (30-10)+(50-20)=50 ; control resid: w*(10-10)+w*(20-20)=0
    // ATT = (50 - 0)/2 = 25
    writeOrders(d, Seq(
      (1L, 1L, "F", 3000.0, "1996-01-01 00:00:00", "1-URGENT"),
      (2L, 2L, "F", 1000.0, "1996-01-01 00:00:00", "3-MEDIUM"),
      (3L, 3L, "F", 5000.0, "1996-01-01 00:00:00", "1-URGENT"),
      (4L, 4L, "F", 2000.0, "1996-01-01 00:00:00", "3-MEDIUM")))
    val r = run("q_aipw_att", d).collect()(0)
    assert(r.getAs[Long]("n_treated") === 2L)
    assert(r.getAs[Long]("n_control") === 2L)
    assert(r.getAs[Double]("att_aipw_h") === 25.0)
  }

  // ── Poisson IRLS: exact-rational step and ladder MLE on a 2:1 rate.
  test("q_poisson_irls one-step and MLE on an exact 2:1 weekend rate") {
    val d = dir()
    // day%7∈{2,3} is "weekend". epoch day of 1970-01-03 is 2 (Sat).
    // weekend days: day 2 (8 orders), day 3 (8 orders)  → ȳ1 = 8
    // weekday days: day 4 (4 orders), day 5 (4 orders)  → ȳ0 = 4
    // β1_mle = ln(8/4) = ln2 = 0.693147...
    // β1_step = (ȳ1-ȳ0)/ȳ = 4/6 = 0.666667
    val days = Seq(("1970-01-03", 8), ("1970-01-04", 8),
      ("1970-01-05", 4), ("1970-01-06", 4))
    val rows = days.flatMap { case (day, k) =>
      (1 to k).map(i => (day, i))
    }.zipWithIndex.map { case ((day, _), i) =>
      (i.toLong, i.toLong, "F", 100.0, s"$day 00:00:00", "3-MEDIUM")
    }
    writeOrders(d, rows)
    val r = run("q_poisson_irls", d).collect()(0)
    assert(r.getAs[Long]("orders_weekend") === 16L)
    assert(r.getAs[Long]("orders_weekday") === 8L)
    assert(math.abs(r.getAs[Double]("beta1_step") - 4.0 / 6.0) < 1e-6)
    // ladder: s1*n0=32, s0*n1=16 are powers of two → log2 diff is EXACT
    assert(math.abs(r.getAs[Double]("beta1_mle") - 0.693147) < 1e-6)
  }

  // ── Weibull: ladder fit vs libm truth on a deterministic quantile grid.
  test("q_weibull_fit recovers k≈2, λ≈500 USD from an inverse-CDF grid") {
    val d = dir()
    val k = 2.0
    val lam = 50000.0 // cents
    val n = 400
    val rows = (1 to n).map { i =>
      val u = i.toDouble / (n + 1)
      val y = lam * math.pow(-math.log1p(-u), 1.0 / k) // cents
      (i.toLong, i.toLong, "F", y / 100.0, "1996-01-01 00:00:00",
        "3-MEDIUM")
    }
    writeOrders(d, rows)
    val r = run("q_weibull_fit", d).collect()(0)
    val kHat = r.getAs[Double]("k_hat")
    val lamHat = r.getAs[Long]("lambda_cents").toDouble
    // log-moment MoM on a quantile grid + 5-bit ladder: ±10% is the
    // honest tolerance (ladder mantissa ±2%, MoM small-sample bias)
    assert(kHat > 1.8 && kHat < 2.2, s"k_hat=$kHat not near 2")
    assert(lamHat > 0.85 * lam && lamHat < 1.15 * lam,
      s"lambda_cents=$lamHat not near $lam")
  }

  // ── Qini: final cumulative point equals the hand total uplift.
  test("q_qini_uplift final band equals hand Y_t - Y_c*N_t/N_c") {
    val d = dir()
    // one band (all bal 0); treated: 3 orders 2 converted (status F);
    // control: 6 orders 2 converted. Qini = 2 - 2*(3/6) = 1.0
    writeCustomer(d, Seq((1L, "a", 0, 0.0, "SEGA")))
    val t = Seq(("1-URGENT", "F"), ("1-URGENT", "F"), ("1-URGENT", "O"))
    val c = Seq(("3-MEDIUM", "F"), ("3-MEDIUM", "F"), ("3-MEDIUM", "O"),
      ("3-MEDIUM", "O"), ("3-MEDIUM", "O"), ("3-MEDIUM", "O"))
    writeOrders(d, (t ++ c).zipWithIndex.map { case ((pri, st), i) =>
      (i.toLong, 1L, st, 100.0, "1996-01-01 00:00:00", pri)
    })
    val rows = run("q_qini_uplift", d).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[Double]("qini_cum") === 1.0)
  }

  // ── GPD: a uniform tail must fit ξ≈−1, β≈tail width. This test
  //    exists because the first cut shipped m²/s² with a stray factor
  //    n (ξ read −5583) — the oracle twin shared the bug; only the
  //    known-distribution read caught it.
  test("q_gpd_fit recovers xi=-1, beta=width on a uniform grid") {
    val d = dir()
    // totalprice uniform grid 1..500 dollars → mean 250.5, u = 375
    // (3·mean/2 in cents, integer-div), excesses uniform on (0, ~125$]
    writeOrders(d, (1 to 500).map { i =>
      (i.toLong, i.toLong, "F", i.toDouble, "1996-01-01 00:00:00",
        "3-MEDIUM")
    })
    val r = run("q_gpd_fit", d).collect()(0)
    val xi = r.getAs[Double]("xi")
    val beta = r.getAs[Double]("beta_cents")
    assert(xi > -1.1 && xi < -0.9, s"xi=$xi not near -1 (uniform tail)")
    assert(beta > 10000 && beta < 15000,
      s"beta=$beta cents not near the ~12500-cent tail width")
  }

  // ── Lot sizing: hand DP on a 3-month demand vector.
  test("q_lot_sizing equals the hand Wagner-Whitin DP") {
    val d = dir()
    import spark.implicits._
    // months (30-day buckets from epoch): demands 100, 10, 10 units.
    // K = 1e7 cents, h = 1 cent/unit/month.
    //   setups {0}: K + 0·100 + 1·10 + 2·10 = K+30
    //   setups {0,1}: 2K + 10  ; {0,2}: 2K + 10 ; {0,1,2}: 3K
    //   → optimal = K + 30 = 10000030
    val rows = Seq((0, 100), (1, 10), (2, 10)).flatMap { case (m, k) =>
      (1 to k).map(i => (m, i))
    }
    rows.zipWithIndex.map { case ((m, _), i) =>
        // day inside month m of 30-day buckets
        val ts = java.time.Instant.ofEpochSecond(m * 2592000L + 1000L)
        (i.toLong, i.toLong, 1L, 1, 1.0, 100.0, 0.0, 0.0, "N", "O",
          java.sql.Timestamp.from(ts))
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = run("q_lot_sizing", d).collect()(0)
    assert(r.getAs[Long]("n_months") === 3L)
    assert(r.getAs[Long]("opt_cost_cents") === 10000030L)
    assert(r.getAs[Long]("single_setup_cents") === 10000030L)
    assert(r.getAs[Long]("monthly_setup_cents") === 30000000L)
  }

  // ── Rank distance: a designed 4-element reversal hits the maxima.
  test("q_rank_distance on a revenue reversal hits exact maxima") {
    val d = dir()
    import spark.implicits._
    // 4 brands; 1996 revenue order B1>B2>B3>B4, 1997 exactly reversed.
    // footrule = |1-4|+|2-3|+|3-2|+|4-1| = 8 = ⌊16/2⌋ → footrule_e6 = 1e6
    // every pair discordant → kendall_e6 = 1e6
    Seq((1L, "B1"), (2L, "B2"), (3L, "B3"), (4L, "B4"))
      .toDF("p_partkey", "p_brand")
      .withColumn("p_name", lit("x")).withColumn("p_type", lit("t"))
      .withColumn("p_size", lit(1)).withColumn("p_retailprice", lit(1.0))
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    val li = (1 to 4).flatMap { b =>
      Seq((s"1996-06-01", b, (5 - b) * 1000.0),
        (s"1997-06-01", b, b * 1000.0))
    }
    li.zipWithIndex.map { case ((day, pk, price), i) =>
        (i.toLong, pk.toLong, 1L, 1, 1.0, price, 0.0, 0.0, "N", "O", day)
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "sd")
      .withColumn("l_shipdate", to_timestamp(col("sd"))).drop("sd")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = run("q_rank_distance", d).collect()(0)
    assert(r.getAs[Long]("n_brands") === 4L)
    assert(r.getAs[Long]("footrule") === 8L)
    assert(r.getAs[Long]("footrule_e6") === 1000000L)
    assert(r.getAs[Long]("kendall_e6") === 1000000L)
  }
}
