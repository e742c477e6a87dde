package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def naiveTopK(k: Int, nQ: Int): Map[Long, Seq[Long]] = {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    vecs.filter(_._1 < nQ).map { case (qid, q) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, BigDecimal(cos(q, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSeq
    }.toMap
  }

  test("cosineTopK matches a naive driver-side computation (sf0.001)") {
    val got = Similarity.cosineTopK(spark, sf, 5, 10)
      .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._3).map(_._2).toSeq }
    assert(got === naiveTopK(10, 5))
  }

  test("knnClassify matches a naive driver-side vote (sf0.001)") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding", "label")
      .as[(Long, Seq[Float], String)].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // fixed 50-query budget mirrors knnClassify's default nQueries=50
    val corpus = vecs.filter(_._1 >= 50)
    val expected = vecs.filter(_._1 < 50).map { case (qid, q, actual) =>
      val top = corpus.map { case (id, v, label) =>
        (id, label, BigDecimal(cos(q, v))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (id, _, c) => (-c, id) }.take(10)
      val (label, votes) = top.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.minBy { case (l, n) => (-n, l) }
      (qid, label, votes, actual)
    }.sortBy(_._1).toSeq
    val got = Similarity.knnClassify(spark, sf)
      .as[(Long, String, Long, String)].collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("annTopK recall vs exact top-k is usable and all results are true cosines") {
    val exact = naiveTopK(10, 5)
    val ann = Similarity.annTopK(spark, sf, 5, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recalls = exact.map { case (q, ids) =>
      ann.get(q).map(found => ids.count(found).toDouble / ids.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean ANN recall $mean too low — LSH bucketing broken?")
  }

  test("ivfTopK (k-means cells) recall vs exact top-k >= 0.8") {
    val exact = naiveTopK(10, 5)
    val ivf = Similarity.ivfTopK(spark, sf, 5, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recalls = exact.map { case (q, ids) =>
      ivf.get(q).map(found => ids.count(found).toDouble / ids.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean IVF recall $mean below 0.8 — k-means cells or probing broken?")
  }

  test("LSH/IVF paths run on a non-64-dim corpus (dim read from schema)") {
    // 16-dim synthetic corpus shaped like an sfDir: the planes/centroids
    // must be generated at the TABLE's width, not the testdata's 64 — a
    // baked-in 64 would dot 64-weight planes against 16-long vectors.
    val dir = java.nio.file.Files.createTempDirectory("graft_dim16_").toString
    try {
      val rnd = new scala.util.Random(11)
      val rows = (0L until 80L).map { i =>
        (i, Seq.fill(16)(rnd.nextGaussian().toFloat), (i % 4).toInt)
      }
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      assert(graft.operators.Similarity.embeddingDim(spark, dir) === 16)

      val vecs = rows.map { case (id, v, _) => id -> v }.toMap
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          dot += a(i).toDouble * b(i).toDouble
          na += a(i).toDouble * a(i).toDouble
          nb += b(i).toDouble * b(i).toDouble; i += 1
        }
        BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val ann = Similarity.annTopK(spark, dir, 3, 5)
        .select("query_id", "vec_id", "cosine")
        .as[(Long, Long, Double)].collect()
      assert(ann.nonEmpty, "annTopK empty on 16-dim corpus")
      ann.foreach { case (q, v, c) =>
        assert(c === cos(vecs(q), vecs(v)),
          s"ann cosine for ($q,$v) is not the true 16-dim cosine")
      }
      val serve = Similarity.ivfServeTopK(spark, dir, 3, 5)
        .select("query_id", "vec_id", "cosine")
        .as[(Long, Long, Double)].collect()
      assert(serve.nonEmpty, "ivfServeTopK empty on 16-dim corpus")
      serve.foreach { case (q, v, c) =>
        assert(c === cos(vecs(q), vecs(v)),
          s"serve cosine for ($q,$v) is not the true 16-dim cosine")
      }
      val kept = Similarity.semDedup(spark, dir, 0.3).collect()
      assert(kept.nonEmpty, "semDedup empty on 16-dim corpus")
    } finally graft.util.Scratch.deleteRecursively(dir)
  }

  test("pqTopK == driver-side PQ encode + ADC ranking, bit-for-bit") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val dim = vecs.head._2.length
    // rebuild codebooks[m][c] from the public rows accessor
    val cb = Similarity.pqCodebookRows
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3.toArray).toArray).toArray
    val m = cb.length; val sub = dim / m
    def subDist(v: Seq[Float], mi: Int, code: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < sub) {
        val d = v(mi * sub + i).toDouble - code(i); s += d * d; i += 1
      }
      s
    }
    def encode(v: Seq[Float]): Array[Int] =
      Array.tabulate(m) { mi =>
        // strictly-less fold: first (lowest id) minimum wins
        var best = Double.MaxValue; var bi = -1; var c = 0
        while (c < cb(mi).length) {
          val d = subDist(v, mi, cb(mi)(c)); if (d < best) { best = d; bi = c }
          c += 1
        }
        bi
      }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val codes = vecs.map { case (id, v) => id -> encode(v) }.toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = vecs.toMap
    val want = (for {
      (qid, q) <- vecs.toSeq if qid < 10
      winners = vecs.filter(_._1 != qid)
        .map { case (id, _) =>
          var adc = 0.0; var mi = 0
          while (mi < m) { adc += subDist(q, mi, cb(mi)(codes(id)(mi))); mi += 1 }
          (id, r6(adc))
        }
        .sortBy { case (id, d) => (d, id) }.take(10)
      ((id, d), rk) <- winners.zipWithIndex
    } yield (qid, id, d, r6(cos(q, byId(id))), rk + 1)).toSet
    val got = Similarity.pqTopK(spark, sf, 10, 10)
      .as[(Long, Long, Double, Double, Int)].collect().toSet
    assert(got === want)
  }

  test("binaryTopK == driver-side sign-bit prefilter + exact rerank") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    def signBits(v: Seq[Float]): Long = {
      var w = 0L; var i = 0
      while (i < v.length) { if (v(i) >= 0) w |= (1L << i); i += 1 }
      w
    }
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bits = vecs.map { case (id, v) => id -> signBits(v) }.toMap
    val byId = vecs.toMap
    val want = (for {
      (qid, q) <- vecs.toSeq if qid < 10
      cand = vecs.filter(_._1 != qid)
        .map { case (id, _) =>
          (id, java.lang.Long.bitCount(bits(qid) ^ bits(id)))
        }
        .sortBy { case (id, h) => (h, id) }.take(30)
      winners = cand.map { case (id, _) => (id, r6(cos(q, byId(id)))) }
        .sortBy { case (id, c) => (-c, id) }.take(10)
      ((id, c), rk) <- winners.zipWithIndex
    } yield (qid, id, c, rk + 1)).toSet
    val got = Similarity.binaryTopK(spark, sf, 10, 10)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === want)
  }

  test("ivfPqTopK == driver-side IVF probe + ADC rank + exact rerank, bit-for-bit") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val dim = vecs.head._2.length
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // mixed-width cosine (float corpus × double centroid), -2.0 floor
    def cosFD(a: Seq[Float], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i)
        na += a(i).toDouble * a(i).toDouble
        nb += b(i) * b(i); i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) -2.0 else dot / den
    }
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = Similarity.ivfCentroidRows
    // cell scores per vector; argmax assignment (ties lowest id) and
    // per-query top-3 probes (score desc, id asc) — the serve contract
    def scores(v: Seq[Float]): Seq[(Int, Double)] =
      cents.map { case (cid, c) => (cid, cosFD(v, c)) }
    val assign = vecs.map { case (id, v) =>
      id -> scores(v).maxBy { case (cid, s) => (s, -cid) }._1
    }.toMap
    val probes = vecs.filter(_._1 < 10).map { case (qid, q) =>
      qid -> scores(q).sortBy { case (cid, s) => (-s, cid) }.take(3)
        .map(_._1).toSet
    }.toMap
    // PQ encode from the public codebook rows (same recompute as the
    // pqTopK spec)
    val cb = Similarity.pqCodebookRows
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3.toArray).toArray).toArray
    val m = cb.length; val sub = dim / m
    def subDist(v: Seq[Float], mi: Int, code: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < sub) {
        val d = v(mi * sub + i).toDouble - code(i); s += d * d; i += 1
      }
      s
    }
    def encode(v: Seq[Float]): Array[Int] =
      Array.tabulate(m) { mi =>
        var best = Double.MaxValue; var bi = -1; var c = 0
        while (c < cb(mi).length) {
          val d = subDist(v, mi, cb(mi)(c)); if (d < best) { best = d; bi = c }
          c += 1
        }
        bi
      }
    val codes = vecs.map { case (id, v) => id -> encode(v) }.toMap
    val byId = vecs.toMap
    val want = (for {
      (qid, q) <- vecs.toSeq if qid < 10
      cand = vecs.filter { case (id, _) =>
          id != qid && probes(qid).contains(assign(id)) }
        .map { case (id, _) =>
          var adc = 0.0; var mi = 0
          while (mi < m) { adc += subDist(q, mi, cb(mi)(codes(id)(mi))); mi += 1 }
          (id, r6(adc))
        }
        .sortBy { case (id, d) => (d, id) }.take(30)
      winners = cand.map { case (id, _) => (id, r6(cos(q, byId(id)))) }
        .sortBy { case (id, c) => (-c, id) }.take(10)
      ((id, c), rk) <- winners.zipWithIndex
    } yield (qid, id, c, rk + 1)).toSet
    val got = Similarity.ivfPqTopK(spark, sf, 10, 10)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === want)
    // the composition must actually PRUNE: each query's candidate pool is
    // a strict subset of the corpus (3 of 8 cells probed)
    val pool = vecs.count { case (id, _) => probes(0L).contains(assign(id)) }
    assert(pool < vecs.length, "probing did not bound the candidate set")
  }

  test("centroidClassify == driver-side prototype argmax confusion matrix") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding", "label")
      .as[(Long, Seq[Float], Int)].collect()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // prototypes via the exact micro-unit moment recipe
    val cells = rows.flatMap { case (_, v, l) =>
      v.zipWithIndex.map { case (x, d) =>
        ((l, d), math.floor(x.toDouble * 1e6 + 0.5).toLong)
      }
    }.groupBy(_._1).map { case ((l, d), vs) =>
      ((l, d), r6(vs.map(_._2).sum.toDouble / (vs.length.toDouble * 1e6)) + 0.0)
    }
    val labels = cells.keys.map(_._1).toSeq.distinct.sorted
    val cents = labels.map { l =>
      l -> cells.filter(_._1._1 == l).toSeq.sortBy(_._1._2).map(_._2)
    }
    def cosFD(a: Seq[Float], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i)
        na += a(i).toDouble * a(i).toDouble
        nb += b(i) * b(i); i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) -2.0 else r6(dot / den)
    }
    val want = rows.map { case (_, v, actual) =>
      // score DESC, label ASC — the NB argmax convention
      val pred = cents.map { case (l, c) => (l, cosFD(v, c)) }
        .maxBy { case (l, s) => (s, -l) }._1
      (actual, pred)
    }.groupBy(identity).map { case ((a, p), xs) => (a, p, xs.length.toLong) }
      .toSet
    val got = Similarity.centroidClassify(spark, sf)
      .as[(Int, Int, Long)].collect().toSet
    assert(got === want)
  }

  test("hardNegatives == driver-side conditional argmax (ties to lowest id)") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding", "label")
      .as[(Long, Seq[Float], Int)].collect()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) -2.0 else r6(dot / den)
    }
    val want = rows.filter(_._1 < 50).map { case (qid, q, ql) =>
      def pick(cond: Int => Boolean): Option[(Long, Double)] = {
        val cand = rows.filter { case (id, _, l) => id != qid && cond(l) }
          .map { case (id, v, _) => (id, cos(q, v)) }
        if (cand.isEmpty) None
        else Some(cand.minBy { case (id, c) => (-c, id) })
      }
      val pos = pick(_ == ql); val neg = pick(_ != ql)
      (qid, ql, pos.map(_._1), pos.map(_._2), neg.map(_._1), neg.map(_._2),
        for (p <- pos; n <- neg) yield r6(p._2 - n._2) + 0.0)
    }.toSet
    val got = Similarity.hardNegatives(spark, sf).collect().map { r =>
      def oL(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      def oD(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      (r.getLong(0), r.getInt(1), oL(2), oD(3), oL(4), oD(5), oD(6))
    }.toSet
    assert(got === want)
    // the margin must actually be "hard": at least one query's impostor
    // beats its positive on this isotropic corpus
    assert(got.exists(_._7.exists(_ < 0)))
  }

  test("hardNegatives: a query with no candidates still emits its row (NULL mined)") {
    // single-vector corpus: the oracle LEFT JOINs from the query set, so
    // the engine must surface query 0 with every mined column NULL — an
    // aggregate over the empty cross join alone would drop the row
    val dir = java.nio.file.Files.createTempDirectory("graft_hn_one_").toString
    try {
      Seq((0L, Seq(1.0f, 2.0f), 3)).toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val rows = Similarity.hardNegatives(spark, dir).collect()
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getLong(0) === 0L && r.getInt(1) === 3)
      assert((2 to 6).forall(r.isNullAt), "all mined columns must be NULL")
    } finally graft.util.Scratch.deleteRecursively(
      java.nio.file.Paths.get(dir))
  }

  test("embedStats covers every label once") {
    val got = Similarity.embedStats(spark, sf)
      .as[(Int, Long, Double)].collect()
    assert(got.map(_._1).distinct.length === got.length)
    assert(got.map(_._2).sum === 500L)
    got.foreach { case (_, _, avgNorm) => assert(avgNorm > 0) }
  }

  test("hybridRRF fuses ranks by the RRF formula, at least one leg each") {
    val fused = graft.operators.IndexQueries
      .hybridRRF(spark, sf, Seq("scan", "join", "filter"), 0, 50, 10)
      .collect()
    assert(fused.length === 10)
    fused.foreach { r =>
      val rb = Option(r.get(r.fieldIndex("r_bm"))).map(_.asInstanceOf[Int])
      val rc = Option(r.get(r.fieldIndex("r_cos"))).map(_.asInstanceOf[Int])
      assert(rb.nonEmpty || rc.nonEmpty, "fused row from neither list")
      val want = BigDecimal(
        rb.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rc.map(x => 1.0 / (60 + x)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("rrf") === want)
    }
    val scores = fused.map(_.getAs[Double]("rrf")).toSeq
    assert(scores.sliding(2).forall(s => s.head >= s.last))
  }

  test("semDedup: survivors are pairwise-dissimilar within a cell; " +
       "every dropped vector has a lower-id dominator") {
    val tau = 0.3
    val all = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    val kept = Similarity.semDedup(spark, sf, tau)
      .as[(Long, Int)].collect()
    assert(kept.nonEmpty && kept.length < all.size,
      s"expected a non-degenerate split, kept ${kept.length} of ${all.size}")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0) -2.0
      else BigDecimal(dot / d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // survivors: no same-cell pair reaches tau (the dominance rule's
    // guaranteed post-condition)
    for {
      Seq((ia, ca), (ib, cb)) <- kept.sortBy(_._1).toSeq.combinations(2)
      if ca == cb
    } assert(cos(all(ia), all(ib)) < tau,
      s"surviving pair $ia/$ib in cell $ca is >= $tau similar")
    // dropped: a same-cell lower-id dominator implies in particular SOME
    // lower-id vector within tau — check that necessary condition (cell
    // assignment itself is the oracle-checked half)
    val keptIds = kept.map(_._1).toSet
    all.keys.filterNot(keptIds).foreach { dropped =>
      val hasDominator = all.keys.exists(o => o < dropped &&
        cos(all(o), all(dropped)) >= tau)
      assert(hasDominator, s"vector $dropped dropped without a dominator")
    }
  }
}
