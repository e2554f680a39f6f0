package graft

/** Pins the dedup paths the driver's data never exercises.
  *
  * The binding-cap test: at sf0.001 the shingle document-frequency
  * histogram reaches df=9, so cap=5 actually drops shingles from candidate
  * generation — the hot-intersection correction join must restore EXACT
  * Jaccard counts, making the capped result identical to the effectively
  * uncapped one (every sf0.001 true pair also shares df<=5 shingles, so
  * the documented all-hot recall exception does not trigger here).
  */
class DedupSpec extends SparkSpec {

  private def pairs(cap: Int) =
    graft.ops.TrainingOps.dedupNgram(spark, sf("0.001"), cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("ngram cap correction: binding cap returns exact uncapped Jaccard") {
    val uncapped = pairs(1000000)
    assert(uncapped.nonEmpty, "fixture should contain near-dup pairs")
    assert(pairs(5) === uncapped)
  }

  private def incPairs(cap: Int) =
    graft.ops.TrainingOps.dedupIncremental(spark, sf("0.001"), cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("incremental dedup: equals the full pair set restricted to cross-class") {
    val inc = incPairs(1000000)
    assert(inc.nonEmpty, "fixture should contain batch-vs-corpus near-dups")
    // the asymmetric join must find exactly the full-corpus pairs with one
    // endpoint in the batch class, reoriented to (corpus, batch)
    val want = pairs(1000000)
      .filter(p => (p._1 % 10 == 7) != (p._2 % 10 == 7))
      .map(p => if (p._2 % 10 == 7) p else (p._2, p._1, p._3, p._4))
      .sortBy(p => (p._1, p._2))
    assert(inc === want)
    inc.foreach { case (ia, ib, _, _) =>
      assert(ia % 10 != 7 && ib % 10 == 7, s"orientation of ($ia,$ib)")
    }
  }

  test("incremental dedup cap correction: binding cap stays exact") {
    assert(incPairs(5) === incPairs(1000000))
  }

  test("connected components: chains, stars, cycles, singleton pairs") {
    import spark.implicits._
    // chain 1-2-3-4, star 20<-(21,22,23), cycle 30-31-32-30, lone pair
    // 40-41: the driver data's components are near-cliques, so the
    // multi-hop transitive cases are pinned here instead
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (20L, 21L), (20L, 22L), (20L, 23L),
      (30L, 31L), (31L, 32L), (30L, 32L),
      (40L, 41L)).toDF("ia", "ib")
    val got = graft.ops.TrainingOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L,
      40L -> 40L, 41L -> 40L)
    assert(got === want)
  }

  test("connected components: random graphs agree with a plain-Scala union-find") {
    import spark.implicits._
    // property pin for the r6 label-sum convergence detector: on seeded
    // random graphs (long chains, merged blobs, isolated pairs all arise)
    // the distributed fixpoint must match an independent union-find
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val n = 60
      val es = (1 to 80).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .distinct
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
      val want = verts.map(v => v -> find(v)).toMap
      val got = graft.ops.TrainingOps
        .connectedComponents(es.toDF("ia", "ib"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("dedup_clusters: repeated invocations stay correct past the live-frame bound") {
    // each invocation recomputes the fixpoint and registers its persisted
    // labels frame; beyond the bookkeeping bound the oldest frames are
    // evicted eagerly — results must be identical throughout (an evicted
    // frame's consumers recompute through the cached pair frame)
    def run() = graft.ops.TrainingOps.queries("dedup_clusters")(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val first = run()
    (1 to 4).foreach(_ =>
      graft.ops.TrainingOps.queries("dedup_clusters")(spark, sf("0.001")).count())
    assert(run() === first)
  }

  test("dedup_clusters covers exactly the paired docs, one keeper per cluster") {
    val pairRows = pairs(1000000)
    val docs = pairRows.flatMap(p => Seq(p._1, p._2)).toSet
    val rows = graft.ops.TrainingOps.queries("dedup_clusters")(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.map(_._1).toSet === docs)
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      assert(members.count(_._3) === 1, s"cluster $cluster keepers")
      assert(members.map(_._1).min === cluster, s"cluster $cluster canonical id")
    }
  }

  test("all three dedup mechanisms agree on the exact pair set") {
    def ids(name: String) = graft.ops.TrainingOps.queries(name)(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ngram = ids("dedup_ngram")
    assert(ids("dedup_minhash") === ngram)
    assert(ids("dedup_simhash") === ngram)
  }

  test("dedup_substring: exact 8-token window boundary semantics") {
    import spark.implicits._
    // hand-built corpus pinning every boundary the oracle also encodes:
    // an exactly-8-token shared run matches, a 7-token run does not,
    // <8-token docs vanish, per-doc windows are DISTINCT, and the %9
    // footer plant gives exactly the 3 all-footer windows as dups.
    val dir = java.nio.file.Files.createTempDirectory("graft_substr").toString
    Seq(
      1L -> "a b c d e f g h",
      2L -> "z a b c d e f g h y",
      3L -> "p q r s t u v", // 7 tokens: no windows at all
      4L -> "a b c d e f g x q r s t", // shares only a 7-run with 1/2
      5L -> "m m m m m m m m m m", // one DISTINCT window, no partner
      9L -> "unique nine words here one", // footer-planted (9 % 9 == 0)
      18L -> "different other words" // footer-planted (18 % 9 == 0)
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = graft.ops.TrainingOps.queries("dedup_substring")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(got === Seq(
      (1L, 1L, 1L, true), // its lone window recurs inside doc 2
      (2L, 3L, 1L, true),
      (4L, 5L, 0L, false), // 7-token overlap is below the window width
      (5L, 1L, 0L, false), // intra-doc repetition collapses to one window
      (9L, 8L, 3L, true), // 5 own tokens + 10 footer = 15 -> 8 windows
      (18L, 6L, 3L, true) // 3 own tokens + 10 footer = 13 -> 6 windows
    ))
  }

  test("mechanisms still agree at sf0.1 (CLAUDE.md banding invariant)") {
    // the invariant: re-check recall at the larger sf whenever
    // signatures/banding/thresholds change — candidate generation bugs
    // that sf0.001 can't expose (bucket collisions, probe coverage) show
    // up here as missing pairs vs the exact inverted-index mechanism
    def ids(name: String) = graft.ops.TrainingOps.queries(name)(spark, sf("0.1"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ngram = ids("dedup_ngram")
    assert(ngram.nonEmpty)
    assert(ids("dedup_minhash") === ngram)
    assert(ids("dedup_simhash") === ngram)
  }
}
