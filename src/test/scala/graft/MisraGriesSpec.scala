package graft

import graft.functions.MisraGriesAgg

/** Pins the Misra-Gries heavy-hitter aggregate behind `q_heavy_hitters`:
  * the mergeable-summary guarantee (no key with frequency above the
  * n/(capacity+1) bound is ever lost, any merge order), the O(capacity)
  * state bound, and the determinism of the FINAL exact-verified answer
  * under shuffled partitionings — the intermediate sketch may differ by
  * merge order, the published result must not.
  */
class MisraGriesSpec extends SparkSpec {

  /** The planted-skew key used by q_heavy_hitters, locally. */
  private def key(eventId: Long): String =
    if (eventId % 4 == 0) s"hot_${eventId % 3}"
    else if (eventId % 4 == 1) s"warm_${eventId % 40}"
    else s"cold_$eventId"

  private def eventKeys: Seq[String] =
    spark.read.parquet(sf("0.001") + "/events.parquet")
      .select("event_id").collect().map(r => key(r.getLong(0))).toSeq

  test("MG summary never loses a key above the n/(cap+1) bound, any merge tree") {
    val keys = eventKeys
    val n = keys.length.toLong
    val exact = keys.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val mustSurvive = exact.filter(_._2 > n / (MisraGriesAgg.Capacity + 1)).keySet
    assert(mustSurvive.nonEmpty) // the hot tier really is above the bound

    // two very different merge trees over the same stream
    val chunks = keys.grouped(97).map(_.foldLeft(MisraGriesAgg.zero)(MisraGriesAgg.reduce)).toSeq
    val leftFold = chunks.reduceLeft(MisraGriesAgg.merge)
    val pairwise = {
      var level = chunks
      while (level.size > 1)
        level = level.grouped(2).map(g =>
          if (g.size == 2) MisraGriesAgg.merge(g(0), g(1)) else g(0)).toSeq
      level.head
    }
    for (summary <- Seq(leftFold, pairwise)) {
      assert(summary.size <= MisraGriesAgg.Capacity)
      assert(mustSurvive.subsetOf(summary.keySet))
      // estimates never exceed truth and undercount within the bound
      summary.foreach { case (k, est) =>
        val truth = exact.getOrElse(k, 0L)
        assert(est <= truth)
        assert(truth - est <= n / (MisraGriesAgg.Capacity + 1))
      }
    }
  }

  test("q_heavy_hitters: exact answer, deterministic across partitionings") {
    val keys = eventKeys
    val n = keys.length.toLong
    val expected = keys.groupBy(identity)
      .map { case (k, xs) => k -> xs.length.toLong }
      .filter { case (_, c) => c * 16 > n }
    assert(expected.nonEmpty && expected.size < 16)

    val got = graft.ops.GenericQueries.queries("q_heavy_hitters")(spark, sf("0.001"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)

    // the typed sketch itself, under shuffled inputs: candidates must stay
    // a superset of the true heavy set and within the capacity bound
    import spark.implicits._
    for (parts <- Seq(1, 3, 7)) {
      val cand = spark.createDataset(keys).repartition(parts)
        .select(MisraGriesAgg.toColumn.name("m"))
        .collect().head
      assert(cand.size <= MisraGriesAgg.Capacity)
      assert(expected.keySet.subsetOf(cand.keySet))
    }
  }

  test("property: MG bound holds on arbitrary Zipf-ish streams and chunkings") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    // streams with a planted heavy head plus a random tail, random chunking
    val stream = for {
      n <- Gen.choose(200, 2000)
      headShare <- Gen.choose(2, 6) // head key gets ~n/headShare
      tailCard <- Gen.choose(10, 400)
      chunk <- Gen.choose(7, 97)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield {
      val rnd = new scala.util.Random(seed)
      val keys = Seq.tabulate(n) { i =>
        if (i % headShare == 0) "head" else s"t${rnd.nextInt(tailCard)}"
      }
      (rnd.shuffle(keys), chunk)
    }
    val prop = forAll(stream) { case (keys, chunk) =>
      val n = keys.length.toLong
      val exact = keys.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
      val summary = keys.grouped(chunk)
        .map(_.foldLeft(MisraGriesAgg.zero)(MisraGriesAgg.reduce))
        .reduce(MisraGriesAgg.merge)
      val bound = n / (MisraGriesAgg.Capacity + 1)
      summary.size <= MisraGriesAgg.Capacity &&
        exact.filter(_._2 > bound).keySet.subsetOf(summary.keySet) &&
        summary.forall { case (k, est) =>
          val truth = exact.getOrElse(k, 0L)
          est <= truth && truth - est <= bound
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
