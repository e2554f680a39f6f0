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

  test("all three dedup mechanisms agree on the exact pair set") {
    def ids(name: String) = graft.ops.TrainingOps.queries(name)(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ngram = ids("dedup_ngram")
    assert(ids("dedup_minhash") === ngram)
    assert(ids("dedup_simhash") === ngram)
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
