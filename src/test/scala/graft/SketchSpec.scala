package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Fingerprint64, GraftFunctions, SimHash64}

/** Pins the sketch kernels (fingerprint, minhash, simhash, rp-sign) and the
  * approximate operators built on them (ann_lsh recall vs brute force).
  */
class SketchSpec extends SparkSpec {

  test("fingerprint64 is stable and order-sensitive") {
    def fp(s: String) = Fingerprint64.hash64(UTF8String.fromString(s))
    assert(fp("abc") === fp("abc"))
    assert(fp("abc") !== fp("acb"))
    assert(fp("") === 1125899906842597L)
  }

  test("simhash: identical token sets get identical hashes; disjoint differ") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(ts: String*) = new GenericArrayData(
      ts.map(t => UTF8String.fromString(t)).toArray[Any])
    val a = SimHash64.simhash(arr("x", "y", "z"), 0L)
    val b = SimHash64.simhash(arr("x", "y", "z"), 0L)
    val c = SimHash64.simhash(arr("q", "r", "s", "t", "u", "v"), 0L)
    assert(a === b)
    assert(a !== c)
  }

  test("minhash signature positions estimate jaccard") {
    GraftFunctions.ensureRegistered(spark)
    import graft.functions.GraftFunctions.minhash_sig
    // two sets with J = 50/150 ~ 0.333
    val df = spark.range(1).select(
      minhash_sig(transform(sequence(lit(1), lit(100)),
        i => concat(lit("s"), i)), 128).as("sa"),
      minhash_sig(transform(sequence(lit(51), lit(150)),
        i => concat(lit("s"), i)), 128).as("sb"))
    val row = df.select(
      size(filter(zip_with(col("sa"), col("sb"), (a, b) => a === b),
        x => x)).as("m")).head()
    val est = row.getInt(0) / 128.0
    assert(math.abs(est - 1.0 / 3.0) < 0.12, s"estimate $est too far from 1/3")
  }

  test("ann_rp_rerank achieves high recall@5 vs ann_brute") {
    val brute = graft.ops.TrainingOps.queries("ann_brute")(spark, sf("0.01"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = graft.ops.TrainingOps.queries("ann_rp_rerank")(spark, sf("0.01"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall@5 $recall below 0.8 (|brute|=${brute.size})")
  }

  test("ann_ivf recall@5 >= 0.9 vs ann_brute at sf0.1, deterministic") {
    val brute = graft.ops.TrainingOps.queries("ann_brute")(spark, sf("0.1"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def run() = graft.ops.TrainingOps.queries("ann_ivf")(spark, sf("0.1"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = run()
    val recall = (brute intersect ivf).size.toDouble / brute.size
    val scan = graft.ops.TrainingOps.IvfProbes.toDouble / graft.ops.TrainingOps.IvfCells
    info(s"ann_ivf recall@5=$recall at scan fraction $scan")
    assert(recall >= 0.9, s"recall@5 $recall below 0.9")
    assert(scan < 0.7, s"probed fraction $scan not sub-linear")
    assert(run() === ivf, "ann_ivf not deterministic across runs")
  }

  test("ann_ivf_serve from the persisted index returns exactly ann_ivf's rows") {
    def rows(name: String) = graft.ops.TrainingOps.queries(name)(spark, sf("0.01"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // build explicitly (idempotent atomic swap), then serve reads the
    // artifact; build's query shape is scalar (cell, pos, val)
    def buildTriples() = graft.ops.TrainingOps.queries("ann_ivf_build")(spark, sf("0.01"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getFloat(2))).toSeq
    val cents = buildTriples()
    assert(cents.map(_._1).distinct.length === graft.ops.TrainingOps.IvfCells)
    assert(rows("ann_ivf_serve") === rows("ann_ivf"))
    // rebuild is deterministic: same centroid bytes
    assert(buildTriples() === cents)
  }

  test("ivf index dir is keyed by a corpus fingerprint, not just the path") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(sf("0.001"), "embeddings.parquet")
    val tmpRoot = Files.createTempDirectory("ivf_fp_test")
    val dataDir = tmpRoot.resolve("corpus")
    Files.createDirectories(dataDir)
    val dst = dataDir.resolve("embeddings.parquet")
    // testdata tables are single parquet files
    Files.copy(src, dst, StandardCopyOption.COPY_ATTRIBUTES,
      StandardCopyOption.REPLACE_EXISTING)
    val idx1 = graft.ops.TrainingOps.ivfIndexDir(spark, dataDir.toString)
    // regenerate the corpus at the SAME path with a different mtime: the
    // index home must move so a pre-existing index is never served stale
    Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(123456789000L))
    val idx2 = graft.ops.TrainingOps.ivfIndexDir(spark, dataDir.toString)
    assert(idx1 !== idx2)
    org.apache.commons.io.FileUtils.deleteQuietly(tmpRoot.toFile)
  }

  test("text_fingerprint golden values are stable across runs") {
    val a = graft.ops.TrainingOps.queries("text_fingerprint")(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = graft.ops.TrainingOps.queries("text_fingerprint")(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sameElements(b))
  }
}
