package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.functions.GraftFunctions.{cosine_sim, fingerprint64, minhash_sig, rp_project, rp_sign, simhash64}

/** Training-data pipeline operators over `documents` / `embeddings`:
  * deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine), similarity search (brute-force + multi-table LSH),
  * and text analysis (language-ID heuristic, quality scoring, token
  * counting, fingerprinting).
  *
  * Scale shape (the point at 10^9+ docs):
  *   - candidate generation is always an equi-join on a bucket key
  *     (band hash / signature), never an O(n^2) cross product;
  *   - a shingle frequency cap drops degenerate stop-shingles so the
  *     inverted-index join cannot quadratically explode on a hot key
  *     (same role as skew salting);
  *   - verification (exact Jaccard / cosine) runs only on candidates.
  *
  * Thresholds use integer math (10*common >= 9*union  <=>  J >= 0.9) so
  * oracle comparison never touches float summation order.
  */
object TrainingOps {

  /** Max docs a shingle may appear in before it is discarded as a
    * stop-shingle (no-op at test scale, load-bearing at 10^9 docs).
    */
  val ShingleFreqCap = 1000

  val MinHashK = 64
  val MinHashBands = 16 // 16 bands x 4 rows

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  // ---- shared text derivations (mirrored in oracle SQL) ----

  private def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Distinct word 3-gram shingles ('' for docs under 3 tokens). */
  private def shingles(text: Column): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) >= 3,
        transform(sequence(lit(0), size(t) - 3),
          i => concat_ws(" ", get(t, i), get(t, i + 1), get(t, i + 2))))
        .otherwise(array().cast("array<string>")))
  }

  private val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is")

  private def stopHits(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(Stopwords)))

  /** doc_id-keyed distinct-shingle frame + per-doc shingle counts. The
    * shingle frame is persisted: every dedup query references it 3-4 times
    * (both join sides + counts) and recomputing tokenize+shingle per
    * reference dominated the query (28s -> ~13s at sf0.1).
    */
  private def shingleIndex(d: DataFrame): (DataFrame, DataFrame) = {
    val sh = d.select(col("doc_id"), explode(shingles(col("text"))).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    (sh, counts)
  }

  /** Exact-Jaccard verification of candidate (ia, ib) pairs at threshold
    * num/den via the inverted shingle index (no array materialization on
    * the pair — counts only).
    */
  private def verifiedPairs(sh: DataFrame, counts: DataFrame,
      candidates: DataFrame, num: Int, den: Int): DataFrame = {
    val a = sh.select(col("doc_id").as("ia"), col("s"))
    val b = sh.select(col("doc_id").as("ib"), col("s"))
    val common = candidates
      .join(a, "ia").join(b, Seq("ib", "s"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("common"))
    common
      .join(counts.select(col("doc_id").as("ia"), col("c").as("ca")), "ia")
      .join(counts.select(col("doc_id").as("ib"), col("c").as("cb")), "ib")
      .withColumn("n_union", col("ca") + col("cb") - col("common"))
      .filter(col("common") * den >= col("n_union") * num)
      .select(col("ia"), col("ib"), col("common"), col("n_union"))
      .orderBy("ia", "ib")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- text analysis ----
    "text_tokens" -> { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_len")
      ).orderBy("doc_id")
    },
    "text_quality" -> { (s, dir) =>
      val nTok = size(tokens(col("text"))).cast("long")
      val nPunct = (length(col("text")) -
        length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("long")
      val nDigit = (length(col("text")) -
        length(regexp_replace(col("text"), "[0-9]", ""))).cast("long")
      val hits = stopHits(col("text")).cast("long")
      docs(s, dir).select(
        col("doc_id"), nTok.as("n_tokens"), nPunct.as("n_punct"),
        nDigit.as("n_digit"), hits.as("stop_hits"),
        when(nTok.between(20, 200) && hits >= 1, "good")
          .when(nTok >= 5, "fair").otherwise("junk").as("quality")
      ).orderBy("doc_id")
    },
    "text_langid" -> { (s, dir) =>
      val nTok = size(tokens(col("text"))).cast("long")
      val hits = stopHits(col("text")).cast("long")
      docs(s, dir).select(
        col("doc_id"),
        when(nTok === 0, "unk")
          .when(hits * 20 >= nTok, "en")
          .otherwise("other").as("lang_guess")
      ).orderBy("doc_id")
    },
    "text_fingerprint" -> { (s, dir) =>
      GraftFunctions.ensureRegistered(s)
      docs(s, dir).select(
        col("doc_id"),
        fingerprint64(col("text")).as("fp"),
        fingerprint64(concat_ws(" ", tokens(col("text")))).as("fp_norm")
      ).orderBy("doc_id")
    },
    // ---- deduplication ----
    "dedup_exact" -> { (s, dir) =>
      val d = docs(s, dir)
      // shifted copy plants exact duplicates deterministically
      val in = d.unionAll(d.withColumn("doc_id", col("doc_id") + 100000))
      in.groupBy(md5(col("text").cast("binary")).as("text_md5"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id")
    },
    "dedup_ngram" -> { (s, dir) =>
      val (sh0, counts) = shingleIndex(docs(s, dir))
      // stop-shingle cap: keeps the inverted-index join linear-ish at scale
      val hot = sh0.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") > ShingleFreqCap).select("s")
      val sh = sh0.join(hot, Seq("s"), "left_anti")
      val a = sh.select(col("doc_id").as("ia"), col("s"))
      val b = sh.select(col("doc_id").as("ib"), col("s"))
      // ONE pass: the inverted-index self-join directly yields per-pair
      // intersection counts (no candidate materialization + re-join)
      val common = a.join(b, Seq("s")).filter(col("ia") < col("ib"))
        .groupBy("ia", "ib").agg(count(lit(1)).as("common"))
      common
        .join(counts.select(col("doc_id").as("ia"), col("c").as("ca")), "ia")
        .join(counts.select(col("doc_id").as("ib"), col("c").as("cb")), "ib")
        .withColumn("n_union", col("ca") + col("cb") - col("common"))
        .filter(col("common") * 10 >= col("n_union") * 9)
        .select(col("ia"), col("ib"), col("common"), col("n_union"))
        .orderBy("ia", "ib")
    },
    "dedup_minhash" -> { (s, dir) =>
      GraftFunctions.ensureRegistered(s)
      val d = docs(s, dir).select(col("doc_id"), shingles(col("text")).as("sh"))
      val sig = d.select(col("doc_id"), minhash_sig(col("sh"), MinHashK).as("sig"))
      val rows = MinHashK / MinHashBands
      val banded = sig.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(MinHashBands - 1)),
          b => struct(b.as("band"),
            slice(col("sig"), b * rows + 1, lit(rows)).as("key")))).as("bk"))
        .select(col("doc_id"), col("bk.band"), col("bk.key"))
      val candidates = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib")).distinct()
      // cheap signature prefilter before the exact-Jaccard join: estimated
      // J = matching positions / k must clear 0.75 (4 sigma below the 0.9
      // verify bar at k=64) — slashes the verify join's input
      val prefiltered = candidates
        .join(sig.select(col("doc_id").as("ia"), col("sig").as("sa")), "ia")
        .join(sig.select(col("doc_id").as("ib"), col("sig").as("sb")), "ib")
        .filter(size(filter(zip_with(col("sa"), col("sb"), (a, b) => a === b),
          m => m)) * 100 >= MinHashK * 75)
        .select("ia", "ib")
      val (sh, counts) = shingleIndex(docs(s, dir))
      verifiedPairs(sh, counts, prefiltered, 9, 10)
    },
    "dedup_simhash" -> { (s, dir) =>
      GraftFunctions.ensureRegistered(s)
      val d = docs(s, dir).select(col("doc_id"), shingles(col("text")).as("sh"))
      // two independent simhashes (different token-hash seeds), 8 bands of
      // 8 bits each = 16 band keys: a miss requires ALL 16 bands to differ
      val sig = d.select(col("doc_id"),
        simhash64(col("sh"), 0L).as("sig0"), simhash64(col("sh"), 1L).as("sig1"))
      val banded = sig.select(col("doc_id"),
        explode(flatten(array(Seq(("sig0", 0), ("sig1", 8)).map { case (c, off) =>
          transform(sequence(lit(0), lit(7)),
            b => struct((b + off).as("band"),
              call_function("shiftright", col(c), b * 8)
                .bitwiseAND(lit(255L)).as("key")))
        }: _*))).as("bk"))
        .select(col("doc_id"), col("bk.band"), col("bk.key"))
      val candidates = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib")).distinct()
      // hamming prefilter (bit_count of XOR over both sigs <= 24) before
      // the exact-Jaccard join: 8-bit bands collide often on unrelated
      // docs, and without this the verify join dominates the query
      val prefiltered = candidates
        .join(sig.select(col("doc_id").as("ia"),
          col("sig0").as("xa0"), col("sig1").as("xa1")), "ia")
        .join(sig.select(col("doc_id").as("ib"),
          col("sig0").as("xb0"), col("sig1").as("xb1")), "ib")
        .filter(bit_count(col("xa0").bitwiseXOR(col("xb0"))) +
          bit_count(col("xa1").bitwiseXOR(col("xb1"))) <= 24)
        .select("ia", "ib")
      val (sh, counts) = shingleIndex(docs(s, dir))
      verifiedPairs(sh, counts, prefiltered, 9, 10)
    },
    "dedup_embed" -> { (s, dir) =>
      GraftFunctions.ensureRegistered(s)
      val e = embs(s, dir)
      val in = e.unionAll(e.withColumn("vec_id", col("vec_id") + 100000))
        .select(col("vec_id"), col("embedding"))
      // LSH bucket join (16-bit signature), then exact cosine verify:
      // identical vectors always share the bucket -> recall 1.0 for dups
      val sig = in.withColumn("b", rp_sign(col("embedding"), 16, 42L))
      val pairs = sig.as("x").join(sig.as("y"),
          col("x.b") === col("y.b") && col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("ia"), col("y.vec_id").as("ib"),
          cosine_sim(col("x.embedding"), col("y.embedding")).as("cos"))
      pairs.filter(col("cos") >= 0.99)
        .select("ia", "ib").orderBy("ia", "ib")
    },
    // ---- similarity search ----
    "ann_brute" -> { (s, dir) =>
      GraftFunctions.ensureRegistered(s)
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val cand = e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val scored = q.crossJoin(cand)
        .select(col("qid"), col("nid"), cosine_sim(col("qv"), col("nv")).as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("nid"))
        .orderBy("qid", "rank")
    },
    "ann_rp_rerank" -> { (s, dir) =>
      GraftFunctions.ensureRegistered(s)
      val e = embs(s, dir)
      // Approximate top-k for isotropic embeddings (no cluster structure,
      // so bucket-LSH has no recall — measured on this corpus): coarse
      // score every candidate in a 32-dim Rademacher projection (2x fewer
      // flops + 2x less data if the projection is materialized), keep the
      // top-150 per query, exact-rerank only those. Candidate depth is the
      // recall knob. Bucket-LSH remains the near-dup path (dedup_embed).
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          rp_project(col("embedding"), 32, 7L).as("qp"))
      val cand = e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"),
          rp_project(col("embedding"), 32, 7L).as("np"))
      val coarse = q.crossJoin(cand)
        .select(col("qid"), col("qv"), col("nid"), col("nv"),
          cosine_sim(col("qp"), col("np")).as("ccos"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("ccos").desc, col("nid"))
      val shortlist = coarse.withColumn("crank", row_number().over(wc))
        .filter(col("crank") <= 150)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
      shortlist
        .select(col("qid"), col("nid"), cosine_sim(col("qv"), col("nv")).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("nid"))
        .orderBy("qid", "rank")
    }
  )

  // ---- oracles ----

  private val tokSql = "string_split_regex(lower(trim(text)), '\\s+')"
  private val stopSql =
    s"len(list_filter($tokSql, x -> x IN ('the','a','of','to','and','in','is')))"

  /** Shared exact n-gram Jaccard pair SQL at J >= 0.9 (integer math). */
  private val jaccardPairsSql: String =
    s"""WITH tok AS (SELECT doc_id, $tokSql AS t FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
               FROM tok),
        cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
        pair AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS common
                 FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
        SELECT ia, ib, common, ca.c + cb.c - common AS n_union
        FROM pair JOIN cnt ca ON ia = ca.doc_id JOIN cnt cb ON ib = cb.doc_id
        WHERE common * 10 >= (ca.c + cb.c - common) * 9
        ORDER BY ia, ib"""

  def oracleSql: Map[String, String] = Map(
    "text_tokens" ->
      s"""SELECT doc_id, len($tokSql) AS n_tokens,
          CAST(length(text) AS BIGINT) AS n_chars_len
          FROM documents ORDER BY doc_id""",
    "text_quality" ->
      s"""SELECT doc_id, len($tokSql) AS n_tokens,
          length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
          $stopSql AS stop_hits,
          CASE WHEN len($tokSql) BETWEEN 20 AND 200 AND $stopSql >= 1 THEN 'good'
               WHEN len($tokSql) >= 5 THEN 'fair' ELSE 'junk' END AS quality
          FROM documents ORDER BY doc_id""",
    "text_langid" ->
      s"""SELECT doc_id,
          CASE WHEN len($tokSql) = 0 THEN 'unk'
               WHEN $stopSql * 20 >= len($tokSql) THEN 'en'
               ELSE 'other' END AS lang_guess
          FROM documents ORDER BY doc_id""",
    "dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
         FROM (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id + 100000, text FROM documents)
         GROUP BY text_md5 ORDER BY keep_id""",
    "dedup_ngram" -> jaccardPairsSql,
    // MinHash/SimHash candidates + exact-Jaccard verification converge to
    // the exact pair set at J>=0.9 (banding miss probability < 1e-7 at
    // this signature size); the oracle is therefore the exact pair SQL.
    "dedup_minhash" -> jaccardPairsSql,
    "dedup_simhash" -> jaccardPairsSql,
    "dedup_embed" ->
      """SELECT vec_id AS ia, vec_id + 100000 AS ib FROM embeddings
         ORDER BY ia, ib""",
    "ann_brute" ->
      """WITH scored AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[])) AS cos
           FROM embeddings q, embeddings c
           WHERE q.vec_id < 10 AND c.vec_id >= 10)
         SELECT qid, rank, nid FROM (
           SELECT qid, nid, CAST(row_number() OVER
             (PARTITION BY qid ORDER BY cos DESC, nid) AS INT) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY qid, rank"""
    // ann_rp_rerank, text_fingerprint: not SQL-expressible in DuckDB (custom
    // hash kernels) -> rows-only driver check; pinned by ScalaTest instead.
  )
}
