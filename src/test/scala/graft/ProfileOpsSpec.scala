package graft

/** Pins the round-5 profiling/structuring additions (TF-IDF keywords,
  * fixed-width histogram, training-window chunking, int8 embedding
  * quantization, bucketed range join) against plain-Scala recomputations —
  * an oracle independent of both Spark's and DuckDB's engines, and the
  * place where each op's integer/IEEE determinism argument is exercised
  * directly (rational rank keys, floor-division bins, window enumeration,
  * quantization code math, interval containment).
  */
class ProfileOpsSpec extends SparkSpec {

  private def docsLocal: Seq[(Long, String)] =
    spark.read.parquet(sf("0.001") + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq

  private def toks(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  test("text_keywords: matches a plain-Scala tf/df recomputation") {
    val d = docsLocal
    val tf = d.flatMap { case (id, text) =>
      toks(text).filter(t => t.length >= 3 && t.forall(c => c >= 'a' && c <= 'z'))
        .groupBy(identity).map { case (t, xs) => (id, t, xs.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val local = tf.groupBy(_._1).flatMap { case (id, xs) =>
      xs.map { case (_, t, f) => (t, f, df(t)) }
        .sortBy { case (t, f, dfv) => (-(f.toDouble / dfv), t) }
        .take(5).zipWithIndex
        .map { case ((t, f, dfv), i) => (id, i + 1, t, f, dfv) }
    }.toSet
    val got = graft.ops.TrainingOps.queries("text_keywords")(spark, sf("0.001"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got.nonEmpty)
    assert(got === local)
  }

  test("q_histogram: matches a plain-Scala floor-division recomputation") {
    val prices = spark.read.parquet(sf("0.001") + "/orders.parquet")
      .select("o_totalprice").collect().map(_.getDouble(0)).toSeq
    val local = prices.groupBy(p => math.floor(p / 10000).toLong)
      .map { case (bin, xs) =>
        (bin, xs.length.toLong, xs.map(p => math.floor(p).toLong).sum)
      }.toSet
    val got = graft.ops.GenericQueries.queries("q_histogram")(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty)
    assert(got === local)
  }

  test("text_chunk: matches a plain-Scala window enumeration") {
    val local = docsLocal.flatMap { case (id, text) =>
      val t = toks(text)
      val n = t.length.toLong
      (0L until n by 48L).map { start =>
        val len = math.min(64L, n - start)
        (id, start / 48, start, len, t(start.toInt),
          t((start + len - 1).toInt))
      }
    }.toSet
    val got = graft.ops.TrainingOps.queries("text_chunk")(spark, sf("0.001"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSet
    assert(got.nonEmpty)
    assert(got === local)
  }

  test("embed_quantize: matches a plain-Scala int8 code recomputation") {
    val local = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val id = r.getLong(0)
        val v = r.getSeq[Float](1).map(_.toDouble)
        val scale = v.map(math.abs).max
        val q = v.map(x =>
          if (scale == 0d) 0L else math.floor(x / scale * 127).toLong)
        (id, scale, q.length.toLong, q.sum, q.min, q.max)
      }.toSet
    val got = graft.ops.TrainingOps.queries("embed_quantize")(spark, sf("0.001"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got.nonEmpty)
    assert(got === local)
    // codes stay in the int8 envelope by construction
    assert(got.forall { case (_, _, _, _, mn, mx) => mn >= -127 && mx <= 127 })
  }

  test("q_range_join: matches a plain-Scala containment count") {
    val ev = spark.read.parquet(sf("0.001") + "/events.parquet")
      .select("event_id", "ts").collect()
      .map { r =>
        val millis = r.get(1) match {
          case t: java.sql.Timestamp => t.getTime
          case t: java.time.LocalDateTime =>
            t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        }
        r.getLong(0) -> millis
      }.toSeq
    val local = ev.filter(_._1 % 397 == 0).map { case (id, start) =>
      val end = start + 3L * 3600 * 1000
      id -> ev.count { case (_, t) => t >= start && t < end }.toLong
    }.toMap
    val got = graft.ops.GenericQueries.queries("q_range_join")(spark, sf("0.001"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    assert(got === local)
    // every window contains at least its own trigger event
    assert(got.values.forall(_ >= 1L))
  }

  test("q_grouping_sets: matches a plain-Scala three-set recomputation " +
      "through ONE Expand pass (never three unioned scans)") {
    val o = spark.read.parquet(sf("0.001") + "/orders.parquet")
      .select("o_orderstatus", "o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2)).toLong)).toSeq
    def agg(key: ((String, String, Long)) => (String, String), lvl: Long) =
      o.groupBy(key).map { case ((s0, p0), xs) =>
        (lvl, s0, p0, xs.length.toLong, xs.map(_._3).sum)
      }
    val local =
      (agg(t => (t._1, t._2), 0L) ++ agg(t => (t._1, "(all)"), 1L) ++
        agg(t => ("(all)", t._2), 2L)).toSet
    val df = graft.ops.GenericQueries
      .queries("q_grouping_sets")(spark, sf("0.001"))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got.nonEmpty)
    assert(got === local)
    // one-pass plan: the three sets come from a single Expand over a
    // single scan (execute first — AQE prints un-fused before execution)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert(!plan.contains("Union"))
  }

  test("q_join_salted: equals the unsalted join and the salted exchange " +
      "is real (shuffle hash join on (key, salt), dim never broadcast)") {
    val cust = spark.read.parquet(sf("0.001") + "/customer.parquet")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val orders = spark.read.parquet(sf("0.001") + "/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1)).toLong)).toSeq
    val local = orders.flatMap { case (ck, fl) => cust.get(ck).map(_ -> fl) }
      .groupBy(_._1).map { case (nk, xs) =>
        (nk, xs.length.toLong, xs.map(_._2).sum)
      }.toSet
    val df = graft.ops.GenericQueries.queries("q_join_salted")(spark, sf("0.001"))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty)
    assert(got === local)
    // the key join must be the salted SHUFFLE join — a broadcast hash join
    // on the dim would bypass the exchange the operator exists to salt.
    // (The ×S salt-axis replication is a BroadcastNestedLoopJoin by
    // design: that broadcast is O(S) rows, not the dim.)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"))
    assert(!plan.contains("BroadcastHashJoin"))
  }

  test("q_zorder: matches a plain-Scala bit-interleave recomputation and " +
      "every 256x256 z-tile has tight envelopes in BOTH dims (the pruning " +
      "property)") {
    def spread(v0: Long): Long = {
      var v = v0
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      (v | (v << 1)) & 0x55555555L
    }
    val o = spark.read.parquet(sf("0.001") + "/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0) & 0xFFFFL,
        math.floor(r.getDouble(1) / 100).toLong & 0xFFFFL)).toSeq
    val local = o.map { case (x, y) =>
      ((spread(x) | (spread(y) << 1)) >> 16, x, y)
    }.groupBy(_._1).map { case (tile, xs) =>
      (tile, xs.length.toLong, xs.map(_._2).min, xs.map(_._2).max,
        xs.map(_._3).min, xs.map(_._3).max)
    }.toSet
    val got = graft.ops.GenericQueries.queries("q_zorder")(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got.nonEmpty)
    assert(got === local)
    // the point of the curve: EVERY tile bounds both dimensions at once —
    // a file written per tile is prunable by min/max on either column
    got.foreach { case (tile, _, mnx, mxx, mny, mxy) =>
      assert(mxx - mnx <= 255L, s"tile $tile x-span ${mxx - mnx}")
      assert(mxy - mny <= 255L, s"tile $tile y-span ${mxy - mny}")
    }
  }

  test("q_cdc_upsert: matches a plain-Scala MERGE recomputation") {
    val base = spark.read.parquet(sf("0.001") + "/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) * 100).toLong)).toSeq
    // latest-wins per key: U2 (v2) beats U1 (v1); D removes; I adds new keys
    val local = scala.collection.mutable.Map[Long, (String, Long)]()
    base.foreach { case (k, st, c) => local(k) = (st, c) }
    base.foreach { case (k, _, c) =>
      if (k % 10 == 5) local.remove(k)
      else if (k % 20 == 0) local(k) = ("U2", c)
      else if (k % 10 == 0) local(k) = ("U1", c)
      if (k % 10 == 3) local(k + 50000000L) = ("NEW", 0L)
    }
    val expected = local.map { case (k, (st, c)) => (k, st, c) }.toSet
    val got = graft.ops.GenericQueries.queries("q_cdc_upsert")(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
    // the branch census: every op class genuinely exercised
    assert(base.exists(_._1 % 10 == 5) && base.exists(_._1 % 20 == 0) &&
      base.exists(k => k._1 % 10 == 0 && k._1 % 20 != 0) &&
      base.exists(_._1 % 10 == 3))
  }

  test("q_scd2: interval chaining, tombstone closure, and open records") {
    val rows = graft.ops.GenericQueries.queries("q_scd2")(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5)))
    val byKey = rows.groupBy(_._1)
    assert(byKey.nonEmpty)
    byKey.foreach { case (k, rs) =>
      val sorted = rs.sortBy(_._4)
      // intervals chain: each valid_to equals the next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5.contains(b._4), s"gap at key $k")
        case _ =>
      }
      if (k % 10 == 5) { // tombstone closes the last record, none current
        assert(sorted.map(_._2).toSeq == Seq("U"))
        assert(sorted.last._5.contains(2L) && !sorted.exists(_._6))
      } else assert(sorted.last._5.isEmpty && sorted.last._6) // open current
      if (k % 20 == 0) // two-version keys carry the full history
        assert(sorted.map(r => (r._3, r._4, r._5)).toSeq ==
          Seq(("U1", 1L, Some(2L)), ("U2", 2L, None)))
      if (k >= 50000000L) assert(sorted.map(_._2).toSeq == Seq("I"))
    }
    // every branch class occurred
    assert(byKey.keys.exists(_ % 10 == 5) &&
      byKey.keys.exists(k => k % 20 == 0 && k < 50000000L) &&
      byKey.keys.exists(_ >= 50000000L))
  }

  test("q_retention / q_alerts: match plain-Scala recomputations") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = spark.read.parquet(sf("0.001") + "/events.parquet")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    // retention: stagger by (user_id % 8) weeks, cohort = min week
    def week(us: Long): Long = { // Monday-truncated epoch days
      val d = us / 86400000000L // epoch day (ts are all post-1970)
      d - ((d + 3) % 7) // 1970-01-01 was a Thursday
    }
    val staggered = ev.map { case (u, _, us) => (u, week(us) + (u % 8) * 7) }
    val cohort = staggered.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val expRet = staggered.distinct
      .map { case (u, wk) => (cohort(u), wk) }
      .groupBy(identity).map { case ((co, wk), xs) =>
        (co, wk, (wk - co) / 7, xs.size.toLong) }.toSet
    val gotRet = graft.ops.GenericQueries.queries("q_retention")(spark, sf("0.001"))
      .select(col("cohort").cast("timestamp"), col("wk").cast("timestamp"),
        col("week_no"), col("n_active"))
      .collect().map(r => (r.getTimestamp(0).getTime / 86400000L,
        r.getTimestamp(1).getTime / 86400000L, r.getLong(2), r.getLong(3))).toSet
    assert(gotRet === expRet)
    assert(gotRet.map(_._1).size == 8) // the stagger makes 8 real cohorts

    // alerts: trailing-3h integer threshold over the hourly error series
    val hourly = ev.filter(_._2 == "error").map(_._3 / 3600000000L)
      .groupBy(identity).map { case (h, xs) => h -> xs.size.toLong }
      .toSeq.sortBy(_._1)
    val expAlert = hourly.zipWithIndex.map { case ((h, n), i) =>
      val trail = hourly.slice(math.max(0, i - 3), i).map(_._2)
      (h, n, trail.sum, trail.size.toLong,
        trail.nonEmpty && n * trail.size > trail.sum * 2)
    }.toSet
    val gotAlert = graft.ops.GenericQueries.queries("q_alerts")(spark, sf("0.001"))
      .select(unix_micros(col("h").cast("timestamp")), col("n"),
        col("trail_sum"), col("trail_n"), col("alert"))
      .collect().map(r => (r.getLong(0) / 3600000000L, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getBoolean(4))).toSet
    assert(gotAlert === expAlert)
    assert(gotAlert.exists(_._5) && gotAlert.exists(!_._5)) // both branches real
  }

  test("text_lm_score: matches a plain-Scala bigram-familiarity recomputation") {
    val d = docsLocal
    val inst = d.flatMap { case (id, text) =>
      val t = toks(text)
      if (t.size < 2) Seq.empty
      else t.sliding(2).map(p => (id, p.mkString(" "))).toSeq
    }
    val corpus = inst.groupBy(_._2).map { case (bg, xs) => bg -> xs.length.toLong }
    val local = d.map { case (id, _) =>
      val mine = inst.filter(_._1 == id)
      val fam = mine.map(p => corpus(p._2)).sum
      val n = mine.length.toLong
      (id, n, fam, if (n > 0) fam / n else 0L)
    }.toSet
    val got = graft.ops.TrainingOps.queries("text_lm_score")(spark, sf("0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got.nonEmpty)
    assert(got === local)
  }
}
