package graft

/** Pins the round-5 text-curation additions (PII redaction, repetition
  * filter, domain mixing) against plain-Scala recomputations — an oracle
  * independent of both Spark's and DuckDB's regex/list engines.
  */
class TextOpsSpec extends SparkSpec {

  private def docsLocal: Map[Long, String] =
    spark.read.parquet(sf("0.001") + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("text_pii_redact: planted counts exact, redaction leaves no digits") {
    val rows = graft.ops.TrainingOps.queries("text_pii_redact")(spark, sf("0.001"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nEmail, nIp, nPhone, redacted) =>
      assert(nEmail === (if (id % 5 == 0) 1L else 0L), s"doc $id email")
      assert(nIp === (if (id % 7 == 0) 1L else 0L), s"doc $id ip")
      assert(nPhone === (if (id % 11 == 0) 1L else 0L), s"doc $id phone")
      // base corpus is digit- and @-free, so a fully redacted doc is too
      assert(!redacted.exists(_.isDigit), s"doc $id leaked a digit")
      assert(!redacted.contains("@"), s"doc $id leaked an email")
      if (id % 5 == 0) assert(redacted.contains("<EMAIL>"))
      if (id % 7 == 0) assert(redacted.contains("<IP>"))
      if (id % 11 == 0) assert(redacted.contains("<PHONE>"))
    }
  }

  test("text_repetition: matches a plain-Scala trigram recomputation") {
    val local = docsLocal.map { case (id, text) =>
      val planted = if (id % 13 == 0) text + " " + text else text
      val toks = planted.trim.toLowerCase.split("\\s+").toSeq
      val grams = if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
        else Seq.empty
      val nGrams = grams.length.toLong
      val nDistinct = grams.distinct.length.toLong
      id -> ((nGrams, nDistinct, nGrams - nDistinct,
        nGrams > 0 && (nGrams - nDistinct) * 10 >= nGrams * 3))
    }
    val got = graft.ops.TrainingOps.queries("text_repetition")(spark, sf("0.001"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(got === local)
    // the planted doubling must actually trip the flag somewhere
    assert(got.exists { case (id, (_, _, _, rep)) => rep && id % 13 == 0 })
  }

  test("text_domain_mix: matches a plain-Scala recomputation; min source keeps all") {
    val bySource = spark.read.parquet(sf("0.001") + "/documents.parquet")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).trim.toLowerCase
        .split("\\s+").length.toLong)
      .groupBy(_._1)
    val tokens = bySource.map { case (src, xs) => src -> xs.map(_._2).sum }
    val minTok = tokens.values.min
    val got = graft.ops.TrainingOps.queries("text_domain_mix")(spark, sf("0.001"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === tokens.keySet)
    got.foreach { case (src, (nDocs, nTok, ppm)) =>
      assert(nDocs === bySource(src).length.toLong, s"$src docs")
      assert(nTok === tokens(src), s"$src tokens")
      assert(ppm === minTok * 1000000L / tokens(src), s"$src ppm")
      assert(ppm <= 1000000L)
    }
    assert(got.values.exists(_._3 == 1000000L), "smallest source keeps 100%")
  }

  test("pii/repetition projections stay in whole-stage codegen") {
    // the regex and WordShingles trees must not drag the linear curation
    // passes out of WSCG (the CodegenFallback hazard class). Execute
    // first: under AQE the pre-execution plan prints un-fused
    // (isFinalPlan=false), so only the final plan evidences codegen.
    Seq("text_pii_redact", "text_repetition").foreach { name =>
      val df = graft.ops.TrainingOps.queries(name)(spark, sf("0.001"))
      df.collect()
      // the AQE toString appends the (always un-starred) Initial Plan —
      // judge only the Final Plan section
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the PROJECT itself must be starred — a bare "+- Project [" would
      // mean the curation projection fell out of codegen even though
      // other spans (ColumnarToRow, Sort) still print "*("
      assert("""\*\(\d+\) Project""".r.findFirstIn(plan).nonEmpty,
        s"$name: projection not in a WholeStageCodegen span:\n$plan")
      assert(!plan.contains("+- Project ["),
        s"$name: an un-fused Project survives in:\n$plan")
    }
  }
}
