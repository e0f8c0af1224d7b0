package graft

import graft.ops.{RepeatSuppress, Tokenizer}

/** X59 tokenizer apply + B44 repeat suppression: driver-side equality,
  * OOV accounting identities, debounce rule, and scale-shaped plans.
  */
class TokenizerRepeatSpec extends SparkSpec {

  test("X59: OOV accounting matches a driver-side vocabulary build") {
    val words = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.trim.split("\\s+").toSeq
        .map(w => (r.getString(0), w)))
    val freq = words.groupBy(_._2).map { case (w, xs) => w -> xs.length }
    val vocab = freq.toSeq.sortBy { case (w, f) => (-f, w) }
      .take(Tokenizer.VocabSize).map(_._1).toSet
    assert(freq.size > Tokenizer.VocabSize,
      "corpus vocabulary must exceed V so the OOV path runs")

    val rows = Tokenizer.tokenizerApply(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bySource = words.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ws = bySource(src).map(_._2)
      val inv = ws.count(vocab)
      val oov = ws.filterNot(vocab)
      assert(r.getAs[Long]("n_words") == ws.length.toLong, s"$src n_words")
      assert(r.getAs[Long]("n_invocab") == inv.toLong, s"$src invocab")
      assert(r.getAs[Long]("n_oov") == oov.length.toLong, s"$src oov")
      assert(r.getAs[Long]("ids_used") ==
        ws.filter(vocab).distinct.length.toLong, s"$src ids")
      assert(r.getAs[Long]("expanded_units") ==
        inv.toLong + oov.map(_.length.toLong).sum, s"$src units")
      assert(r.getAs[Long]("n_oov") > 0,
        s"$src: fixture must exercise the OOV fallback")
    }
  }

  test("X59: apply join broadcasts the vocabulary") {
    val df = Tokenizer.tokenizerApply(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("BroadcastHashJoin"), s"vocab must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }

  test("B44: debounce decisions match a driver-side scan") {
    val evs = Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "event_type", "value",
        "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    val expected = evs.groupBy(e => (e._2, e._3)).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._5, e._1))
      sorted.zipWithIndex.map { case (e, i) =>
        val repeat = i > 0 && e._5 - sorted(i - 1)._5 <= RepeatSuppress.WindowUs
        (e._3, repeat)
      }
    }
    val expByType = expected.groupBy(_._1).map { case (t, xs) =>
      t -> ((xs.length.toLong, xs.count(_._2).toLong))
    }
    val rows = RepeatSuppress.repeatSuppress(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (n, sup) = expByType(t)
      assert(r.getAs[Long]("n_events") == n, s"$t count")
      assert(r.getAs[Long]("n_suppressed") == sup, s"$t suppressed")
    }
    assert(expByType.values.map(_._2).sum > 0,
      "fixture must contain sub-hour repeats")
  }

  test("B44: single keyed exchange — no single-partition funnel") {
    val df = RepeatSuppress.repeatSuppress(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("Exchange SinglePartition"),
      s"lag window must stay (user,type)-partitioned:\n$plan")
  }
}
