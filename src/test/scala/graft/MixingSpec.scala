package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Mixing

/** X28/X29 — data-mixture samplers: hash-sampling determinism and
  * monotonicity, and the salted two-phase quota's equality with the
  * naive single-window form it replaces.
  */
class MixingSpec extends SparkSpec {

  test("X28: the stratified sample is deterministic and rate-shaped") {
    val a = Mixing.stratifiedSample(spark, sfDir).collect()
    val b = Mixing.stratifiedSample(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "two runs differ")
    assert(a.nonEmpty)
    // every kept row's bucket is consistent with its stratum's rate
    a.foreach { r =>
      val num = r.getAs[String]("lang") match {
        case "en" => 4; case "zh" => 1; case _ => 2
      }
      val bucket = r.getAs[Long]("bucket")
      assert(bucket >= 0 && bucket < num,
        s"doc ${r.getAs[Long]("doc_id")} kept with bucket $bucket >= rate $num")
    }
    // rates are per-stratum fractions of the full table (loose bounds:
    // a 40-bit hash split over tiny strata still concentrates around the
    // target; just exclude degenerate keep-all / keep-none behavior)
    val total = Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    kept.foreach { case (lang, k) =>
      assert(k > 0 && k < total(lang),
        s"$lang kept $k of ${total(lang)} — not a proper subsample")
    }
  }

  test("X28: raising a stratum's rate only adds documents (monotone)") {
    import spark.implicits._
    // bucket < num is monotone in num by construction; pin it end-to-end
    // by comparing the shipped sample against the all-buckets universe
    val universe = Tables.documents(spark, sfDir)
      .withColumn("bucket",
        graft.functions.Hashing.md5Long40(
          concat($"doc_id".cast("string"), lit(":mix"))) % Mixing.SampleDenom)
      .select($"doc_id", $"bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sampled = Mixing.stratifiedSample(spark, sfDir).collect()
    sampled.foreach { r =>
      assert(universe(r.getAs[Long]("doc_id")) == r.getAs[Long]("bucket"))
    }
  }

  test("X29: the shipped window gets the map-side WindowGroupLimit pushdown") {
    // the property that makes the single per-stratum window scale: a
    // Partial WindowGroupLimit BELOW the exchange (each map partition
    // pre-caps its top N per stratum) and a Final above it. If Catalyst
    // ever stops inferring it here, the shuffle reverts to carrying
    // whole strata — fail loudly.
    val df = Mixing.qualityQuota(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"expected a partial (map-side) WindowGroupLimit in:\n$plan")
  }

  test("X29: the shipped quota equals the two-phase reference form") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val scored = graft.ops.Text.qualityOf(docs)
      .select($"doc_id", $"lang", $"quality_score")
    val shipped = Mixing.quotaOfScored(scored, Mixing.QuotaN)
      .collect().map(_.toString).toSeq
    // the salted two-phase decomposition must select the identical set
    // with identical ranks, at any salt fan-out
    Seq(1, 8, 16).foreach { salts =>
      val tp = Mixing.quotaTwoPhaseScored(scored, Mixing.QuotaN, salts)
        .collect().map(_.toString).toSeq
      assert(tp == shipped, s"two-phase (salts=$salts) diverges")
    }
    assert(shipped.nonEmpty)
  }

  test("X29: quota is exact per stratum with gap-free ranks") {
    val docs = Tables.documents(spark, sfDir)
    val n = 7
    val r1 = Mixing.qualityQuotaOf(docs, n).collect()
    val strata = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perLang = r1.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    strata.foreach { case (lang, size) =>
      assert(perLang.getOrElse(lang, 0) == math.min(n.toLong, size).toInt,
        s"$lang quota wrong: got ${perLang.getOrElse(lang, 0)}")
    }
    // ranks are 1..quota with no gaps, per stratum
    r1.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rows.length).toSeq)
    }
  }

  test("X46: temperature weights flatten the mixture toward the tail") {
    val rows = Mixing.mixtureWeights(spark, sfDir).collect()
    assert(rows.length >= 2)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getAs[Double]("alpha_weight")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val (share, w) = (r.getAs[Double]("share"), r.getAs[Double]("alpha_weight"))
      val mean = 1.0 / rows.length
      // α<1 pulls every stratum toward the uniform mixture
      if (share > mean) assert(w < share, s"${r.getAs[String]("lang")}: head must shrink")
      if (share < mean) assert(w > share, s"${r.getAs[String]("lang")}: tail must grow")
      assert(r.getAs[Long]("expected_draws") ==
        math.floor(w * Mixing.DrawBudget).toLong)
    }
    // one corpus scan: the materialized |strata|-row aggregate
    // (localCheckpoint since round 16 — an RDD scan, not a cache)
    // feeds both the totals and the final ratios
    val df = Mixing.mixtureWeights(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"),
      s"the per-stratum aggregate must be shared, not recomputed:\n$plan")
  }

  test("X73: apportionment conserves the budget exactly") {
    val rows = Mixing.tokenApportion(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("alloc")).sum == Mixing.DrawBudget,
      "Hamilton apportionment must hit the global budget exactly")
    rows.foreach { r =>
      val bonus = r.getAs[Long]("alloc") - r.getAs[Long]("alloc_floor")
      assert(bonus == 0L || bonus == 1L,
        s"${r.getAs[String]("lang")}: bonus must be 0 or 1")
    }
  }

  test("X73: equals a driver-side largest-remainder replay") {
    val rows = Mixing.tokenApportion(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("alloc_floor"), r.getAs[Long]("frac_rank"),
        r.getAs[Long]("alloc")))
    val p6 = rows.map { case (l, n, _, _, _) =>
      l -> BigDecimal(math.pow(n.toDouble, Mixing.TempAlpha))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val pTotal = p6.map(_._2).sum
    val raw = p6.map { case (l, p) =>
      l -> (p.toDouble / pTotal.toDouble * Mixing.DrawBudget)
    }.toMap
    val floors = raw.view.mapValues(r => math.floor(r).toLong).toMap
    val residual = Mixing.DrawBudget - floors.values.sum
    val ranked = raw.toSeq
      .map { case (l, r) => (l, r - floors(l).toDouble) }
      .sortBy { case (l, f) => (-f, l) }.map(_._1).zipWithIndex.toMap
    rows.foreach { case (l, _, fl, rk, alloc) =>
      assert(fl == floors(l), s"$l floor")
      assert(rk == ranked(l).toLong + 1, s"$l rank")
      val wantBonus = if (ranked(l) < residual) 1L else 0L
      assert(alloc == fl + wantBonus, s"$l alloc")
    }
  }

  test("X73: ledger rank is a broadcast beat-count, never a global window") {
    val plan = Mixing.tokenApportion(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"the remainder rank must not plan a window:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the beat-count must be a broadcast nested-loop over the ledger:\n$plan")
  }

  test("X74: exactly min(k, |stratum|) docs per language, hash-ranked") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val rows = Mixing.exactKSample(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("rk"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("h")))
    val sizes = Tables.documents(spark, sfDir)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val byLang = rows.toSeq.groupBy(_._1)
    assert(byLang.keySet == sizes.keySet)
    byLang.foreach { case (l, rs) =>
      assert(rs.length.toLong == math.min(Mixing.EvalK.toLong, sizes(l)),
        s"lang $l sample size")
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length).toSeq,
        s"lang $l gap-free ranks")
    }
    // the selection is the k SMALLEST (h, doc_id) of the stratum —
    // recompute hashes independently with the builtin reference form
    val allH = Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"),
        graft.functions.Hashing.md5Long40Builtin(
          concat(col("doc_id").cast("string"), lit(":evalk"))).as("h"))
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("h")))
    allH.toSeq.groupBy(_._1).foreach { case (l, ds) =>
      val want = ds.map(d => (d._3, d._2))
        .sorted.take(Mixing.EvalK).map(_._2).toSet
      val got = byLang(l).map(_._3).toSet
      assert(got == want, s"lang $l selected set")
    }
  }

  test("X74: the stratum never shuffles whole — WindowGroupLimit pushdown") {
    val plan = Mixing.exactKSample(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit must push a partial group limit below the exchange:\n$plan")
  }
}
