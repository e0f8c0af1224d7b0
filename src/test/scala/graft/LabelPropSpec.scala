package graft

import graft.ops.{CorpusIndex, LabelProp}

/** X96 — label propagation: hand-traced diffusion on a path graph,
  * clamp and tie-break fixtures, a full driver-side synchronous replay
  * on the real graph, and the front-movement probe at the round margin.
  */
class LabelPropSpec extends SparkSpec {

  import spark.implicits._

  private def edges(es: (String, String)*) = es.toDF("u", "v")
  private def seeds(ss: (String, String)*) = ss.toDF("n", "label")

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("w") ->
      ((r.getAs[String]("label"), r.getAs[String]("origin")))).toMap

  test("X96: labels diffuse one hop per round along a path") {
    // a─b─c─d─e, seed a=en e=fr. Round 1: b=en d=fr (c unlabeled).
    // Round 2: c's labeled neighbors are b=en, d=fr — tie 1-1 → 'en'.
    // Rounds 3-4: b stays en (neighbors a=en c=en), d: neighbors c=en
    // e=fr — tie 1-1 → 'en'. Final: a,b,c,d=en (d flipped!), e=fr seed.
    val got = rowsOf(LabelProp.propagate(
      seeds("a" -> "en", "e" -> "fr"),
      edges("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e"), 4))
    assert(got == Map(
      "a" -> (("en", "seed")), "b" -> (("en", "prop")),
      "c" -> (("en", "prop")), "d" -> (("en", "prop")),
      "e" -> (("fr", "seed"))))
  }

  test("X96: a seed stays clamped against a unanimous neighborhood") {
    // star: s seeded 'zh', all three leaves seeded 'en' — s keeps zh
    val got = rowsOf(LabelProp.propagate(
      seeds("s" -> "zh", "l1" -> "en", "l2" -> "en", "l3" -> "en"),
      edges("s" -> "l1", "s" -> "l2", "s" -> "l3"), 4))
    assert(got("s") == (("zh", "seed")))
  }

  test("X96: majority beats the smaller label; ties break smallest") {
    // m's neighbors: two 'fr' seeds, one 'en' seed → majority fr.
    // t's neighbors: one 'fr', one 'en' → tie → 'en'.
    val got = rowsOf(LabelProp.propagate(
      seeds("f1" -> "fr", "f2" -> "fr", "e1" -> "en", "e2" -> "en"),
      edges("m" -> "f1", "m" -> "f2", "m" -> "e1",
        "t" -> "f1", "t" -> "e2"), 2))
    assert(got("m") == (("fr", "prop")))
    assert(got("t") == (("en", "prop")))
  }

  test("X96: real graph equals the driver-side synchronous replay") {
    val es = CorpusIndex.collocationEdges(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val full = LabelProp.labelProp(spark, sfDir)
    val seedMap = rowsOf(full).collect { case (n, (l, "seed")) => n -> l }
    // replay: synchronous majority vote with (max count, min label)
    // tie-break, seeds clamped, exactly Rounds rounds
    val nbrs = (es.map(e => e._1 -> e._2) ++ es.map(e => e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels: Map[String, String] = seedMap.toMap
    for (_ <- 1 to LabelProp.Rounds) {
      val prop = nbrs.flatMap { case (n, ms) =>
        val votes = ms.flatMap(labels.get)
          .groupBy(identity).view.mapValues(_.size).toSeq
        if (votes.isEmpty) None
        else Some(n -> votes.minBy { case (l, c) => (-c, l) }._1)
      }
      labels = prop ++ seedMap.toMap
    }
    val expected = labels.map { case (n, l) =>
      n -> ((l, if (seedMap.toMap.contains(n)) "seed" else "prop"))
    }
    assert(rowsOf(full) == expected)
  }

  test("X96: the labeled set is monotone across the round margin") {
    // L_r = seeds ∪ N(L_{r-1}) is monotone in r (labels may still FLIP
    // — synchronous LP can oscillate — but coverage never shrinks);
    // probe rounds vs rounds+1 and report the still-moving front
    val es = CorpusIndex.collocationEdges(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val atR = rowsOf(LabelProp.labelPropOf(docs, es))
    val seedFrame = LabelProp.labelPropOf(docs, es)
      .filter($"origin" === "seed").select($"w".as("n"), $"label")
    val atR1 = rowsOf(LabelProp.propagate(seedFrame, es, LabelProp.Rounds + 1))
    assert(atR.keySet.subsetOf(atR1.keySet))
    val flipped = atR.keySet.count(n => atR(n)._1 != atR1(n)._1)
    info(s"front still moving at round ${LabelProp.Rounds}+1: " +
      s"$flipped of ${atR.size} labels flip")
  }
}
