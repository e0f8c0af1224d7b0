package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, Manifest, Packing}

/** X91 — the composed training-data build manifest. Engine parity with
  * the independent recomputation is the oracle's job; this suite pins
  * the composition laws the oracle cannot express as invariants:
  * stage-consistency with the component queries (x22 verdicts, x2
  * leak evidence, x26 layout) and the pipeline's postconditions (no
  * residual train→eval leak, dense pack layout).
  */
class ManifestSpec extends SparkSpec {

  private lazy val manifest =
    Manifest.pipelineManifest(spark, sfDir).collect()

  test("X91: one manifest row per document; closed verdict/action domains") {
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(manifest.length == nDocs)
    assert(manifest.map(_.getAs[Long]("doc_id")).distinct.length == manifest.length)
    val verdicts = manifest.map(_.getAs[String]("verdict")).toSet
    assert(verdicts.subsetOf(Set("kept", "low_quality", "exact_dup", "near_dup")))
    val actions = manifest.map(_.getAs[String]("action")).toSet
    assert(actions.subsetOf(Set("dropped", "eval", "leak_drop", "train")))
    assert(actions.contains("train") && actions.contains("dropped"))
  }

  test("X91: verdict column is exactly x22's verdict per document") {
    val x22 = Curation.curationPipeline(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    manifest.foreach { r =>
      assert(r.getAs[String]("verdict") == x22(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}: manifest verdict diverges from x22")
    }
  }

  test("X91: action law — train iff kept, train split, zero leak links") {
    manifest.foreach { r =>
      val (v, s, n, a) = (r.getAs[String]("verdict"), r.getAs[String]("split"),
        r.getAs[Long]("n_leak_links"), r.getAs[String]("action"))
      val expected =
        if (v != "kept") "dropped"
        else if (s != "train") "eval"
        else if (n > 0) "leak_drop"
        else "train"
      assert(a == expected, s"doc ${r.getAs[Long]("doc_id")}: $v/$s/$n → $a")
    }
  }

  test("X91: leak links match a brute-force recount over the X2 pair set") {
    val kept = manifest.filter(_.getAs[String]("verdict") == "kept")
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val pairs = Dedup.minhashLsh(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    pairs.foreach { case (a, b) =>
      (kept.get(a), kept.get(b)) match {
        case (Some(sa), Some(sb)) =>
          if (sa == "train" && sb != "train") counts(a) += 1
          if (sb == "train" && sa != "train") counts(b) += 1
        case _ => ()
      }
    }
    manifest.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val want = if (kept.contains(id)) counts(id) else 0L
      assert(r.getAs[Long]("n_leak_links") == want,
        s"doc $id: n_leak_links ${r.getAs[Long]("n_leak_links")} != $want")
    }
    // postcondition: after the repair, no surviving train doc pairs with
    // a kept eval doc — the eval set is clean by construction
    val finalTrain = manifest.filter(_.getAs[String]("action") == "train")
      .map(_.getAs[Long]("doc_id")).toSet
    pairs.foreach { case (a, b) =>
      val cross =
        (finalTrain(a) && kept.get(b).exists(_ != "train")) ||
          (finalTrain(b) && kept.get(a).exists(_ != "train"))
      assert(!cross, s"residual leak pair ($a,$b) survived the repair")
    }
  }

  test("X91: pack layout is the doc_id-ordered prefix sum over final train docs") {
    val train = manifest.filter(_.getAs[String]("action") == "train")
      .sortBy(_.getAs[Long]("doc_id"))
    assert(train.nonEmpty)
    var offset = 0L
    train.foreach { r =>
      assert(r.getAs[Long]("pack_id") == offset / Packing.PackCapacity)
      assert(r.getAs[Long]("offset_in_pack") == offset % Packing.PackCapacity)
      offset += r.getAs[Long]("n_tokens")
    }
    // non-train rows carry no pack layout
    manifest.filter(_.getAs[String]("action") != "train").foreach { r =>
      assert(r.isNullAt(r.fieldIndex("pack_id")) &&
        r.isNullAt(r.fieldIndex("n_tokens")),
        s"doc ${r.getAs[Long]("doc_id")}: non-train row has pack columns")
    }
  }

  test("X91: packing core returns an empty typed frame on empty input") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Packing.packingCoreOf(empty, Packing.PackCapacity)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_tokens", "start_offset", "pack_id", "offset_in_pack"))
  }
}
