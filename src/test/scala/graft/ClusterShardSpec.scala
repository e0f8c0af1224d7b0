package graft

import graft.ops.{ClusterShard, Dedup}

/** X83 — cluster-aware sharding: the no-cluster-spans-shards invariant,
  * label parity with X18, hash determinism, and balance sanity.
  */
class ClusterShardSpec extends SparkSpec {

  private lazy val rows = ClusterShard.clusterShards(spark, sfDir).collect()
    .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
      r.getAs[Boolean]("is_clustered"), r.getAs[Long]("shard")))

  test("X83: no near-dup cluster spans two shards") {
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      assert(members.map(_._4).distinct.size == 1,
        s"cluster $cluster spans shards ${members.map(_._4).distinct}")
    }
    // and clustered docs exist at all, or the invariant is vacuous
    assert(rows.exists(_._3), "expected at least one near-dup cluster")
  }

  test("X83: cluster labels equal the registered X18 labels") {
    val x18 = Dedup.dupClusters(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"))))
      .toMap
    rows.foreach { case (doc, cluster, clustered, _) =>
      assert(x18(doc)._1 == cluster)
      assert(clustered == (x18(doc)._2 > 1L),
        s"doc $doc: is_clustered=$clustered but cluster_size=${x18(doc)._2}")
    }
    assert(rows.length == x18.size)
  }

  test("X83: placement is the portable hash, stable across runs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val expected = rows.map { case (_, cluster, _, _) => cluster }.distinct
      .toSeq.toDF("cluster_id")
      .select($"cluster_id", (graft.functions.Hashing.md5Long40(
        concat($"cluster_id".cast("string"), lit(":cs")))
        % ClusterShard.NumShards).as("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (_, cluster, _, shard) =>
      assert(expected(cluster) == shard)
    }
    val again = ClusterShard.clusterShards(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard")))
    assert(again.toSeq == rows.map(r => (r._1, r._4)).toSeq)
  }

  test("X83: shards cover the range and stay hash-balanced") {
    val byShard = rows.groupBy(_._4).view.mapValues(_.length)
    byShard.keys.foreach(s =>
      assert(s >= 0 && s < ClusterShard.NumShards))
    // hash balance on hundreds of docs: every shard populated and the
    // max/min spread bounded (md5 on distinct ids, not adversarial)
    assert(byShard.size == ClusterShard.NumShards)
    val (mx, mn) = (byShard.values.max, byShard.values.min)
    assert(mx.toDouble / mn <= 4.0, s"shard skew $byShard")
  }
}
