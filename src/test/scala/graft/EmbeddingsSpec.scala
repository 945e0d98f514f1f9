package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Dedup, Embeddings}

/** Exact-integer centroid/outlier scoring and the group-overlap matrix. */
class EmbeddingsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("centroid sums are exact per-dimension integer sums") {
    val df = Seq(
      (1L, 0, Seq(0.5f, 0.0f)),
      (2L, 0, Seq(0.25f, 1.0f)),
      (3L, 1, Seq(-1.0f, -1.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Embeddings.labelCentroids(df, "label", "embedding")
      .orderBy("label")
      .select("label", "s_arr", "n")
      .as[(Int, Seq[Long], Long)].collect().toSeq
    assert(got == Seq(
      (0, Seq(750000L, 1000000L), 2L),
      (1, Seq(-1000000L, -1000000L), 1L)))
  }

  test("outlier score ranks the farthest vector first, exact ties to id") {
    // label 0: mean = (0, 0); ids 1/2 at distance 1, id 3 at distance 2
    val df = Seq(
      (1L, 0, Seq(1.0f, 0.0f)),
      (2L, 0, Seq(-1.0f, 0.0f)),
      (3L, 0, Seq(0.0f, 2.0f)),
      (4L, 0, Seq(0.0f, -2.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Embeddings.labelOutliers(df, "vec_id", "label", "embedding", k = 4)
      .orderBy("rank").select("vec_id", "rank").as[(Long, Int)].collect().toSeq
    // 3 and 4 tie at distance 2 (rank by id); 1 and 2 tie at distance 1
    assert(got == Seq((3L, 1), (4L, 2), (1L, 3), (2L, 4)))
  }

  test("outlier scores are invariant under repartitioning") {
    val df = (1 to 100).map(i =>
      (i.toLong, i % 3, Seq(i.toFloat / 100, (100 - i).toFloat / 100)))
      .toDF("vec_id", "label", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Embeddings.labelOutliers(d, "vec_id", "label", "embedding", k = 5)
        .orderBy("label", "rank")
        .select("label", "vec_id", "score").as[(Int, Long, Double)]
        .collect().toSeq
    assert(run(df.repartition(17)) == run(df.coalesce(1)))
  }

  test("group overlap computes pairwise shingle jaccard") {
    val df = Seq(
      (1L, "g1", "a b c d"),   // shingles: "a b c", "b c d"
      (2L, "g2", "a b c"),     // shingle:  "a b c"
      (3L, "g3", "x y z")      // disjoint
    ).toDF("id", "grp", "text")
    val got = Dedup.groupOverlap(df, "grp", "text")
      .select("grp_a", "grp_b", "n_common", "jaccard")
      .as[(String, String, Long, Double)].collect().toSeq
    // only (g1, g2) overlap: |∩| = 1, |∪| = 2
    assert(got == Seq(("g1", "g2", 1L, 0.5)))
  }
}
