package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, as a 100 TB design requires:
  *  - brute-force cosine top-k: broadcast the (small) query set, stream the
  *    corpus — exact, O(|corpus|·|queries|) map-side work, one
  *    TakeOrdered-per-query via window rank;
  *  - LSH (random hyperplane) bucketed top-k: corpus hashed once to sign
  *    buckets (map-side), queries probe only their bucket — approximate,
  *    prunes the candidate set by ~2^planes.
  */
object Similarity {

  /** Dot product via zip_with + aggregate (codegen'd, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  /** Zero-norm vectors yield null (try_divide), not a query-killing
    * DIVIDE_BY_ZERO under ANSI mode — one corrupt embedding must not fail a
    * 100 TB job; null scores sort last and drop out of top-k/thresholds.
    */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), norm(a) * norm(b))

  /** Exact brute-force cosine top-k.
    *
    * @param queries small DataFrame (broadcast) with (qidCol, vecCol)
    * @param corpus  large DataFrame with (idCol, vecCol)
    * @return (query_id, rank, neighbor_id, score), rank 1..k per query
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      qidCol: String, idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(
      col(qidCol).as("query_id"), col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Deterministic pseudo-random hyperplane component for plane p, dim j:
    * uniform in [-0.5, 0.5) derived from xxhash64 — no stored model, any
    * executor recomputes it identically (no broadcast needed).
    */
  private def planeComponent(p: Column, j: Column): Column =
    (pmod(xxhash64(p, j), lit(100000L)).cast("double") / lit(100000.0d)) - lit(0.5d)

  /** Sign-bucket key over `nPlanes` random hyperplanes (bit p = sign of
    * dot(vec, plane_p)). Map-side only.
    */
  def lshBucket(vec: Column, nPlanes: Int): Column = {
    val bits = transform(sequence(lit(0), lit(nPlanes - 1)), p => {
      val d = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, j) => v * planeComponent(p, j)),
        lit(0.0d), (acc, v) => acc + v)
      when(d >= 0, 1L).otherwise(0L)
    })
    aggregate(bits, lit(0L), (acc, b) => acc * 2L + b)
  }

  /** Approximate top-k with multi-probe: each query searches its own sign
    * bucket plus every Hamming-1 neighbor bucket (flip one hyperplane bit) —
    * the standard recall boost for sign-LSH: a near neighbor that fell just
    * across one hyperplane is still found. Candidate volume ≈
    * (nPlanes+1)/2^nPlanes of the corpus per query; the corpus is still
    * hashed exactly once, map-side.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      qidCol: String, idCol: String, vecCol: String,
      k: Int, nPlanes: Int = 4, multiProbe: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qBucket = lshBucket(col(vecCol), nPlanes)
    val probes =
      if (multiProbe)
        // exact bucket + one-bit flips: bucket ^ (1 << p) for each plane
        concat(array(qBucket), transform(sequence(lit(0), lit(nPlanes - 1)),
          p => qBucket.bitwiseXOR(
            call_function("shiftleft", lit(1L), p.cast("int")))))
      else array(qBucket)
    val q = broadcast(queries.select(
      col(qidCol).as("query_id"), col(vecCol).as("__qv"),
      probes.as("__probes")))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      lshBucket(col(vecCol), nPlanes).as("__bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    c.join(q, array_contains(col("__probes"), col("__bucket")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** IVF (inverted-file) ANN: k-means-style coarse quantization with
    * deterministically seeded centroids (one refinement sweep), corpus
    * assigned to its nearest centroid, queries probing the `nProbe` nearest
    * cells. The centroid table is tiny (k × dim) and broadcast — the
    * classic billion-vector layout: one narrow assignment pass over the
    * corpus, candidate search touching ~nProbe/k of it.
    *
    * @return same shape as [[bruteForceTopK]]
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      qidCol: String, idCol: String, vecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    // seed centroids: deterministic sample (hash-ordered first nCells), then
    // one Lloyd refinement sweep — enough to spread the cells
    val seeds = c.orderBy(xxhash64(col("neighbor_id"))).limit(nCells)
      .select(col("__cv")).collect().map(_.getSeq[Float](0).toArray)
    def centroidArray(cents: Array[Array[Float]]) =
      array(cents.map(ct => array(ct.map(v => lit(v.toDouble)): _*)): _*)
    def nearestCell(vec: Column, cents: Array[Array[Float]]): Column =
      array_max(
        zip_with(centroidArray(cents),
          sequence(lit(0), lit(cents.length - 1)),
          (ct, i) => struct(cosine(vec.cast("array<double>"), ct).as("s"), i.as("i"))))
        .getField("i")
    // one Lloyd refinement sweep: per-cell mean via (cell, dim) partial sums
    // — k × dim tiny rows collected, corpus scanned once
    val assigned0 = c.withColumn("__cell", nearestCell(col("__cv"), seeds))
    val refined: Array[Array[Float]] = {
      val dim = seeds.head.length
      val sums = assigned0
        .select(col("__cell"), posexplode(col("__cv")).as(Seq("__d", "__v")))
        .groupBy("__cell", "__d")
        .agg(sum(col("__v")).as("s"), count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0))
      seeds.indices.map { cell =>
        sums.get(cell).map { rows =>
          val vec = new Array[Float](dim)
          rows.foreach(r => vec(r.getInt(1)) = (r.getDouble(2) / r.getLong(3)).toFloat)
          vec
        }.getOrElse(seeds(cell))
      }.toArray
    }
    val corpusCells = c
      .withColumn("__cell", nearestCell(col("__cv"), refined))
    val q = broadcast(queries
      .select(col(qidCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__cells", probeCells(col("__qv"), refined, nProbe)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    corpusCells
      .join(q, array_contains(col("__cells"), col("__cell")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Indices of the `nProbe` nearest centroids for a query vector. */
  private def probeCells(vec: Column, cents: Array[Array[Float]], nProbe: Int): Column = {
    val centArr = array(cents.map(ct => array(ct.map(v => lit(v.toDouble)): _*)): _*)
    val scored = zip_with(centArr, sequence(lit(0), lit(cents.length - 1)),
      (ct, i) => struct(cosine(vec.cast("array<double>"), ct).as("s"), i.as("i")))
    transform(
      slice(reverse(array_sort(scored)), 1, nProbe),
      x => x.getField("i"))
  }

  /** Embedding near-duplicate pairs: cosine above threshold, via LSH
    * buckets (exact within bucket). Returns (id_a, id_b, score), id_a<id_b.
    */
  def cosineDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int = 4): DataFrame = {
    val withB = df.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), nPlanes).as("__bucket"))
    val a = withB.select(col("__bucket"), col("id").as("id_a"), col("v").as("va"))
    val b = withB.select(col("__bucket"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", cosine(col("va"), col("vb")))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
  }
}
