package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph utilities for dedup pipelines.
  *
  * Near-duplicate detection yields *pairs*; an actual 100 TB cleanup needs
  * *clusters* — pick one canonical document per connected component of the
  * dup-pair graph and drop the rest. The reference engine has no graph step
  * (its dedup surface stops at per-row operators), so this is one of the
  * beyond-the-reference training-pipeline operators.
  */
object Graph {

  /** Connected components by iterative min-label propagation (the
    * "hash-to-min" MapReduce scheme): every vertex starts labeled with its
    * own id; each round, each vertex takes the min of its own label and its
    * neighbors' labels; fixpoint = components labeled by their min vertex id.
    *
    * Scale shape per round: one shuffle join (edges × labels on src) + one
    * groupBy(id).min — both partial-aggregated map-side. `localCheckpoint`
    * truncates lineage so the plan does not double per round, and the
    * convergence probe is a single scalar aggregate (labels only ever
    * decrease, so an unchanged decimal sum ⇔ fixpoint — no extra join).
    * The probe rides the checkpoint's own materialization job as an
    * [[org.apache.spark.sql.Observation]] metric — ONE action per round,
    * not a checkpoint job plus a separate probe scan over the labels.
    * Rounds needed = graph diameter; dup clusters are near-cliques, so
    * 2-3 rounds in practice. The driver loop is control flow only — no row
    * data ever reaches the driver.
    *
    * @param vertices one column `id` (bigint)
    * @param edges    columns `src`, `dst` (undirected; either orientation)
    * @return (id, cluster_id) — cluster_id = min vertex id of the component
    */
  def connectedComponents(
      vertices: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    // decimal(38,0) keeps the probe exact far past a BIGINT overflow
    // (1e12 vertices × 1e12 max label would wrap a 64-bit sum)
    val probe = sum(col("cluster_id").cast("decimal(38,0)")).as("ls")
    def checkpointWithSum(df: DataFrame, round: Int)
        : (DataFrame, java.math.BigDecimal) = {
      val obs = org.apache.spark.sql.Observation(s"cc_probe_$round")
      val out = df.observe(obs, probe).localCheckpoint()
      (out, obs.get("ls").asInstanceOf[java.math.BigDecimal])
    }
    var (labels, prevSum) = checkpointWithSum(
      vertices.select(col("id"), col("id").as("cluster_id")), 0)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("cluster_id"))
      val (next, nextSum) = checkpointWithSum(
        labels.unionByName(msgs)
          .groupBy("id").agg(min("cluster_id").as("cluster_id")), i + 1)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      i += 1
    }
    // silent truncation would hand downstream dedup MULTIPLE "canonical"
    // ids inside one component — fail loudly instead (rounds needed equal
    // the component diameter; a hit here means the graph is a long chain,
    // not a dup near-clique, and the caller should raise maxIter)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "component diameter exceeds maxIter; raise it")
    labels
  }
}
