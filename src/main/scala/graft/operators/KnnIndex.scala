package graft.operators

import org.apache.spark.sql.SparkSession

/**
 * Staged approximate k-NN graph over the embeddings table — the
 * bootstrap artifact NN-descent / graph-ANN refinement iterates on
 * (reference: the same build-once-probe-many split db.rs's layered
 * store applies to blocks; Dong et al. WWW'11 for the algorithm).
 * Built at most once per corpus fingerprint ([[Staging]]: atomic
 * rename, staleness by source fingerprint), holding the
 * (src, rnk, dst, rcos) top-k edge list [[Similarity.knnGraph]]
 * computes.
 */
object KnnIndex {
  /** Ensure the staged graph exists for `dir`; returns the g/ path. */
  def ensure(s: SparkSession, dir: String): String = {
    val base = Staging.ensure("knng",
      Staging.fingerprint(dir, "embeddings.parquet")) { tmp =>
      Similarity.knnGraphBuild(s, dir).write.parquet(tmp.resolve("g").toString)
    }
    base.resolve("g").toString
  }

  /** Test hook: see [[Staging.clear]]. */
  def clear(): Unit = Staging.clear()
}
