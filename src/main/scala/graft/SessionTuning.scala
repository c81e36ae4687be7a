package graft
import org.apache.spark.sql.SparkSession

/** Shared shuffle/AQE tuning for every measured session (Bench, Verify,
  * BenchOne, JobProfile) — round-20 optimization, guide §2.
  *
  * Both values are SCALE-NEUTRAL (they only change behaviour where a
  * shuffle is small) and parameterised via env so a cluster deployment
  * can override without a rebuild:
  *
  *  - `spark.shuffle.sort.bypassMergeThreshold` = 2 (default 200):
  *    forces the sort-based shuffle writer always. The bypass writer
  *    opens one file PER REDUCER PER MAP TASK; at the bench's 32
  *    shuffle partitions that is O(32 x maps) file create/close per
  *    exchange, measured +230 ms per shuffle on this box (OverheadProbe:
  *    383 -> 154 ms for a 1-shuffle aggregate). At production partition
  *    counts (>200) the default already takes the sort path, so pinning
  *    it low only removes the small-shuffle artifact.
  *
  *  - `spark.sql.adaptive.coalescePartitions.minPartitionSize` = 64k
  *    (default 1m): AQE's coalesce floor. Sub-MB shuffles were coalesced
  *    to ONE partition, serializing compute-dense stages (the PPJoin
  *    array_intersect verify runs ~1000x work per shuffled byte):
  *    dedup_ngram_jaccard measured 1.7 -> 0.5 s once the verify stage
  *    kept ~cpus partitions. At scale every healthy partition is far
  *    above either floor, so the setting is inert there.
  */
object SessionTuning {
  def tuned(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.shuffle.sort.bypassMergeThreshold",
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_BYPASS", "2"))
    .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION", "64k"))
}
