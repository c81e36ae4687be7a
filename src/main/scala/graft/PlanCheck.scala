object PlanCheck { def main(a: Array[String]): Unit = {
  val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions",4)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled","false").getOrCreate()
  s.sparkContext.setLogLevel("ERROR")
  val df = graft.operators.Multimodal.cdcIncrementalStreamTwin(s, "/root/testdata/sf0.001")
  println(df.queryExecution.optimizedPlan.treeString.take(4000))
  s.stop()
} }
