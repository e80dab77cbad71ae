package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for named declared queries to
  * files — the plan evidence the optimization rounds commit under
  * `plans/rNN/`. Usage:
  *
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> q1 q2 ...
  *
  * Writes `<outDir>/<query>_<suffix>.txt`. Queries whose construction
  * eagerly runs jobs (localCheckpoint-based operators) execute those jobs;
  * the dumped plan is the final frame's physical plan either way. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump sfDir outDir suffix q...")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"dumped $name -> $outDir/${name}_$suffix.txt")
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
