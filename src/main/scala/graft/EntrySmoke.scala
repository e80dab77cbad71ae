package graft
import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: `SparkEntry.entry` must return rows at sf0.001.
  * Prints the count; exits nonzero on an empty result so the check is
  * scriptable (`sbt 'runMain graft.EntrySmoke'`). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
