package graft.tools

import graft.Tables
import graft.index.{IvfIndex, KMeans}
import graft.operators.{Knn, Metric, Recall, TopK}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Seeding-quality diagnostic (r9 verdict item 10): lowest-id vs
  * deterministic k-means++ seeding, graded on the metric the bench
  * actually prices — routing-limited recall per scanned mass fraction —
  * plus inertia. Not part of the driver contract; run manually:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf10t sbt 'runMain graft.tools.SeedDiag'
  */
object SeedDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10t")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.operators.TopK.ensureHashAggKeyRoom(spark)

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val nq = math.min(200L, n / 2).toInt
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      .cache()
    base.count()
    // queries from the MIDDLE of the id range: lowest-id seeding literally
    // contains the lowest-id queries as seeds (C = 1,789 ⊇ qid < 200), so
    // a low-id query window grades lowid with its own queries leaked into
    // the init — the first 2-way run of this diag read lowid 0.03 recall
    // "ahead" at every point purely from that leak
    val qLo = n / 2
    val queries = emb.where(col("vec_id") >= qLo && col("vec_id") < qLo + nq)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec")).cache()
    val truth = Knn.knnJoin(queries, base, 10, Metric.L2).cache()
    truth.count()
    val c = IvfIndex.autoC(n)
    println(s"n=$n C=$c nq=$nq sf=$sfDir")

    for (mode <- Seq("lowid", "hash", "kmeans++")) {
      val t0 = System.nanoTime()
      val sample = KMeans.trainSample(base, c, n)
      val cents0 = mode match {
        case "lowid" => KMeans.fit(sample, c, iters = 0, seedLowId = true)
        case "hash" => KMeans.seedHashUniform(
          sample.select(col("id"), col("vec")), c)
        case _ => KMeans.seedPlusPlus(sample.select(col("id"), col("vec")), c)
      }
      val cents = locally {
        // 3 Lloyd iterations from the chosen seeds (fit's loop, inlined so
        // every mode shares it exactly)
        var cur = cents0.cache(); cur.count()
        for (_ <- 0 until 3) {
          val next = KMeans.assignCarry(sample, cur)
            .groupBy("cid")
            .agg(graft.functions.VectorAggs.vecMean(col("vec")).as("cvec"))
            .cache()
          next.count(); cur.unpersist(); cur = next
        }
        cur
      }
      val assigned = KMeans.assignCarry(base, cents).cache()
      assigned.count()
      val buildSec = (System.nanoTime() - t0) / 1e9
      // inertia + balance
      val centsB = cents.select(col("cid"), col("cvec"))
      val dist2 = assigned.join(broadcast(centsB), "cid")
        .select(graft.operators.Metric
          .distColumn(Metric.L2, col("vec"), col("cvec")).as("d"))
        .agg(sum(col("d"))).head().getDouble(0)
      val sizes = assigned.groupBy("cid").count()
        .select(col("count")).as[Long].collect()
      val idx = IvfIndex(cents, assigned.select("id", "cid"))
      // routing-limited recall vs scanned mass at an nprobe grid
      val total = sizes.sum.toDouble
      val report = Seq(1, 2, 4, 8, 16, 32, 64).filter(_ <= c).map { np =>
        val r = Recall.mean(idx.probe(queries, base, 10, nprobe = np), truth, 10)
        // mean scanned mass for this nprobe: sum of routed cluster sizes
        val routes = TopK.aggTopK(
          queries.crossJoin(broadcast(cents))
            .withColumn("dist",
              Metric.distColumn(Metric.L2, col("qvec"), col("cvec"))),
          "qid", "cid", "dist", np).select("qid", "cid")
        val szDf = assigned.groupBy("cid").count()
        val mass = routes.join(szDf, "cid").groupBy("qid")
          .agg(sum("count").as("m")).agg(avg("m")).head().getDouble(0) / total
        f"np=$np%4d recall=$r%.4f mass=${100 * mass}%.2f%%"
      }
      println(f"seed=$mode inertia=$dist2%.1f " +
        f"buildSec=$buildSec%.1f sizes[min/med/max]=${sizes.min}/" +
        f"${sizes.sorted.apply(sizes.length / 2)}/${sizes.max} empty=${c - sizes.length}")
      report.foreach(r => println(s"  $r"))
      assigned.unpersist()
    }
    spark.stop()
  }
}
