package graft.index

import graft.operators.TagFilter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X8 per-tag subindexes (the reference's hot-tag strategy,
  * /root/reference/filter/faiss/faiss.py:268-337): for every tag whose
  * document frequency is at or above `minFreqBp` basis points, build a
  * dedicated partition-local HNSW over ONLY the matching rows, persisted
  * under `path/tag=<t>`. A query on a hot tag then probes a dense purpose-
  * built graph (no filtering needed inside — membership is the index) while
  * rare tags stay on the posting-intersection path; this is exactly the
  * two-regime split the reference's selectivity router makes.
  *
  * Shared payload: the reference shares one level-0 vector arena across its
  * subindexes (hnswalg.h:34-65); here the shared store is the columnar
  * parquet the graphs reference by id — subindex rows carry vectors for
  * probe locality, and the authoritative copy stays deduplicated in the
  * base table.
  */
object TagSubindexes {

  /** Build + persist one graph per hot tag; returns the hot tag ids.
    * `base` = (id, vec, tags). Per-tag builds are independent Spark jobs,
    * so they submit CONCURRENTLY (the scheduler interleaves them across
    * executor slots — at the reference's ~300 hot tags a sequential loop
    * would serialize 300 small jobs behind each other). `buildParallelism`
    * bounds the in-flight jobs so driver memory stays flat. */
  def build(base: DataFrame, path: String, minFreqBp: Long, m: Int = 16,
            efConstruction: Int = 100, numPartitions: Int = 2,
            buildParallelism: Int = 8): Seq[Int] = {
    val hot = TagFilter.tagStats(base)
      .where(col("freq_bp") >= minFreqBp)
      .select("tag").collect().map(_.getInt(0)).sorted.toSeq
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(buildParallelism, hot.size.max(1))))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val builds = hot.map { t =>
        scala.concurrent.Future {
          HnswKnn.buildAndSave(
            base.where(array_contains(col("tags"), t)).select("id", "vec"),
            s"$path/tag=$t", m, efConstruction, numPartitions)
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(builds),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    hot
  }

  /** Hot tag-PAIR subindexes — the second half of the reference's strategy
    * (faiss.py:268-337 builds indexes for frequent tag pairs as well): for
    * every unordered pair co-occurring in ≥ `minPairCount` docs, persist a
    * graph over the docs containing BOTH tags under `path/pair=<a>_<b>`
    * (a < b). A 2-tag query on a built pair probes a purpose-built graph
    * with NO filtering at all — pair membership is the index. Pair
    * discovery is one self-join of the postings on doc id (t1 < t2 halves
    * it); builds submit concurrently like [[build]]. */
  def buildPairs(base: DataFrame, path: String, minPairCount: Long,
                 m: Int = 16, efConstruction: Int = 100,
                 numPartitions: Int = 2,
                 buildParallelism: Int = 8): Seq[(Int, Int)] = {
    val post = TagFilter.postings(base)
    val hot = post.as("a")
      .join(post.as("b"),
        col("a.id") === col("b.id") && col("a.tag") < col("b.tag"))
      .groupBy(col("a.tag").as("t1"), col("b.tag").as("t2"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minPairCount)
      .select("t1", "t2").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sortBy(identity).toSeq
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(buildParallelism, hot.size.max(1))))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val builds = hot.map { case (t1, t2) =>
        scala.concurrent.Future {
          HnswKnn.buildAndSave(
            base.where(array_contains(col("tags"), t1) &&
              array_contains(col("tags"), t2)).select("id", "vec"),
            s"$path/pair=${t1}_$t2", m, efConstruction, numPartitions)
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(builds),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    hot
  }

  private[index] def builtPairs(spark: SparkSession, path: String): Set[(Int, Int)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator.map(_.getPath.getName)
      .collect { case s if s.startsWith("pair=") =>
        val Array(a, b) = s.stripPrefix("pair=").split("_")
        (a.toInt, b.toInt)
      }.toSet
  }

  /** Probe 2-tag queries (qid, qvec, qtag1, qtag2) against their pair's
    * subindex; pairs without one yield no rows (caller falls back to the
    * posting-intersection path). Tags normalize to (min, max) order. */
  def probePairs(spark: SparkSession, path: String, queries: DataFrame,
                 k: Int, efSearch: Int = 64): DataFrame = {
    import spark.implicits._
    val byPair = queries.select(col("qid").cast("long"), col("qvec"),
      col("qtag1").cast("int"), col("qtag2").cast("int"))
      .as[(Long, Array[Float], Int, Int)].collect()
      .groupBy { case (_, _, t1, t2) => (math.min(t1, t2), math.max(t1, t2)) }
    val built = builtPairs(spark, path)
    val parts = byPair.toSeq.sortBy(_._1).collect {
      case (pair, qs) if built(pair) =>
        val qdf = qs.map { case (qid, qv, _, _) => (qid, qv) }.toSeq.toDF("qid", "qvec")
        HnswKnn.probeSaved(spark, s"$path/pair=${pair._1}_${pair._2}", qdf, k, efSearch)
    }
    parts.reduceOption(_ unionByName _)
      .getOrElse(Seq.empty[(Long, Long, Double, Long)].toDF("qid", "id", "dist", "rank"))
  }

  /** List the tags with a persisted subindex under `path`, via the Hadoop
    * FileSystem API — `java.io.File` would return null on HDFS/S3 paths and
    * silently disable every hot-tag route. A missing registry directory is
    * an empty registry (nothing built yet), not an error. */
  private[index] def builtTags(spark: SparkSession, path: String): Set[Int] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator.map(_.getPath.getName)
      .collect { case s if s.startsWith("tag=") => s.stripPrefix("tag=").toInt }
      .toSet
  }

  /** Probe: route each single-tag query to its tag's subindex (queries =
    * (qid, qvec, qtag)); tags without a subindex yield no rows — the caller
    * routes those to the posting-intersection path, as the reference does.
    * The per-tag query groups probe independently; results union. */
  def probe(spark: SparkSession, path: String, queries: DataFrame, k: Int,
            efSearch: Int = 64): DataFrame = {
    import spark.implicits._
    val byTag = queries.select(col("qid").cast("long"), col("qvec"), col("qtag").cast("int"))
      .as[(Long, Array[Float], Int)].collect()
      .groupBy(_._3)
    val built = builtTags(spark, path)
    val parts = byTag.toSeq.sortBy(_._1).collect {
      case (tag, qs) if built(tag) =>
        val qdf = qs.map { case (qid, qv, _) => (qid, qv) }.toSeq.toDF("qid", "qvec")
        HnswKnn.probeSaved(spark, s"$path/tag=$tag", qdf, k, efSearch)
    }
    parts.reduceOption(_ unionByName _)
      .getOrElse(Seq.empty[(Long, Long, Double, Long)].toDF("qid", "id", "dist", "rank"))
  }
}
