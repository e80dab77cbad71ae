package graft.index

import graft.operators.{Knn, Metric, TagFilter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §7.1 layer-4 unified index abstraction: one interface over the
  * flat (brute-force), IVF, and partition-local-HNSW paths, with uniform
  * persistence. Mirrors the reference's algorithm wrappers, which expose
  * the same fit/query surface over faiss, DiskANN, and the custom HNSW
  * (/root/reference/filter/base.py:4, ood/base.py:3, and the
  * load-or-build pattern filter/faiss/faiss.py:196-205).
  *
  * Contracts:
  *  - `probe(queries, k)`: queries (qid, qvec) → (qid, id, dist, rank);
  *  - `probeFiltered(queries, k)`: queries additionally carry
  *    `qtags ARRAY<INT>`; every returned id's tag set contains ALL query
  *    tags (conjunctive — the filter-track predicate);
  *  - `save(path)`: self-describing on-disk artifact;
  *    [[VectorIndex.load]] dispatches on the persisted kind, so callers
  *    need not know which index family wrote a path.
  *
  * Exactness: flat is exact; IVF is exact at nprobe = C; HNSW is
  * approximate with a one-stage candidate-count guarantee under filters. */
trait VectorIndex {
  def probe(queries: DataFrame, k: Int): DataFrame
  def probeFiltered(queries: DataFrame, k: Int): DataFrame
  def save(path: String): Unit
}

/** X5 brute-force index: the base table itself (id, vec, tags?) — Spark's
  * native mode; the reference's flat store (filter/hnsw/bruteforce.h). */
final class FlatVectorIndex(base: DataFrame) extends VectorIndex {
  def probe(queries: DataFrame, k: Int): DataFrame =
    Knn.knnJoin(queries.select("qid", "qvec"), base.select("id", "vec"), k, Metric.L2)
  def probeFiltered(queries: DataFrame, k: Int): DataFrame =
    TagFilter.filteredKnn(queries, base, k)
  def save(path: String): Unit = {
    VectorIndex.writeKind(base.sparkSession, path, "flat")
    base.write.mode("overwrite").parquet(s"$path/base")
  }
}

/** IVF over the shared base: centroid routing + cluster-pruned scan. */
final class IvfVectorIndex(ivf: IvfIndex, base: DataFrame, nprobe: Int) extends VectorIndex {
  def probe(queries: DataFrame, k: Int): DataFrame =
    ivf.probe(queries.select("qid", "qvec"), base.select("id", "vec"), k, nprobe)
  def probeFiltered(queries: DataFrame, k: Int): DataFrame = {
    // route to nprobe clusters, then evaluate the conjunctive predicate
    // IN-STREAM over the routed clusters' rows before scoring — filtering
    // narrows the cluster scan, it is never applied after a top-k cut (that
    // would starve selective queries). Exact at nprobe = C.
    val routes = graft.operators.TopK.aggTopK(
      queries.select("qid", "qvec").crossJoin(broadcast(ivf.centroids))
        .withColumn("dist", Metric.distColumn(Metric.L2, col("qvec"), col("cvec"))),
      "qid", "cid", "dist", nprobe)
      .select("qid", "cid")
    val cand = routes.join(ivf.assigned, "cid").select("qid", "id")
    val scored = cand
      .join(base.select(col("id"), col("vec"), col("tags")), "id")
      .join(broadcast(queries.select("qid", "qvec", "qtags")), "qid")
      .where(forall(col("qtags"), t => array_contains(col("tags"), t)))
      .withColumn("dist", Metric.distColumn(Metric.L2, col("qvec"), col("vec")))
    graft.operators.TopK.aggTopK(scored, "qid", "id", "dist", k)
  }
  def save(path: String): Unit = {
    VectorIndex.writeKind(base.sparkSession, path, "ivf")
    IvfIndex.save(ivf, s"$path/ivf")
    base.write.mode("overwrite").parquet(s"$path/base")
  }
}

/** Partition-local HNSW, persisted-graph backed: probes never rebuild. */
final class HnswVectorIndex(spark: SparkSession, graphPath: String,
                            efSearch: Int) extends VectorIndex {
  def probe(queries: DataFrame, k: Int): DataFrame =
    HnswKnn.probeSaved(spark, graphPath, queries, k, efSearch)
  def probeFiltered(queries: DataFrame, k: Int): DataFrame =
    HnswKnn.probeSavedFiltered(spark, graphPath, queries, k, efSearch)
  def save(path: String): Unit = {
    VectorIndex.writeKind(spark, path, "hnsw")
    spark.read.parquet(graphPath).write.mode("overwrite")
      .partitionBy("part").parquet(s"$path/graph")
  }
}

/** SQ8-coded partition-local HNSW: the persisted graph stores uint8 codes
  * (4× smaller resident artifact), probes traverse with integer distances
  * and re-rank exactly against the float base. Filtered probes route to
  * the exact conjunctive path over the base (the code graph carries no tag
  * sidecar — selective filters on a quantized graph would pay the
  * expand-until-k cost twice, once on codes and once at re-rank). */
final class HnswSq8VectorIndex(spark: SparkSession, graphPath: String,
                               base: DataFrame, rerank: Int,
                               efSearch: Int) extends VectorIndex {
  def probe(queries: DataFrame, k: Int): DataFrame =
    HnswKnn.probeSavedSq8(spark, graphPath, queries,
      base.select("id", "vec"), k, math.max(rerank, k), efSearch)
  def probeFiltered(queries: DataFrame, k: Int): DataFrame =
    TagFilter.filteredKnn(queries, base, k)
  def save(path: String): Unit = {
    VectorIndex.writeKind(spark, path, "hnsw_sq8")
    spark.read.parquet(graphPath).write.mode("overwrite")
      .partitionBy("part").parquet(s"$path/graph")
    spark.read.parquet(graphPath + ".quant").write.mode("overwrite")
      .parquet(s"$path/graph.quant")
    base.write.mode("overwrite").parquet(s"$path/base")
  }
}

/** PQ-coded flat index: candidate generation gather-scans m-byte codes via
  * the ADC kernel (scan width independent of dimension), exact float
  * re-rank restores recall. Filtered probes route to the exact conjunctive
  * path over the base (codes carry no tag sidecar — same reasoning as the
  * SQ8 graph). With a lossless codebook probes are exact. */
final class PqVectorIndex(spark: SparkSession, cb: Pq.Codebook,
                          codes: DataFrame, base: DataFrame,
                          rerank: Int) extends VectorIndex {
  def probe(queries: DataFrame, k: Int): DataFrame =
    Pq.adcKnnCodes(queries.select("qid", "qvec"), codes,
      base.select("id", "vec"), cb, k, math.max(rerank, k))
  def probeFiltered(queries: DataFrame, k: Int): DataFrame =
    TagFilter.filteredKnn(queries, base, k)
  def save(path: String): Unit = {
    VectorIndex.writeKind(spark, path, "pq")
    Pq.saveArtifacts(spark, cb, codes, s"$path/pq")
    base.write.mode("overwrite").parquet(s"$path/base")
  }
}

/** OPQ-rotated PQ (faiss's OPQx,PQy pre-transform): codes live in the
  * PCA-rotated space, probes build rotated LUTs, the re-rank reports
  * ORIGINAL-space distances. Rotation + codebook + codes persist together;
  * with a lossless rotated codebook probes are exact. Filtered probes
  * route to the exact conjunctive path over the base. */
final class OpqVectorIndex(spark: SparkSession, rot: Opq.Rotation,
                           cb: Pq.Codebook, codes: DataFrame,
                           base: DataFrame, rerank: Int) extends VectorIndex {
  def probe(queries: DataFrame, k: Int): DataFrame =
    Opq.adcKnnRotatedCodes(queries.select("qid", "qvec"), codes,
      base.select("id", "vec"), rot, cb, k, math.max(rerank, k))
  def probeFiltered(queries: DataFrame, k: Int): DataFrame =
    TagFilter.filteredKnn(queries, base, k)
  def save(path: String): Unit = {
    VectorIndex.writeKind(spark, path, "opq")
    Opq.saveRotation(spark, rot, s"$path/rotation")
    Pq.saveArtifacts(spark, cb, codes, s"$path/pq")
    base.write.mode("overwrite").parquet(s"$path/base")
  }
}

/** Residual IVF-PQ (faiss's IVFx,PQy): coarse routing over residual-coded
  * lists, per-route ADC LUTs, exact re-rank. Filtered probes route to the
  * exact conjunctive path over the base, as with the other coded kinds. */
final class IvfPqVectorIndex(idx: IvfPq.IvfPqIndex, base: DataFrame,
                             nprobe: Int, rerank: Int) extends VectorIndex {
  def probe(queries: DataFrame, k: Int): DataFrame =
    idx.probe(queries.select("qid", "qvec"), base.select("id", "vec"), k,
      nprobe, math.max(rerank, k))
  def probeFiltered(queries: DataFrame, k: Int): DataFrame =
    TagFilter.filteredKnn(queries, base, k)
  def save(path: String): Unit = {
    VectorIndex.writeKind(base.sparkSession, path, "ivfpq")
    idx.save(s"$path/ivfpq")
    base.write.mode("overwrite").parquet(s"$path/base")
  }
}

/** Centroid-routed per-cluster HNSW ([[HnswRouted]]): probes touch only the
  * nprobe nearest clusters' graphs. The resident graphs pin lazily on first
  * probe and stay pinned (build-once/probe-many). Filtered probes route to
  * the exact conjunctive path over the base — the routed artifact carries
  * no tag sidecar, same reasoning as the SQ8 graph. */
final class HnswRoutedVectorIndex(spark: SparkSession, graphPath: String,
                                  base: DataFrame, nprobe: Int,
                                  efSearch: Int) extends VectorIndex {
  private lazy val resident = HnswRouted.loadResident(spark, graphPath)
  def probe(queries: DataFrame, k: Int): DataFrame =
    resident.probeLocal(queries, k, efSearch, nprobe)
  def probeFiltered(queries: DataFrame, k: Int): DataFrame =
    TagFilter.filteredKnn(queries, base, k)
  def save(path: String): Unit = {
    VectorIndex.writeKind(spark, path, "hnsw_routed")
    spark.read.parquet(graphPath).write.mode("overwrite")
      .partitionBy("part").parquet(s"$path/graph")
    spark.read.parquet(graphPath + ".centroids").write.mode("overwrite")
      .parquet(s"$path/graph.centroids")
    base.write.mode("overwrite").parquet(s"$path/base")
  }
}

/** Binary sign-hash index: persisted packed codes drive a Hamming top-c
  * first pass, the float base re-ranks the survivors under L2 — the coded
  * kind with the cheapest scan tier (one machine word per 64 dims; faiss's
  * IndexBinary family). `rerank` is the candidate budget: rerank ≥ |base|
  * degenerates to exact float kNN (the `ann_binary_persisted_exact` gate).
  * Filtered probes route to the exact conjunctive path over the base, as
  * with the other coded kinds. */
final class BinaryVectorIndex(codes: DataFrame, base: DataFrame,
                              rerank: Int) extends VectorIndex {
  import graft.functions.vectors._
  def probe(queries: DataFrame, k: Int): DataFrame = {
    val c = math.max(rerank, k)
    val q = queries.select(col("qid"), col("qvec"))
      .withColumn("_qcode", vecSignPack(col("qvec")))
    val cand = graft.operators.TopK.aggTopK(
      codes.crossJoin(broadcast(q))
        .withColumn("dist", vecHamming(col("_qcode"), col("code"))),
      "qid", "id", "dist", c)
      .select(col("qid"), col("id"))
    val gathered = base.select(col("id"), col("vec"))
      .join(broadcast(cand), "id")
      .join(broadcast(queries.select(col("qid"), col("qvec"))), "qid")
    graft.operators.TopK.aggTopK(
      gathered.withColumn("dist",
        Metric.distColumn(Metric.L2, col("qvec"), col("vec"))),
      "qid", "id", "dist", k)
  }
  def probeFiltered(queries: DataFrame, k: Int): DataFrame =
    TagFilter.filteredKnn(queries, base, k)
  def save(path: String): Unit = {
    VectorIndex.writeKind(base.sparkSession, path, "binary")
    codes.write.mode("overwrite").parquet(s"$path/codes")
    base.write.mode("overwrite").parquet(s"$path/base")
  }
}

object VectorIndex {

  /** Build the requested index kind over a (id, vec[, tags]) base. */
  def flat(base: DataFrame): VectorIndex = new FlatVectorIndex(base)

  /** Binary sign-hash index: packed codes + float re-rank budget. */
  def binary(base: DataFrame, rerank: Int = 40): VectorIndex = {
    import graft.functions.vectors._
    new BinaryVectorIndex(
      base.select(col("id"), vecSignPack(col("vec")).as("code")),
      base, rerank)
  }

  def ivf(base: DataFrame, c: Int, iters: Int, nprobe: Int): VectorIndex =
    new IvfVectorIndex(IvfIndex.build(base.select("id", "vec"), c, iters), base, nprobe)

  def hnsw(base: DataFrame, workPath: String, m: Int = 16,
           efConstruction: Int = 100, efSearch: Int = 64,
           numPartitions: Int = 8): VectorIndex = {
    HnswKnn.buildAndSave(base, workPath, m, efConstruction, numPartitions)
    new HnswVectorIndex(base.sparkSession, workPath, efSearch)
  }

  def hnswSq8(base: DataFrame, workPath: String, m: Int = 16,
              efConstruction: Int = 100, efSearch: Int = 64,
              numPartitions: Int = 8, rerank: Int = 40): VectorIndex = {
    val (mins, spans) = Sq8.train(base.select("id", "vec"))
    HnswKnn.buildAndSaveSq8(base, workPath, mins, spans, m, efConstruction,
      numPartitions)
    new HnswSq8VectorIndex(base.sparkSession, workPath, base, rerank, efSearch)
  }

  def pq(base: DataFrame, m: Int = 8, ksub: Int = 32, iters: Int = 3,
         rerank: Int = 100): VectorIndex = {
    val cb = Pq.train(base.select("id", "vec"), m, ksub, iters)
    new PqVectorIndex(base.sparkSession, cb,
      Pq.encode(base.select("id", "vec"), cb).select("id", "codes"),
      base, rerank)
  }

  def opq(base: DataFrame, m: Int = 8, ksub: Int = 32, iters: Int = 3,
          rerank: Int = 100): VectorIndex = {
    val (rot, cb) = Opq.trainRotated(base.select("id", "vec"), m, ksub, iters)
    val rotated = base.select(col("id"),
      Opq.rotateCol(rot, col("vec")).as("vec"))
    new OpqVectorIndex(base.sparkSession, rot, cb,
      Pq.encode(rotated, cb).select("id", "codes"), base, rerank)
  }

  def ivfPq(base: DataFrame, c: Int = 8, iters: Int = 3, m: Int = 8,
            ksub: Int = 32, nprobe: Int = 4, rerank: Int = 100): VectorIndex =
    new IvfPqVectorIndex(
      IvfPq.buildResidual(base.select("id", "vec"), c, iters, m, ksub),
      base, nprobe, rerank)

  def hnswRouted(base: DataFrame, workPath: String, c: Int = 8,
                 kmIters: Int = 3, m: Int = 16, efConstruction: Int = 100,
                 efSearch: Int = 64, nprobe: Int = 2): VectorIndex = {
    HnswRouted.buildAndSave(base.select("id", "vec"), workPath, c, kmIters,
      m, efConstruction)
    new HnswRoutedVectorIndex(base.sparkSession, workPath, base, nprobe,
      efSearch)
  }

  /** Load any persisted VectorIndex; dispatches on the saved kind marker
    * (the load-or-build pattern, faiss.py:196-205). */
  def load(spark: SparkSession, path: String, nprobe: Int = 8,
           efSearch: Int = 64, rerank: Int = 40): VectorIndex =
    readKind(spark, path) match {
      case "flat" => new FlatVectorIndex(spark.read.parquet(s"$path/base"))
      case "ivf" => new IvfVectorIndex(IvfIndex.load(spark, s"$path/ivf"),
        spark.read.parquet(s"$path/base"), nprobe)
      case "hnsw" => new HnswVectorIndex(spark, s"$path/graph", efSearch)
      case "hnsw_sq8" => new HnswSq8VectorIndex(spark, s"$path/graph",
        spark.read.parquet(s"$path/base"), rerank, efSearch)
      case "hnsw_routed" => new HnswRoutedVectorIndex(spark, s"$path/graph",
        spark.read.parquet(s"$path/base"), nprobe, efSearch)
      case "pq" =>
        val (cb, codes) = Pq.load(spark, s"$path/pq")
        new PqVectorIndex(spark, cb, codes,
          spark.read.parquet(s"$path/base"), rerank)
      case "opq" =>
        val (cb, codes) = Pq.load(spark, s"$path/pq")
        new OpqVectorIndex(spark, Opq.loadRotation(spark, s"$path/rotation"),
          cb, codes, spark.read.parquet(s"$path/base"), rerank)
      case "ivfpq" =>
        new IvfPqVectorIndex(IvfPq.load(spark, s"$path/ivfpq"),
          spark.read.parquet(s"$path/base"), nprobe, rerank)
      case "binary" =>
        new BinaryVectorIndex(spark.read.parquet(s"$path/codes"),
          spark.read.parquet(s"$path/base"), rerank)
      case other => throw new IllegalArgumentException(s"unknown index kind: $other")
    }

  private[index] def writeKind(spark: SparkSession, path: String, kind: String): Unit = {
    import spark.implicits._
    Seq(kind).toDF("kind").coalesce(1).write.mode("overwrite").parquet(s"$path/kind")
  }

  private def readKind(spark: SparkSession, path: String): String =
    spark.read.parquet(s"$path/kind").head().getString(0)
}
