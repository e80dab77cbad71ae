package graft.streaming

import graft.operators.{Knn, Metric}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One step of a streaming runbook: `insert` / `delete` over the id range
  * [start, end), or `search` (a grading checkpoint). Mirrors the reference's
  * YAML runbooks (/root/reference/streaming/simple_runbook.yaml:1-21,
  * streaming/run.py:36-58). */
final case class RunbookStep(op: String, start: Long = 0L, end: Long = 0L)

/** Sequential-consistency executor for insert/delete/search op logs over a
  * mutable vector collection (the reference's streaming track,
  * /root/reference/streaming/base.py:9-31).
  *
  * State model — the Spark-native translation of DiskANN-dynamic's
  * lazy-delete design (/root/reference/streaming/diskann/diskann-str.py:
  * 60-99):
  *  - inserts accumulate as id-set DataFrames (union of range scans of the
  *    immutable source table — at scale, a Delta-style upsert log);
  *  - deletes are TOMBSTONES, applied at read time by anti-join (the
  *    `mark_deleted` analog);
  *  - when tombstones exceed `consolidateAt`, the live set is materialized
  *    and tombstones cleared (`consolidate_delete` when live + pending ≥
  *    max_pts — diskann-str.py:90-93). This bounds both anti-join cost and
  *    lineage depth.
  *
  * Every search checkpoint sees exactly the net effect of all prior ops. */
final class RunbookExecutor(
    source: DataFrame, // (id, vec) — immutable base the ranges index into
    queries: DataFrame, // (qid, qvec)
    k: Int = 10,
    consolidateAt: Long = 1000L) {

  /** Run all steps; returns (stepIndex → search result) for every search
    * checkpoint, each (qid, id, dist, rank). */
  def run(steps: Seq[RunbookStep]): Map[Int, DataFrame] = {
    val spark = source.sparkSession
    import spark.implicits._
    var inserted: DataFrame = Seq.empty[Long].toDF("id")
    var tombstones: DataFrame = Seq.empty[Long].toDF("id")
    var nTombstones = 0L
    val checkpoints = Map.newBuilder[Int, DataFrame]

    steps.zipWithIndex.foreach { case (step, i) =>
      step.op match {
        case "insert" =>
          inserted = inserted.unionByName(
            source.where(col("id") >= step.start && col("id") < step.end)
              .select("id"))
        case "delete" =>
          tombstones = tombstones.unionByName(
            inserted.where(col("id") >= step.start && col("id") < step.end))
          nTombstones += (step.end - step.start)
          if (nTombstones >= consolidateAt) {
            // consolidate: materialize the net live set, drop tombstones
            inserted = inserted.join(tombstones, Seq("id"), "left_anti")
              .cache()
            inserted.count()
            tombstones = Seq.empty[Long].toDF("id")
            nTombstones = 0L
          }
        case "search" =>
          val live = inserted.join(tombstones, Seq("id"), "left_anti")
          val liveVecs = live.join(source, "id")
          checkpoints += i -> Knn.knnJoin(queries, liveVecs, k, Metric.L2)
        case other =>
          throw new IllegalArgumentException(s"unknown runbook op: $other")
      }
    }
    checkpoints.result()
  }
}
