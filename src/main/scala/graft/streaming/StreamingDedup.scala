package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — the ingest-time form of
  * [[graft.operators.Dedup.exactDedup]]: as documents arrive across
  * micro-batches, emit each content fingerprint's FIRST document and drop
  * every later duplicate. This is the shape a continuously-fed training
  * corpus needs (dedup against everything already ingested, not just the
  * current batch) without re-scanning history: per-fingerprint state is one
  * long (the canonical doc id), so state size is O(distinct documents), and
  * the per-batch work is one shuffle of the batch keyed on fingerprint.
  *
  * Within a batch the lowest doc_id wins (deterministic); across batches
  * arrival order wins — feed batches in id order and the kept set equals
  * the batch operator's canonical rows exactly (asserted in StreamingSpec).
  *
  * State is kept forever by design (a duplicate a month later is still a
  * duplicate); at 100 TB the state store backs onto disk (RocksDB state
  * store) and the fingerprint space can be range-sharded. A TTL would
  * trade completeness for state size — that is a policy knob, not a
  * correctness default.
  */
object StreamingDedup {

  case class DocIn(doc_id: Long, fp: String)
  case class DocKept(doc_id: Long, fp: String)

  def firstOccurrenceStream(docs: Dataset[DocIn]): Dataset[DocKept] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState[Long, DocKept](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (fp: String, batch: Iterator[DocIn], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty // fp already canonicalized
          else {
            val first = batch.map(_.doc_id).min
            state.update(first)
            Iterator(DocKept(first, fp))
          }
      }
  }

  /** One LSH band row: the doc's minhash band key, as produced map-side by
    * [[graft.operators.Dedup.lshBands]] — the streaming source computes
    * bands per micro-batch exactly like the batch pipeline does. */
  case class BandIn(doc_id: Long, band: Int, bkey: String)

  /** An unordered candidate near-dup pair, a_id < b_id. */
  case class CandPair(a_id: Long, b_id: Long)

  /** Streaming MinHash-LSH CANDIDATE generation — the ingest-time form of
    * the band-bucket self-join inside [[graft.operators.Dedup.minhashLsh]]:
    * as band rows arrive, each (band, bkey) bucket's state is its member
    * doc ids, and a new member emits one candidate pair against every
    * existing member. Across any batch arrival order, the DISTINCT emitted
    * pair set equals the batch self-join's candidate set exactly (asserted
    * in StreamingSpec) — a pair sharing several buckets may be emitted once
    * per bucket, as the batch join also produces it once per bucket before
    * its `distinct()`.
    *
    * VERIFICATION stays a batch concern by design: exact-Jaccard
    * confirmation needs the two docs' shingle sets, which would bloat
    * per-bucket state from O(ids) to O(corpus text). The streaming job
    * emits candidates continuously; a periodic batch join verifies them
    * (candidate-first, like minhashLsh's verify stage).
    *
    * `maxBucket` bounds per-bucket state AND emission on a long-running
    * stream — the streaming mirror of the batch path's `maxDf` hot-shingle
    * cap: a bucket that reaches the cap is a boilerplate band shared by
    * "everything" (a stopword-like key whose pairs are near-worthless as
    * candidates and quadratic in cost), so it SATURATES — later arrivals
    * neither extend its state nor emit pairs against it. Buckets under the
    * cap behave exactly like the batch self-join. */
  def lshCandidateStream(bands: Dataset[BandIn],
                         maxBucket: Int = 1024): Dataset[CandPair] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(b => (b.band, b.bkey))
      .flatMapGroupsWithState[Seq[Long], CandPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, String), batch: Iterator[BandIn], state: GroupState[Seq[Long]]) =>
          val existing = state.getOption.getOrElse(Seq.empty)
          if (existing.size >= maxBucket) Iterator.empty // saturated bucket
          else {
            val arriving = batch.map(_.doc_id).toSeq.distinct.sorted
              .filterNot(existing.contains)
              .take(math.max(0, maxBucket - existing.size))
            if (arriving.nonEmpty) state.update(existing ++ arriving)
            arriving.iterator.zipWithIndex.flatMap { case (nid, i) =>
              (existing.iterator ++ arriving.iterator.take(i)).map { other =>
                CandPair(math.min(nid, other), math.max(nid, other))
              }
            }
          }
      }
  }
}
