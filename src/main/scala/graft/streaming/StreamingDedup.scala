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
}
