package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** One candidate for the bottom-k sample: the hashed priority and its doc. */
final case class BkEntry(pri: String, docId: Long)

/** Bounded bottom-k buffer — always sorted ascending by (pri, docId), never
  * more than k entries.
  */
final case class BkState(entries: Seq[BkEntry])

/** Input row shape for the per-source bottom-k sample (j42/j45). */
final case class DocPri(source: String, doc_id: Long, pri: String)

/** Deterministic bottom-k sampling as a bounded-heap typed `Aggregator` —
  * the execution shape j42's window formulation only gestures at: each
  * partition keeps at most k (priority, doc) entries (`reduce`), partials
  * merge by sorted-merge-take-k (`merge`) — legal because bottom-k of a
  * union IS the bottom-k of the per-part bottom-k's (the LawsSpec
  * mergeability property). The shuffle then carries one ≤k-entry buffer per
  * (partition × source) instead of sorting every corpus row through a
  * per-source window — at 100 TB the window's full-partition sort is the
  * difference between a constant-memory aggregate and a spill.
  *
  * Output order inside the buffer is total ((pri, docId), and priorities are
  * md5 of the unique doc_id, so ties are impossible) — byte-identical to the
  * window query's `ORDER BY pri, doc_id` ranking, which is the QueriesSpec
  * differential.
  */
final class BottomK(k: Int) extends Aggregator[DocPri, BkState, BkState] {
  private val ord: Ordering[BkEntry] = Ordering.by(e => (e.pri, e.docId))

  override def zero: BkState = BkState(Vector.empty)

  override def reduce(b: BkState, x: DocPri): BkState = {
    val e = BkEntry(x.pri, x.doc_id)
    if (b.entries.size < k)
      BkState((b.entries :+ e).sorted(ord))
    else if (ord.lt(e, b.entries.last))
      BkState((b.entries.init :+ e).sorted(ord))
    else b
  }

  override def merge(a: BkState, b: BkState): BkState =
    BkState((a.entries ++ b.entries).sorted(ord).take(k))

  override def finish(r: BkState): BkState = r

  override def bufferEncoder: Encoder[BkState] = Encoders.product[BkState]
  override def outputEncoder: Encoder[BkState] = Encoders.product[BkState]
}
