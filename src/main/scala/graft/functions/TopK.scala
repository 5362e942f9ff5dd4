package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass bounded top-k aggregator for similarity search.
  *
  * The window formulation (`row_number().over(partitionBy(query))` then
  * `rank <= k`) must SHUFFLE AND SORT every scored candidate row per query —
  * at 100 TB of corpus that is the whole corpus × queries. This Aggregator
  * keeps a bounded k-element buffer per group, so partial aggregation
  * discards non-top-k rows map-side; only (queries × k) rows ever cross the
  * shuffle. Deterministic: ties on score break on ascending id.
  *
  * Buffer is a sorted Vector (descending score) — k is small (≤ 100s), so
  * insertion is effectively O(k) with no heap bookkeeping.
  */
final case class Scored(score: Double, id: Long, payload: Int)

/** Input row: the grouping key travels with the row for groupByKey. */
final case class ScoredRow(query_id: Long, score: Double, id: Long, payload: Int)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredRow, Vector[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Vector[Scored] = Vector.empty

  override def reduce(buf: Vector[Scored], row: ScoredRow): Vector[Scored] =
    insert(buf, Scored(row.score, row.id, row.payload))

  /** Exact duplicates — same (score, id) — collapse to one entry, so LSH
    * callers can feed one candidate row per matching hash table without a
    * separate dedup shuffle: the same corpus vector matching a query in
    * several tables scores identically every time. A duplicate whose copy
    * was already evicted is itself rejected by the bounded-buffer test
    * (identical score, identical id → never `better` than the survivor). */
  private def insert(buf: Vector[Scored], x: Scored): Vector[Scored] = {
    if (buf.length == k && !better(x, buf.last)) buf
    else if (buf.exists(e => e.id == x.id && e.score == x.score)) buf
    else {
      val i = buf.indexWhere(e => better(x, e)) match {
        case -1 => buf.length
        case j => j
      }
      val inserted = (buf.take(i) :+ x) ++ buf.drop(i)
      if (inserted.length > k) inserted.take(k) else inserted
    }
  }

  override def merge(a: Vector[Scored], b: Vector[Scored]): Vector[Scored] =
    b.foldLeft(a)(insert)

  override def finish(buf: Vector[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Vector[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
