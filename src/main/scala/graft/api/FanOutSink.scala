package graft.api

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.tables.TableStore

/** Exactly-once streaming fan-out: ONE stream feeding N tables, each
  * micro-batch committed to ALL of them in a single
  * [[TableStore.transaction]] — the multi-table completion of the
  * single-table sink's contract (reference record stream, SURVEY.md S1;
  * the reference itself cannot express this: its runtime commits one
  * Iceberg table per destination, and even a single-table update is two
  * snapshots, `README.md:74-77`).
  *
  * A route is `(table, transform)`: the transform shapes the shared
  * micro-batch for its table (projection, filter, aggregation — any
  * batch DataFrame program). The canonical use is a raw/landing table
  * plus derived rollups that must never be observed out of sync.
  *
  * RESTART IDEMPOTENCE (exactly-once table effect): foreachBatch is
  * at-least-once — a crash between the transaction's publish and the
  * checkpoint's own commit re-delivers the batch with the same id.
  * Every route's commit records the batch id in its snapshot metadata
  * (same tag scheme as [[CdcStreamSink]]); because the transaction is
  * all-or-nothing, EITHER every table records the id or none does, so
  * a re-delivered batch is skipped on the evidence of any one table —
  * the partial-replay ambiguity a per-table foreachBatch fan-out has
  * (tables A committed, B not, batch replayed: A double-applies or B
  * starves) cannot arise. Batch ids restart at 0 with a fresh
  * checkpoint — re-attaching with a new checkpoint needs a new
  * `sinkId`, enforced loudly like the single-table sink.
  *
  * Scale: the shared micro-batch is persisted once and each route's
  * transform+write is a normal distributed job over it; the
  * transaction adds only O(routes) pointer CAS at publish. */
object FanOutSink {

  def attach(stream: DataFrame, store: TableStore,
      routes: Seq[(String, DataFrame => DataFrame)],
      sinkId: String = "fanout"): DataStreamWriter[Row] = {
    require(routes.nonEmpty, "fan-out needs at least one route")
    require(routes.map(_._1).distinct.size == routes.size,
      "fan-out routes must target distinct tables (compose transforms " +
        "for multiple writes to one table)")
    val tag = CdcStreamSink.batchIdTag(sinkId)
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val lastApplied = routes.flatMap { case (t, _) =>
        store.lastMetaValue(t, tag)
          .flatMap(s => scala.util.Try(s.toLong).toOption)
      }.maxOption
      if (batchId == 0 && lastApplied.exists(_ > 0))
        throw new IllegalStateException(
          s"fan-out sink '$sinkId' saw batch 0 but its tables already " +
            s"record batch ${lastApplied.get} — a FRESH checkpoint on " +
            "already-attached tables would mistake its early batches " +
            "for replays; pass a new sinkId for a new checkpoint")
      if (lastApplied.exists(_ >= batchId)) () // replay: already durable
      else {
        // one materialization feeds every route's job
        batch.persist()
        try {
          store.transaction { tx =>
            routes.foreach { case (table, transform) =>
              tx.append(table, transform(batch),
                meta = Map(tag -> batchId.toString))
            }
          }
        } finally { batch.unpersist(); () }
      }
    }
  }
}
