package graft.api

import scala.util.Try
import org.apache.spark.sql.SparkSession
import graft.cdc._
import graft.tables.TableStore

/** Multi-collection CDC destination: records route to per-collection
  * tables by the standard `opencdc.collection` metadata key, and each
  * batch commits to EVERY touched table in one
  * [[TableStore.transaction]].
  *
  * The reference pins one table per destination instance and ignores
  * record metadata entirely (`SparkDestinationStream.java` never reads
  * it; `opencdc.proto:64-67` defines the map) — so a Conduit pipeline
  * carrying a multi-collection stream needs one connector per table and
  * gets no cross-table consistency. Here a batch that updates `orders`
  * and `customer` together becomes ONE atomic publish: a reader can
  * never observe the orders half without the customer half, and a
  * failure anywhere in the batch (unknown collection, malformed record
  * under strict validation, pointer race) applies NOTHING.
  *
  * Schema stays catalog-owned per table, like the single-table
  * [[Destination]]: every routed table must already exist. Key columns
  * are configured per collection (`customer=c_custkey;orders=o_orderkey`)
  * with an optional bare default list applied to collections not named.
  */
object MultiDestination {

  final case class Config(storeRoot: String,
      keyColsByCollection: Map[String, Seq[String]],
      defaultKeyCols: Seq[String] = Nil,
      collectionKey: String = "opencdc.collection",
      fallbackTable: Option[String] = None,
      validation: String = "strict",
      hadoopProps: Map[String, String] = Map.empty) {
    require(keyColsByCollection.nonEmpty || defaultKeyCols.nonEmpty,
      "config: key.columns is required")
  }

  /** Parse the `key.columns` grammar: `;`-separated entries, each either
    * `collection=col[,col...]` or a bare `col[,col...]` default. */
  def parseKeyCols(spec: String): (Map[String, Seq[String]], Seq[String]) = {
    val entries = spec.split(";").map(_.trim).filter(_.nonEmpty)
    val (named, bare) = entries.partition(_.contains("="))
    require(bare.size <= 1,
      s"key.columns: more than one default entry (${bare.mkString("; ")})")
    def cols(s: String): Seq[String] =
      s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val byCollection = named.map { e =>
      val Array(t, cs) = e.split("=", 2)
      require(t.trim.nonEmpty && cols(cs).nonEmpty,
        s"key.columns: malformed entry '$e'")
      t.trim -> cols(cs)
    }.toMap
    (byCollection, bare.headOption.map(cols).getOrElse(Nil))
  }

  def open(spark: SparkSession, config: Config): MultiDestinationStream =
    new MultiDestinationStream(spark,
      new TableStore(spark, config.storeRoot, config.hadoopProps), config)
}

/** An open multi-collection ingest stream. Thread-unsafe single-writer,
  * like the reference's strictly-sequential record stream. */
final class MultiDestinationStream private[api] (
    spark: SparkSession, store: TableStore,
    config: MultiDestination.Config) {

  private def tableOf(r: CdcRecord): String =
    r.metadata.get(config.collectionKey)
      .orElse(config.fallbackTable)
      .getOrElse(throw new IllegalArgumentException(
        s"record carries no ${config.collectionKey} metadata and no " +
          "fallback table is configured"))

  private def cfgFor(table: String): CdcApply.CdcConfig = {
    val keys = config.keyColsByCollection.getOrElse(table,
      config.defaultKeyCols)
    require(keys.nonEmpty,
      s"no key columns configured for collection $table " +
        "(add 'table=cols' to key.columns or a bare default entry)")
    CdcApply.CdcConfig(table, keys,
      strictValidation = config.validation == "strict")
  }

  /** Batched multi-collection write: records group by collection
    * (original order preserved within each group — per-key ordering is
    * only meaningful within a collection anyway), each group applies
    * through the same distributed CDC machinery as the single-table
    * sink, and ALL groups publish as one transaction. Acks preserve
    * record order and are only returned once every table's commit is
    * durable — all-or-nothing across collections, not just within one. */
  def writeBatch(records: Seq[CdcRecord]): Try[Seq[Ack]] = Try {
    if (records.nonEmpty) {
      val groups = records.groupBy(tableOf)
      // loud before any work: a typo'd collection must not waste a
      // transaction's staging (tables are catalog-owned, never created)
      groups.keys.foreach { t =>
        require(store.exists(t),
          s"table $t does not exist — schema is catalog-owned, create " +
            "it first (mirrors reference: connector never creates tables)")
      }
      store.transaction { tx =>
        groups.toSeq.sortBy(_._1).foreach { case (t, recs) =>
          CdcApply(spark, tx, cfgFor(t), recs)
        }
      }
    }
    records.map(r => Ack(r.position))
  }

  /** Current contents of one routed table (read-your-writes after an
    * ack). */
  def table(name: String) = store.read(name)
}

/** Streaming multi-collection CDC sink: one envelope stream carrying a
  * collection column fans out to per-collection tables, every
  * micro-batch committed to ALL touched tables in one
  * [[TableStore.transaction]] — [[CdcStreamSink]]'s routing-aware,
  * cross-table-atomic completion, with [[FanOutSink]]'s replay
  * contract: batch ids record in every routed table's commit metadata,
  * and because publication is all-or-nothing a re-delivered batch is
  * skipped on the evidence of any one table. The set of tables a batch
  * touches may vary batch to batch (only collections PRESENT in the
  * batch commit), which is exactly why the replay check takes the max
  * over every CONFIGURED collection's table rather than the batch's.
  *
  * Expected input columns: `op`, `key`, `payload` (as
  * [[CdcStreamSink]]), plus the collection column (default
  * `collection`); an optional `seqCol` carries a source offset/LSN for
  * cross-partition last-write-wins within a batch. */
object MultiCdcStreamSink {

  def attach(spark: SparkSession, stream: org.apache.spark.sql.DataFrame,
      store: TableStore, keyColsByCollection: Map[String, Seq[String]],
      collectionCol: String = "collection",
      seqCol: Option[String] = None,
      sinkId: String = "multi"): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(keyColsByCollection.nonEmpty, "at least one collection route")
    val tag = CdcStreamSink.batchIdTag(sinkId)
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions._
        val lastApplied = keyColsByCollection.keys.toSeq.flatMap { t =>
          if (store.exists(t))
            store.lastMetaValue(t, tag)
              .flatMap(s => scala.util.Try(s.toLong).toOption)
          else None
        }.maxOption
        if (batchId == 0 && lastApplied.exists(_ > 0))
          throw new IllegalStateException(
            s"multi-collection sink '$sinkId' saw batch 0 but its tables " +
              s"already record batch ${lastApplied.get} — pass a new " +
              "sinkId for a new checkpoint")
        if (lastApplied.exists(_ >= batchId)) () // replay: already durable
        else {
          batch.persist()
          try {
            // collections present in THIS batch — driver-side, bounded
            // by the configured table count
            val present = batch.select(col(collectionCol))
              .distinct().collect().map(_.getString(0)).sorted
            present.foreach { c =>
              require(keyColsByCollection.contains(c),
                s"batch $batchId carries unrouted collection '$c' " +
                  s"(configured: ${keyColsByCollection.keys.toSeq.sorted
                    .mkString(", ")})")
              require(store.exists(c), s"table $c does not exist — " +
                "schema is catalog-owned, create it first")
            }
            store.transaction { tx =>
              present.foreach { c =>
                val seq = seqCol.map(s => col(s).cast("long"))
                  .getOrElse(monotonically_increasing_id())
                val env = batch.filter(col(collectionCol) === c)
                  .withColumn("__seq", seq)
                  .select(col("__seq"), lower(col("op")).as("__op"),
                    col("key").as("__key"), col("payload").as("__payload"))
                CdcApply.applyEnvelopes(spark, tx,
                  CdcApply.CdcConfig(c, keyColsByCollection(c)), env,
                  commitTags = Map(tag -> batchId.toString))
                ()
              }
            }
          } finally { batch.unpersist(); () }
        }
    }
  }
}
