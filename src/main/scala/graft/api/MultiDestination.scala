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
