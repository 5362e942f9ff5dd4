package graft.tables

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` surface for table maintenance — the Iceberg stored-
  * procedure model the reference's users reach through the same Spark
  * extensions that give them MERGE (`SparkUtils.java:45`):
  *
  * {{{
  * CALL graft.system.compact(`table` => 'orders', num_files => 8)
  * CALL graft.system.expire_snapshots('orders', 3)
  * CALL graft.system.remove_orphans('orders')
  * CALL graft.system.materialize_deletes('orders')
  * CALL graft.system.create_branch('orders', 'audit')
  * CALL graft.system.fast_forward('orders', 'audit')
  * }}}
  *
  * Each procedure delegates to the corresponding [[TableStore]]
  * operation (one atomic snapshot where a commit happens) and returns a
  * one-row result describing what changed, served as a [[LocalScan]] —
  * maintenance is driver-orchestrated metadata work; the heavy lifting
  * (compaction rewrite jobs) runs distributed inside TableStore.
  */
private[tables] object GraftProcedures {

  def names: Seq[String] = Seq("compact", "expire_snapshots",
    "remove_orphans", "materialize_deletes", "rewrite_deletes",
    "maintain_deletes", "rewrite_small_files", "maintain",
    "maintain_index", "rebuild_index", "add_variant_shred", "create_branch",
    "create_tag", "drop_ref", "fast_forward", "rollback_to_version",
    "add_files", "migrate", "snapshot", "analyze", "create_view",
    "drop_view", "create_mview", "refresh_mview")

  def load(store: => TableStore, name: String): Option[UnboundProcedure] = {
    def p(parameters: Seq[ProcedureParameter], result: StructType)(
        run: InternalRow => Seq[Any]): UnboundProcedure =
      new GraftProcedure(name, parameters, result, row => run(row))
    def in(n: String, dt: DataType) = ProcedureParameter.in(n, dt).build()
    def inDef(n: String, dt: DataType, d: String) =
      ProcedureParameter.in(n, dt).defaultValue(d).build()
    def out(fields: (String, DataType)*): StructType =
      StructType(fields.map { case (n, dt) => StructField(n, dt, nullable = false) })
    def tbl(row: InternalRow): String = row.getUTF8String(0).toString

    name match {
      case "compact" => Some(p(
        Seq(in("table", StringType), inDef("num_files", IntegerType, "0"),
          inDef("cluster_cols", StringType, "''")),
        out("files_before" -> LongType, "files_after" -> LongType,
          "version" -> LongType)) { row =>
        val t = tbl(row)
        val before = store.currentRelPaths(t).size.toLong
        val cols = row.getUTF8String(2).toString.split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq
        store.compact(t, numFiles = row.getInt(1), clusterCols = cols)
        Seq(before, store.currentRelPaths(t).size.toLong,
          store.currentVersion(t).toLong)
      })
      case "rewrite_small_files" => Some(p(
        // Iceberg rewrite_data_files(strategy=>'binpack'): rewrite ONLY
        // undersized files, O(small files) not O(table) — the routine
        // maintenance shape; `compact` stays the full-rewrite tool
        Seq(in("table", StringType),
          inDef("target_bytes", LongType,
            TableStore.DefaultTargetFileBytes.toString),
          inDef("min_input_files", IntegerType, "2")),
        out("rewritten" -> LongType, "written" -> LongType,
          "version" -> LongType)) { row =>
        val t = tbl(row)
        val (rw, wr) = store.compactSmallFiles(t,
          targetBytes = row.getLong(1), minInputFiles = row.getInt(2))
        Seq(rw.toLong, wr.toLong, store.currentVersion(t).toLong)
      })
      case "expire_snapshots" => Some(p(
        Seq(in("table", StringType), inDef("keep_last", IntegerType, "1")),
        out("kept" -> LongType, "version" -> LongType)) { row =>
        val t = tbl(row)
        store.expireSnapshots(t, keepLast = row.getInt(1))
        Seq(math.min(row.getInt(1).toLong, store.currentVersion(t).toLong),
          store.currentVersion(t).toLong)
      })
      case "remove_orphans" => Some(p(
        Seq(in("table", StringType),
          inDef("older_than_ms", LongType, s"${24L * 60 * 60 * 1000}")),
        out("removed" -> LongType)) { row =>
        Seq(store.removeOrphans(tbl(row), row.getLong(1)).size.toLong)
      })
      case "materialize_deletes" => Some(p(
        Seq(in("table", StringType)),
        out("folded" -> LongType, "version" -> LongType)) { row =>
        val t = tbl(row)
        val pending = store.pendingDeletes(t).toLong
        store.materializeDeletes(t)
        Seq(pending, store.currentVersion(t).toLong)
      })
      case "rewrite_deletes" => Some(p(
        Seq(in("table", StringType)),
        out("entries_before" -> LongType, "entries_after" -> LongType,
          "version" -> LongType)) { row =>
        val t = tbl(row)
        val (before, after) = store.rewriteDeletes(t)
        Seq(before.toLong, after.toLong, store.currentVersion(t).toLong)
      })
      case "maintain_deletes" => Some(p(
        Seq(in("table", StringType), inDef("max_entries", IntegerType, "8"),
          inDef("max_bytes", LongType,
            (TableStore.SpjMaskMaxBytes / 2).toString)),
        out("action" -> StringType, "entries_before" -> LongType,
          "entries_after" -> LongType, "version" -> LongType)) { row =>
        val t = tbl(row)
        val (action, before, after) =
          store.maintainDeletes(t, row.getInt(1), row.getLong(2))
        Seq(org.apache.spark.unsafe.types.UTF8String.fromString(action),
          before.toLong, after.toLong, store.currentVersion(t).toLong)
      })
      case "maintain" => Some(p(
        // the whole routine-maintenance policy in one call, in dependency
        // order: fold/merge pending deletes (a materialize rewrites files,
        // so it runs BEFORE packing), bin-pack the undersized files the
        // stream left behind, then expire history beyond the retention.
        // Each step is idempotent and visible rows never change — this is
        // the CALL a scheduler fires per table per interval at 100 TB.
        Seq(in("table", StringType),
          inDef("max_entries", IntegerType, "8"),
          inDef("max_bytes", LongType,
            (TableStore.SpjMaskMaxBytes / 2).toString),
          inDef("target_bytes", LongType,
            TableStore.DefaultTargetFileBytes.toString),
          inDef("keep_last", IntegerType, "0")),
        out("deletes_action" -> StringType, "entries_after" -> LongType,
          "files_rewritten" -> LongType, "files_written" -> LongType,
          "version" -> LongType)) { row =>
        val t = tbl(row)
        val (action, _, after) =
          store.maintainDeletes(t, row.getInt(1), row.getLong(2))
        val (rw, wr) = store.compactSmallFiles(t, row.getLong(3))
        if (row.getInt(4) > 0) store.expireSnapshots(t, row.getInt(4))
        Seq(org.apache.spark.unsafe.types.UTF8String.fromString(action),
          after.toLong, rw.toLong, wr.toLong,
          store.currentVersion(t).toLong)
      })
      case "maintain_index" => Some(p(
        // ANN-index maintenance in one call: incremental refresh to the
        // corpus head, tombstone fold on the index, and a recall-vs-
        // brute-force drift report on a deterministic sample. `action`
        // says "rebuild-recommended" when recall fell below the floor —
        // the signal to re-seed IVF centroids / PQ codebooks after
        // distribution shift (CALL rebuild_index does exactly that).
        Seq(in("corpus", StringType), in("index", StringType),
          inDef("kind", StringType, "'lsh'"),
          inDef("sample", IntegerType, "8"),
          inDef("k", IntegerType, "5"),
          inDef("recall_floor", org.apache.spark.sql.types.DoubleType,
            "0.0")),
        out("rows_indexed" -> LongType, "entries_before" -> LongType,
          "entries_after" -> LongType, "truth_pairs" -> LongType,
          "recall" -> org.apache.spark.sql.types.DoubleType,
          "action" -> StringType, "version" -> LongType)) { row =>
        val (rows, before, after, nTrue, recall, action) =
          graft.ops.AnnIndex.maintainIndex(store,
            row.getUTF8String(0).toString, row.getUTF8String(1).toString,
            row.getUTF8String(2).toString, row.getInt(3), row.getInt(4),
            row.getDouble(5))
        Seq(rows, before, after, nTrue, recall,
          UTF8String.fromString(action),
          store.currentVersion(row.getUTF8String(1).toString).toLong)
      })
      case "rebuild_index" => Some(p(
        // closes maintain_index's "rebuild-recommended" loop: re-seed
        // the learned state (IVF centroids / PQ codebooks) from the
        // CURRENT corpus, build the whole index fresh under a staged
        // name, publish by atomic table swap (readers never see a
        // missing index), then report recall on the rebuilt index —
        // same output shape as maintain_index
        Seq(in("corpus", StringType), in("index", StringType),
          inDef("kind", StringType, "'lsh'"),
          inDef("sample", IntegerType, "8"),
          inDef("k", IntegerType, "5"),
          inDef("recall_floor", org.apache.spark.sql.types.DoubleType,
            "0.0")),
        out("rows_indexed" -> LongType, "entries_before" -> LongType,
          "entries_after" -> LongType, "truth_pairs" -> LongType,
          "recall" -> org.apache.spark.sql.types.DoubleType,
          "action" -> StringType, "version" -> LongType)) { row =>
        val (rows, before, after, nTrue, recall, action) =
          graft.ops.AnnIndex.rebuildIndex(store,
            row.getUTF8String(0).toString, row.getUTF8String(1).toString,
            row.getUTF8String(2).toString, row.getInt(3), row.getInt(4),
            row.getDouble(5))
        Seq(rows, before, after, nTrue, recall,
          UTF8String.fromString(action),
          store.currentVersion(row.getUTF8String(1).toString).toLong)
      })
      case "add_variant_shred" => Some(p(
        Seq(in("table", StringType), in("source_col", StringType),
          in("path", StringType), in("as_name", StringType),
          in("shred_type", StringType)),
        out("added" -> StringType)) { row =>
        val t = tbl(row)
        val dt = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseDataType(row.getUTF8String(4).toString)
        store.addVariantShred(t, row.getUTF8String(1).toString,
          row.getUTF8String(2).toString, row.getUTF8String(3).toString, dt)
        Seq(org.apache.spark.unsafe.types.UTF8String.fromString(
          row.getUTF8String(3).toString))
      })
      case "create_branch" => Some(p(
        Seq(in("table", StringType), in("branch", StringType),
          inDef("at_version", IntegerType, "-1")),
        out("version" -> LongType)) { row =>
        val t = tbl(row)
        store.createBranch(t, row.getUTF8String(1).toString, row.getInt(2))
        Seq(store.refVersion(t, row.getUTF8String(1).toString).toLong)
      })
      case "create_tag" => Some(p(
        Seq(in("table", StringType), in("tag", StringType),
          inDef("at_version", IntegerType, "-1")),
        out("version" -> LongType)) { row =>
        val t = tbl(row)
        store.createTag(t, row.getUTF8String(1).toString, row.getInt(2))
        Seq(store.refVersion(t, row.getUTF8String(1).toString).toLong)
      })
      case "drop_ref" => Some(p(
        Seq(in("table", StringType), in("ref", StringType)),
        out("dropped" -> StringType)) { row =>
        val r = row.getUTF8String(1).toString
        store.dropRef(tbl(row), r)
        Seq(UTF8String.fromString(r))
      })
      case "fast_forward" => Some(p(
        Seq(in("table", StringType), in("branch", StringType)),
        out("version" -> LongType)) { row =>
        val t = tbl(row)
        store.fastForward(t, row.getUTF8String(1).toString)
        Seq(store.currentVersion(t).toLong)
      })
      case "rollback_to_version" => Some(p(
        Seq(in("table", StringType), in("version", IntegerType)),
        out("restored" -> LongType, "version" -> LongType)) { row =>
        val t = tbl(row)
        store.rollback(t, row.getInt(1))
        Seq(row.getInt(1).toLong, store.currentVersion(t).toLong)
      })
      case "add_files" => Some(p(
        Seq(in("table", StringType), in("source_dir", StringType),
          // Iceberg's partition_filter: 'col=value,col2=value2' adopts
          // only matching hive directories
          inDef("partition_filter", StringType, "''")),
        out("added_files" -> LongType, "version" -> LongType)) { row =>
        val t = tbl(row)
        val pf = row.getUTF8String(2).toString.split(',')
          .map(_.trim).filter(_.nonEmpty).map { kv =>
            kv.split("=", 2) match {
              case Array(k, v) => k.trim -> v.trim
              case _ => throw new IllegalArgumentException(
                s"partition_filter entry '$kv' is not col=value")
            }
          }.toMap
        val added = store.addFiles(t, row.getUTF8String(1).toString, pf)
        Seq(added.size.toLong, store.currentVersion(t).toLong)
      })
      case "migrate" => Some(p(
        Seq(in("table", StringType), in("source_dir", StringType),
          inDef("zone_cols", StringType, "''")),
        out("added_files" -> LongType, "version" -> LongType)) { row =>
        val t = tbl(row)
        val zc = row.getUTF8String(2).toString.split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq
        store.migrate(t, row.getUTF8String(1).toString, zoneCols = zc)
        Seq(store.currentRelPaths(t).size.toLong,
          store.currentVersion(t).toLong)
      })
      case "snapshot" => Some(p(
        // zero-copy clone of source's CURRENT snapshot as an
        // independent table (Iceberg's snapshot procedure): metadata +
        // copied stat sidecars only, no data scan, no byte copied
        Seq(in("source", StringType), in("dest", StringType)),
        out("referenced_files" -> LongType, "version" -> LongType)) { row =>
        val dst = row.getUTF8String(1).toString
        val refs = store.snapshotTable(row.getUTF8String(0).toString, dst)
        Seq(refs.size.toLong, store.currentVersion(dst).toLong)
      })
      case "analyze" => Some(p(
        Seq(in("table", StringType)),
        out("columns" -> StringType, "version" -> LongType)) { row =>
        val t = tbl(row)
        val est = store.analyzeTable(t)
        Seq(UTF8String.fromString(
          est.toSeq.sortBy(_._1).map { case (c, n) => s"$c=$n" }
            .mkString(",")),
          store.currentVersion(t).toLong)
      })
      case "create_view" => Some(p(
        Seq(in("view", StringType), in("sql", StringType),
          inDef("replace", StringType, "'false'")),
        out("view" -> StringType)) { row =>
        val v = tbl(row)
        store.createView(v, row.getUTF8String(1).toString,
          orReplace = row.getUTF8String(2).toString.trim
            .equalsIgnoreCase("true"))
        Seq(UTF8String.fromString(v))
      })
      case "create_mview" => Some(p(
        // incrementally-maintained materialized aggregate view: one
        // full aggregation now, change-feed deltas forever after
        // (CALL refresh_mview). aggs: comma list of sum:c | avg:c |
        // min:c | max:c (count is always present; sums carry non-null
        // counts). where: optional definition-time row filter (a SQL
        // boolean expression over the source's columns)
        Seq(in("mview", StringType), in("source", StringType),
          in("group_cols", StringType), inDef("aggs", StringType, "''"),
          inDef("where", StringType, "''")),
        out("groups" -> LongType)) { row =>
        Seq(graft.tables.MaterializedView.create(store,
          row.getUTF8String(0).toString, row.getUTF8String(1).toString,
          row.getUTF8String(2).toString.split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq,
          row.getUTF8String(3).toString.split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq,
          where = Option(row.getUTF8String(4).toString.trim)
            .filter(_.nonEmpty)))
      })
      case "refresh_mview" => Some(p(
        // fold the source's changes since the last applied version in
        // ONE atomic commit. COST-BASED: when metadata says the delta
        // would read more than the table (table-wide rewrite, scattered
        // tombstones), it recomputes instead (mode "full-auto"); auto
        // => 'false' forces the delta plan. full => rebuild (also the
        // source rollback/recreate recovery)
        Seq(in("mview", StringType),
          inDef("full", StringType, "'false'"),
          inDef("auto", StringType, "'true'")),
        out("groups_changed" -> LongType, "from_version" -> LongType,
          "to_version" -> LongType, "mode" -> StringType)) { row =>
        val (n, from, to, mode) = graft.tables.MaterializedView.refresh(
          store, row.getUTF8String(0).toString,
          full = row.getUTF8String(1).toString.trim
            .equalsIgnoreCase("true"),
          auto = !row.getUTF8String(2).toString.trim
            .equalsIgnoreCase("false"))
        Seq(n, from.toLong, to.toLong, UTF8String.fromString(mode))
      })
      case "drop_view" => Some(p(
        Seq(in("view", StringType)),
        out("dropped" -> StringType)) { row =>
        val v = tbl(row)
        Seq(UTF8String.fromString(store.dropView(v).toString))
      })
      case _ => None
    }
  }
}

/** One procedure: unbound == bound (fixed parameter list; Spark aligns
  * named/positional arguments and fills declared defaults before
  * [[call]]). The result is a single row through a [[LocalScan]]. */
private[tables] final class GraftProcedure(procName: String,
    params: Seq[ProcedureParameter], result: StructType,
    run: InternalRow => Seq[Any])
  extends UnboundProcedure with BoundProcedure {

  override def name(): String = procName

  override def description(): String = s"graft maintenance procedure $procName"

  override def bind(inputType: StructType): BoundProcedure = this

  override def parameters(): Array[ProcedureParameter] = params.toArray

  override def isDeterministic: Boolean = false // mutates table state

  override def call(input: InternalRow): JIterator[Scan] = {
    val values = run(input)
    val row = InternalRow.fromSeq(values)
    Collections.singletonList[Scan](new LocalScan {
      override def rows(): Array[InternalRow] = Array(row)
      override def readSchema(): StructType = result
      override def description(): String = s"graft $procName result"
    }).iterator()
  }
}
