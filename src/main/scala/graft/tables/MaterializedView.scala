package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained MATERIALIZED AGGREGATE VIEWS over managed
  * tables — the scale-correct alternative to re-running a group-by over
  * 100 TB because one CDC batch landed.
  *
  * An MV is an ordinary managed table (queryable, snapshotted, oracled
  * like any other) holding `GROUP BY groupCols` aggregates of a source
  * table, plus table properties recording the definition and a commit
  * META tag recording the source snapshot version the contents reflect.
  * `refresh` reads the source's CHANGE FEED since that version — cost
  * proportional to what CHANGED, never to the source —, folds signed
  * per-group deltas, and applies them as ONE atomic commit on the MV
  * (`applyNet`: touched groups replaced, dead groups deleted). The
  * applied-version rides in the SAME commit's metadata, so a crash
  * between commit and bookkeeping cannot double-apply a delta — the
  * replay guard the streaming sink already uses (`lastMetaValue`).
  *
  * Aggregate algebra (the classic IVM rules):
  *  - `cnt` (always present) and each `sum:c` fold additively from the
  *    feed's signed rows; every sum carries its non-null count
  *    (`cnt_c`) so a group whose remaining `c` values are all NULL
  *    reports SQL-correct NULL, not 0.
  *  - `min:c` / `max:c` fold monotonically under INSERTS
  *    (`least`/`greatest`); a group that saw a DELETE is "dirty" and
  *    recomputes from the PINNED source snapshot, scoped to exactly
  *    the dirty groups — a small dirty set on one group column becomes
  *    an IN filter that file-prunes through the zone-indexed scan,
  *    bigger sets a broadcast semi-join.
  *
  * NULL group keys refuse loudly at create and refresh: the atomic
  * apply keys groups by equality, which cannot address a null tuple —
  * and silently folding nulls into one group would diverge from the
  * source's own GROUP BY semantics under per-engine null ordering. */
object MaterializedView {

  /** Commit-meta key on the MV: the source version its contents
    * reflect (crash-safe — same commit as the data). */
  val AppliedVersionMeta = "mv.applied-version"

  private[tables] val SourceProp = "mv.source"
  private[tables] val SourceUuidProp = "mv.source-uuid"
  private[tables] val GroupColsProp = "mv.group-cols"
  private[tables] val AggsProp = "mv.aggs"
  private[tables] val FilterProp = "mv.filter"

  private[tables] sealed trait Agg { def col: String }
  private[tables] case class SumA(col: String) extends Agg
  private[tables] case class MinA(col: String) extends Agg
  private[tables] case class MaxA(col: String) extends Agg

  /** `avg:c` stores EXACTLY the state `sum:c` stores (the sum and its
    * non-null count — avg is derived at read/rewrite time, the classic
    * IVM decomposition), so both parse to [[SumA]]; duplicate stored
    * columns (e.g. `sum:c,avg:c`) collapse. Unknown specs refuse
    * loudly — a silently-dropped aggregate would make the view lie. */
  private[tables] def parseAggs(specs: Seq[String]): Seq[Agg] =
    specs.filterNot(_ == "count").map { s =>
      s.split(":", 2) match {
        case Array("sum", c) => SumA(c)
        case Array("avg", c) => SumA(c)
        case Array("min", c) => MinA(c)
        case Array("max", c) => MaxA(c)
        case _ => throw new IllegalArgumentException(
          s"unknown aggregate spec '$s' " +
            "(count | sum:col | avg:col | min:col | max:col)")
      }
    }.distinct

  /** An explicitly EMPTY frame with `source`'s schema — what "the
    * source at version 0" means. Reading the live table instead would
    * race a concurrent first commit into the contents while the
    * applied-version tag still says 0, double-counting on the first
    * refresh. */
  private def emptyAt(store: TableStore, source: String): DataFrame = {
    val s = store.sparkSession
    s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      store.schema(source))
  }

  /** The full aggregation — used for the initial build, dirty-group
    * repair, and full refresh. `cnt` leads; every sum carries `cnt_c`. */
  private def aggFrame(src: DataFrame, groupCols: Seq[String],
      aggs: Seq[Agg]): DataFrame = {
    val exprs: Seq[Column] = count(lit(1)).as("cnt") +: aggs.flatMap {
      case SumA(c) => Seq(sum(col(s"`$c`")).as(s"sum_$c"),
        count(col(s"`$c`")).as(s"cnt_$c"))
      case MinA(c) => Seq(min(col(s"`$c`")).as(s"min_$c"))
      case MaxA(c) => Seq(max(col(s"`$c`")).as(s"max_$c"))
    }
    src.groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(exprs.head, exprs.tail: _*)
  }

  private def requireNoNullGroups(grouped: DataFrame,
      groupCols: Seq[String], what: String): Unit = {
    val anyNull = groupCols.map(c => col(s"`$c`").isNull).reduce(_ || _)
    require(grouped.filter(anyNull).head(1).isEmpty,
      s"$what contains NULL group-key values — a materialized view's " +
        "atomic apply keys groups by equality, which cannot address a " +
        "null tuple; filter or coalesce the source (refresh(full = " +
        "true) skips a poisoned feed interval once the source is fixed)")
  }

  /** Create `mv` as the materialized `GROUP BY groupCols` of `source`
    * (optionally `WHERE where` — a definition-time row filter applied
    * before aggregation, on the build, every delta fold, and every
    * repair/recompute) with aggregates `aggSpecs` (`count` implicit;
    * `sum:c` | `avg:c` | `min:c` | `max:c`). One full aggregation job;
    * returns the group count. */
  def create(store: TableStore, mv: String, source: String,
      groupCols: Seq[String], aggSpecs: Seq[String],
      where: Option[String] = None): Long = {
    require(groupCols.nonEmpty, "materialized view needs group columns")
    val aggs = parseAggs(aggSpecs)
    val sch = store.schema(source)
    (groupCols ++ aggs.map(_.col)).foreach(c =>
      require(sch.fieldNames.contains(c),
        s"column $c not in source table $source"))
    require(where.forall(_.trim.nonEmpty),
      "empty WHERE — omit the argument for an unfiltered view")
    // pin the snapshot: the build must aggregate EXACTLY the version
    // the applied-version tag records — reading "current" would let a
    // concurrent source commit land in the contents yet be re-folded
    // by the first refresh. Version 0 is an EXPLICITLY empty frame for
    // the same reason: a first commit racing the build must stay in
    // the first refresh's interval, not leak into the contents.
    val srcV = store.currentVersion(source)
    val base = applyFilter(
      if (srcV <= 0) emptyAt(store, source)
      else store.readVersion(source, srcV), where)
    val full = aggFrame(base, groupCols, aggs)
      .persist() // null-check + write: ONE aggregation
    try {
      requireNoNullGroups(full, groupCols, s"source table $source")
      store.create(mv, full.schema)
      store.setProperties(mv, Map(
        SourceProp -> Some(source),
        SourceUuidProp -> Some(store.tableUuid(source)),
        GroupColsProp -> Some(groupCols.mkString(",")),
        AggsProp -> Some(aggSpecs.mkString(",")),
        FilterProp -> where))
      store.append(mv, full,
        meta = Map(AppliedVersionMeta -> srcV.toString))
    } finally { full.unpersist(); () }
    // registry marker LAST — the rewrite rule may only discover a view
    // whose definition and contents are fully published
    store.mvMarkerWrite(source, mv)
    store.read(mv).count()
  }

  /** The definition-time row filter; parsed (and thus validated) by
    * Dataset analysis eagerly at each application site. */
  private def applyFilter(df: DataFrame, where: Option[String]): DataFrame =
    where.fold(df)(f => df.filter(expr(f)))

  /** Resolved definition for the transparent query rewrite
    * ([[MvRewriteRule]]): group columns plus which source columns have
    * stored sum(+count) / min / max state, and the view's schema for
    * exact result-type checks. */
  private[tables] final case class MvDef(mv: String, groupCols: Seq[String],
      sumCols: Set[String], minCols: Set[String], maxCols: Set[String],
      schema: org.apache.spark.sql.types.StructType)

  /** Marker-walk scaffold shared by the rewrite rule and the streaming
    * folds: every registered view of `source` that exists, points back
    * at `source`, and is bound to its CURRENT incarnation — with its
    * verified property bag. One directory listing to find candidates;
    * a marker whose view is gone self-heals away. */
  private def candidatesOf(store: TableStore,
      source: String): Seq[(String, Map[String, String])] =
    store.mvMarkersOf(source).flatMap { mv =>
      if (!store.exists(mv)) { store.mvMarkerDelete(source, mv); None }
      else scala.util.Try {
        val props = store.properties(mv)
        if (props.get(SourceProp).contains(source) &&
          props.get(SourceUuidProp).contains(store.tableUuid(source)))
          Some(mv -> props)
        else None
      }.toOption.flatten
    }

  /** The first registered view of `source` whose contents are FRESH at
    * exactly `atVersion` (the applied-version commit tag) and
    * unfiltered — the only state in which scanning the view is provably
    * equivalent to aggregating the source snapshot the plan was built
    * against. */
  private[tables] def freshViewFor(store: TableStore, source: String,
      atVersion: Int): Option[MvDef] =
    candidatesOf(store, source).iterator.flatMap { case (mv, props) =>
      scala.util.Try {
        val ok = !props.get(FilterProp).exists(_.trim.nonEmpty) &&
          store.lastMetaValue(mv, AppliedVersionMeta)
            .flatMap(_.toIntOption).contains(atVersion)
        if (!ok) None
        else {
          val aggs = parseAggs(
            props(AggsProp).split(",").toSeq.filter(_.nonEmpty))
          Some(MvDef(mv, props(GroupColsProp).split(",").toSeq,
            aggs.collect { case SumA(c) => c }.toSet,
            aggs.collect { case MinA(c) => c }.toSet,
            aggs.collect { case MaxA(c) => c }.toSet,
            store.schema(mv)))
        }
      }.toOption.flatten
    }.nextOption()

  /** Fold `source`'s pending changes into EVERY registered view of it —
    * the per-batch maintenance step of a streaming sink
    * ([[graft.streaming.GraftTableSink]] with `maintainViews`): run
    * inside the sink's transaction, the source append and all view
    * folds publish as ONE atomic multi-table commit, and the
    * applied-version interval algebra makes a crash-window replay fold
    * nothing twice. Marker-driven discovery (one listing); views whose
    * marker is stale (dropped, re-pointed) are skipped via the same
    * verification [[freshViewFor]] uses. Returns the refreshed names. */
  def refreshAllFor(store: TableStore, source: String): Seq[String] =
    candidatesOf(store, source).map { case (mv, _) =>
      refresh(store, mv)
      mv
    }

  /** Fold the source's changes since the last applied version into the
    * MV — one atomic commit, cost proportional to the CHANGED groups.
    * `full = true` recomputes everything (the recovery path after a
    * source rollback or re-creation). Returns
    * (groups changed, from version, to version, mode). */
  def refresh(store: TableStore, mv: String,
      full: Boolean = false,
      auto: Boolean = true): (Long, Int, Int, String) = {
    val props = store.properties(mv)
    val source = props.getOrElse(SourceProp, sys.error(
      s"$mv is not a materialized view (no $SourceProp property)"))
    val groupCols = props(GroupColsProp).split(",").toSeq
    val aggs = parseAggs(props(AggsProp).split(",").toSeq
      .filter(_.nonEmpty))
    // a missing applied-version tag NEVER defaults: create always
    // stamps it and expiry carries tags forward, so absence means the
    // MV's contents have unknown provenance (e.g. a snapshot clone —
    // table PROPERTIES carry but commit META does not) and folding a
    // guessed interval would silently double every count and sum
    val fromOpt = store.lastMetaValue(mv, AppliedVersionMeta)
      .flatMap(_.toIntOption)
    if (fromOpt.isEmpty && !full) sys.error(
      s"$mv carries no $AppliedVersionMeta commit tag (a snapshot " +
        "clone of a view?) — refresh(full = true) re-baselines it")
    val from = fromOpt.getOrElse(-1)
    val to = store.currentVersion(source)
    val where = props.get(FilterProp).filter(_.trim.nonEmpty)
    // every source read below is PINNED to `to`: the applied-version
    // tag must describe exactly what was folded, and a concurrent
    // source commit landing mid-refresh must stay in the NEXT interval
    // (version 0 = explicitly empty, never the live table). The
    // definition filter applies HERE, so repair and recompute see
    // exactly the rows the delta folds see.
    def sourceAt: org.apache.spark.sql.DataFrame = applyFilter(
      if (to <= 0) emptyAt(store, source) else store.readVersion(source, to),
      where)
    val sameIncarnation =
      props.get(SourceUuidProp).contains(store.tableUuid(source))
    if (!full && (!sameIncarnation || to < from)) sys.error(
      if (!sameIncarnation)
        s"source $source was re-created since $mv was built — " +
          "refresh(full = true) rebuilds against the new incarnation"
      else
        s"source $source rolled back ($to) behind $mv's applied " +
          s"version ($from) — refresh(full = true) rebuilds")
    if (to == from && !full) return (0L, from, to, "none")

    // COST-BASED plan choice (`auto`): the delta path's dominant cost
    // is the feed's change scope (the bytes the net-change reads);
    // recompute reads the source once. When metadata says the feed
    // alone would read MORE than the table — a table-wide CoW rewrite,
    // a scattered tombstone masking most files, a compaction whose
    // exceptAll nets to zero but reads everything — fold-by-delta is
    // the strictly worse plan and the refresh recomputes instead
    // (measured: a scattered 500-key tombstone
    // on 60M rows folded 74 s by delta vs 4.2 s by recompute,
    // MvScaleCheck). Min/max
    // repair is NOT charged here: when it fires it costs at most what
    // recompute costs, the feed was already cheap by this test, and
    // the repair scan file-prunes on clustered sources (below) — so a
    // small clustered delete keeps the genuinely group-scoped path.
    // The estimate is conservative; pruning can only make the delta
    // cheaper than quoted, never the fallback wrong.
    val hasMinMax = aggs.exists {
      case _: MinA | _: MaxA => true; case _ => false }
    val fullMode: Option[String] =
      if (full) Some("full")
      else if (!auto) None
      else {
        val (scope, total, _) = store.changeScopeBytes(source, from, to)
        if (total > 0L && scope > total) Some("full-auto") else None
      }
    fullMode match {
      case Some(mode) =>
        // full rebuild: every current group re-aggregates; groups that
        // vanished since the last apply are deleted (old ∪ new keys).
        // Persisted: the null check, the key union, and the apply must
        // share ONE source aggregation, not re-run it per action.
        val fresh = aggFrame(sourceAt, groupCols, aggs).persist()
        try {
          requireNoNullGroups(fresh, groupCols, s"source table $source")
          val touchedKeys = store.read(mv)
            .select(groupCols.map(c => col(s"`$c`")): _*)
            .union(fresh.select(groupCols.map(c => col(s"`$c`")): _*))
            .distinct().persist()
          try {
            val n = touchedKeys.count()
            store.applyNet(mv, touchedKeys, fresh, groupCols,
              meta = Map(AppliedVersionMeta -> to.toString))
            if (!sameIncarnation) store.setProperties(mv,
              Map(SourceUuidProp -> Some(store.tableUuid(source))))
            return (n, from, to, mode)
          } finally { touchedKeys.unpersist(); () }
        } finally { fresh.unpersist(); () }
      case None => ()
    }

    // the definition filter drops non-qualifying CHANGES symmetrically:
    // an insert outside the filter never entered the view, so its
    // delete must not leave it either — filtering the signed feed IS
    // the filtered-view IVM rule
    val feed = applyFilter(store.changeFeed(source, from, to), where)
    val ins = col(TableStore.ChangeTypeCol) === "insert"
    val sgn = when(ins, 1L).otherwise(-1L)
    val dExprs: Seq[Column] = Seq(
      sum(sgn).as("_d_cnt"),
      max(when(ins, 0).otherwise(1)).as("_d_dirty")) ++
      aggs.flatMap {
        case SumA(c) => Seq(
          sum(when(col(s"`$c`").isNotNull, sgn * col(s"`$c`"))).as(s"_d_sum_$c"),
          sum(when(col(s"`$c`").isNotNull, sgn).otherwise(0L)).as(s"_d_cnt_$c"))
        case MinA(c) => Seq(min(when(ins, col(s"`$c`"))).as(s"_d_min_$c"))
        case MaxA(c) => Seq(max(when(ins, col(s"`$c`"))).as(s"_d_max_$c"))
      }
    val delta = feed.groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(dExprs.head, dExprs.tail: _*).persist()
    try {
      requireNoNullGroups(delta, groupCols,
        s"change feed of $source ($from, $to]")
      val changed = delta.count()
      // an empty interval (metadata-only commits) applies nothing and
      // stamps nothing: re-walking it next refresh costs one metadata
      // pass, while an empty commit would grow MV history for no data
      if (changed == 0) return (0L, from, to, "none")
      locally {
        val mvSch = store.schema(mv)
        def zero(c: String) = lit(0).cast(mvSch(mvSch.fieldIndex(c)).dataType)
        val old = store.read(mv)
        val joined = delta.join(old, groupCols, "left")
        val dirty = hasMinMax && { // deletes break min/max monotonicity
          delta.filter(col("_d_dirty") === 1).head(1).nonEmpty
        }
        val dirtyKeys: Option[DataFrame] =
          if (!dirty) None
          else Some(delta.filter(col("_d_dirty") === 1)
            .select(groupCols.map(c => col(s"`$c`")): _*).persist())
        // clean-path merge (for min/max MVs: only groups with no delete)
        val cleanBase =
          if (!dirty) joined
          else joined.filter(col("_d_dirty") === 0)
        val mergedCols: Seq[Column] =
          groupCols.map(c => col(s"`$c`")) ++
            Seq((coalesce(col("cnt"), lit(0L)) + col("_d_cnt")).as("cnt")) ++
            aggs.flatMap {
              case SumA(c) =>
                val nn = (coalesce(col(s"`cnt_$c`"), lit(0L)) +
                  col(s"`_d_cnt_$c`")).as(s"cnt_$c")
                val s = when(coalesce(col(s"`cnt_$c`"), lit(0L)) +
                    col(s"`_d_cnt_$c`") === 0L, lit(null))
                  .otherwise(coalesce(col(s"`sum_$c`"), zero(s"sum_$c")) +
                    coalesce(col(s"`_d_sum_$c`"), zero(s"sum_$c")))
                  .cast(mvSch(mvSch.fieldIndex(s"sum_$c")).dataType)
                  .as(s"sum_$c")
                Seq(s, nn)
              case MinA(c) =>
                Seq(least(col(s"`min_$c`"), col(s"`_d_min_$c`"))
                  .as(s"min_$c"))
              case MaxA(c) =>
                Seq(greatest(col(s"`max_$c`"), col(s"`_d_max_$c`"))
                  .as(s"max_$c"))
            }
        val cleanMerged = cleanBase.select(mergedCols: _*)
          .filter(col("cnt") > 0L)
        try {
          val newRows = dirtyKeys match {
            case None => cleanMerged
            case Some(dk) =>
              // group-scoped repair: re-aggregate exactly the dirty
              // groups from the PINNED source snapshot. A small dirty
              // set on a single group column becomes an IN filter —
              // which reaches the zone-indexed scan and file-prunes on
              // sources laid out by the group column — the genuinely
              // group-scoped path; bigger sets fall back to a
              // broadcast semi-join (exact, but scans candidates).
              val dirtySrc =
                if (groupCols.size == 1 && dk.count() <= 512L) {
                  val vals = dk.collect().map(_.get(0))
                  sourceAt.filter(
                    col(s"`${groupCols.head}`").isin(vals: _*))
                } else sourceAt.join(broadcast(dk), groupCols, "left_semi")
              cleanMerged.unionByName(aggFrame(dirtySrc, groupCols, aggs))
          }
          val touchedKeys = delta.select(groupCols.map(c => col(s"`$c`")): _*)
          store.applyNet(mv, touchedKeys, newRows, groupCols,
            meta = Map(AppliedVersionMeta -> to.toString))
        } finally { dirtyKeys.foreach(dk => { dk.unpersist(); () }) }
      }
      (changed, from, to, "incremental")
    } finally { delta.unpersist(); () }
  }
}
