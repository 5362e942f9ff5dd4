package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._
import graft.tables.TableStore

class TableStoreSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() = new TableStore(spark, tmpDir("tablestore-"))

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("readAppendedSince returns only post-snapshot appends; diffVersions classifies changes") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val v1 = st.currentVersion("t")
    st.append("t", Seq((3L, "c")).toDF("id", "v"))
    st.append("t", Seq((4L, "d")).toDF("id", "v"))
    // incremental consumer: sees exactly the two appended batches
    val inc = st.readAppendedSince("t", v1).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(inc.toSeq === Seq((3L, "c"), (4L, "d")))
    // nothing appended since the current snapshot
    assert(st.readAppendedSince("t", st.currentVersion("t")).count() === 0)
    // key-level diff across a mutation: delete 1, upsert-change 2, add 5
    st.delete("t", col("id") === 1L)
    st.upsert("t", Seq((2L, "B"), (5L, "e")).toDF("id", "v"), Seq("id"))
    val diff = st.diffVersions("t", v1, st.currentVersion("t"),
      Seq("id"), compareCols = Seq("v"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(diff.toSeq === Seq(
      (1L, "removed"), (2L, "changed"), (3L, "added"), (4L, "added"), (5L, "added")))
    // presence-only diff ignores value changes
    val presence = st.diffVersions("t", v1, st.currentVersion("t"), Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(presence.toSeq === Seq(
      (1L, "removed"), (3L, "added"), (4L, "added"), (5L, "added")))
  }

  test("renameColumn is metadata-only: no file rewrite, all snapshots readable") {
    val st = newStore()
    st.create("t", schema, zoneCols = Seq("id"))
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val v1 = st.currentVersion("t")
    val filesBefore = st.currentRelPaths("t")
    st.renameColumn("t", "v", "label")
    // metadata-only: identical data files, same manifest content
    assert(st.currentRelPaths("t") === filesBefore)
    assert(st.schema("t").fieldNames.toSeq === Seq("id", "label"))
    val rows = st.read("t").orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("label")))
    assert(rows.toSeq === Seq((1L, "a"), (2L, "b")))
    // pre-rename snapshots read under the live (renamed) schema
    assert(st.readVersion("t", v1).columns.toSeq === Seq("id", "label"))
    // writers use the new logical name; files stay physically consistent
    st.append("t", Seq((3L, "c")).toDF("id", "label"))
    st.upsert("t", Seq((1L, "A")).toDF("id", "label"), Seq("id"))
    val all = st.read("t").orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("label")))
    assert(all.toSeq === Seq((1L, "A"), (2L, "b"), (3L, "c")))
    // zone pruning still works after renaming the ZONE column itself
    st.renameColumn("t", "id", "key")
    val probe = Seq(Tuple1(3L)).toDF("key")
    assert(st.candidateFilesForKeys("t", probe, Seq("key")).nonEmpty)
    assert(st.readRange("t", "key", 3L, 3L).count() === 1)
    // conflicts fail loudly
    intercept[IllegalArgumentException] { st.renameColumn("t", "key", "label") }
    intercept[IllegalArgumentException] { st.renameColumn("t", "gone", "x") }
  }

  test("dropColumn + re-add: old bytes stay dead, new column backfills null") {
    val st = newStore()
    st.create("t", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("score", DoubleType))))
    st.append("t", Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "v", "score"))
    st.dropColumn("t", "score")
    assert(st.schema("t").fieldNames.toSeq === Seq("id", "v"))
    assert(st.read("t").columns.toSeq === Seq("id", "v"))
    // re-add the same logical name: fresh field id → fresh physical name,
    // so the dropped values do NOT resurrect
    st.addColumns("t", StructType(Seq(StructField("score", DoubleType))))
    val rows = st.read("t").orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.isNullAt(2)))
    assert(rows.toSeq === Seq((1L, true), (2L, true)))
    // new writes carry the new column; old-shape producers may omit it
    st.append("t", Seq((3L, "c", 30.0)).toDF("id", "v", "score"))
    st.append("t", Seq((4L, "d")).toDF("id", "v"))
    val scores = st.read("t").orderBy("id").collect()
      .map(r => if (r.isNullAt(2)) null else r.getAs[Double]("score"))
    assert(scores.toSeq === Seq(null, null, 30.0, null))
  }

  test("dropColumn guards: partition/zone/last-column are not droppable") {
    val st = newStore()
    st.create("t", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      zoneCols = Seq("id"))
    intercept[IllegalArgumentException] { st.dropColumn("t", "id") } // zone
    st.dropColumn("t", "v")
    intercept[IllegalArgumentException] { st.dropColumn("t", "id") } // last
    val st2 = newStore()
    st2.create("p", StructType(Seq(
      StructField("k", StringType), StructField("v", StringType))),
      partitionBy = Seq("k"))
    intercept[IllegalArgumentException] { st2.dropColumn("p", "k") }
  }

  test("rename of an evolution-added column keeps it omittable") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    st.addColumns("t", StructType(Seq(StructField("extra", StringType))))
    st.renameColumn("t", "extra", "note")
    // producers not yet upgraded may still omit the (renamed) evolved col
    st.append("t", Seq((2L, "b")).toDF("id", "v"))
    st.append("t", Seq((3L, "c", "hello")).toDF("id", "v", "note"))
    val notes = st.read("t").orderBy("id").collect()
      .map(r => if (r.isNullAt(2)) null else r.getAs[String]("note"))
    assert(notes.toSeq === Seq(null, null, "hello"))
  }

  test("crashed-commit debris above the head is never delivered, and aged debris is reclaimed") {
    val root = tmpDir("tablestore-crash-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    val v = st.currentVersion("t")
    // simulate a writer that died AFTER writing manifest+sidecar but
    // BEFORE the pointer swap: files numbered above the committed head
    val phantom = st.currentRelPaths("t").mkString("\n")
    val pManifest = java.nio.file.Paths.get(s"$root/t/manifest-000099.txt")
    java.nio.file.Files.writeString(pManifest, phantom)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/t/manifest-000099.appended"), phantom)
    // a FRESH phantom is kept (it could belong to a racing writer about
    // to swap, on a store where the lock is not atomic)...
    st.append("t", Seq((2L, "b")).toDF("id", "v"))
    assert(java.nio.file.Files.exists(pManifest))
    // ...but the parent-chain walk keeps it out of incremental reads:
    // exactly the real append is delivered, no phantom rows
    val inc = st.readAppendedSince("t", v).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(inc.toSeq === Seq((2L, "b")))
    // a phantom still above the head and AGED past the stale-lock fence
    // (no live writer could still be about to swap to it) IS reclaimed
    // by the next commit
    val pOld = java.nio.file.Paths.get(s"$root/t/manifest-000150.txt")
    java.nio.file.Files.writeString(pOld, phantom)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.setTimes(new org.apache.hadoop.fs.Path(pOld.toString),
      System.currentTimeMillis() - TableStore.StaleLockMs - 60000, -1)
    st.append("t", Seq((3L, "c")).toDF("id", "v"))
    assert(!java.nio.file.Files.exists(pOld))
    val inc2 = st.readAppendedSince("t", v).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(inc2.toSeq === Seq((2L, "b"), (3L, "c")))
  }

  test("addColumns never generates a physical name colliding with a live column") {
    val st = newStore()
    st.create("t", StructType(Seq(
      StructField("id", LongType), StructField("a", StringType),
      StructField("a__4", StringType))))
    st.append("t", Seq((1L, "x", "y")).toDF("id", "a", "a__4"))
    st.renameColumn("t", "id", "key") // materializes the field catalog
    st.dropColumn("t", "a") // physical 'a' now reserved
    // re-add 'a': candidate 'a' reserved, candidate 'a__4' is a LIVE
    // physical name — the generator must skip to a fresh one
    st.addColumns("t", StructType(Seq(StructField("a", StringType))))
    st.append("t", Seq((2L, "y2", "new-a")).toDF("key", "a__4", "a"))
    val got = st.read("t").orderBy("key").collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("a__4"),
        Option(r.getAs[String]("a")).orNull))
    assert(got.toSeq === Seq((1L, "y", null), (2L, "y2", "new-a")))
  }

  test("readAppendedSince × compaction: compacted rows are never re-delivered") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val v1 = st.currentVersion("t")
    st.append("t", Seq((3L, "c")).toDF("id", "v"))
    // compaction rewrites every file but appends no logical rows — the
    // naive file-set diff would re-deliver rows 1 and 2 here
    st.compact("t", 1)
    val afterCompact = st.currentVersion("t")
    st.append("t", Seq((4L, "d")).toDF("id", "v"))
    val inc = st.readAppendedSince("t", v1).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(inc.toSeq === Seq((3L, "c"), (4L, "d"))) // exactly once, no 1/2
    // from the compacted snapshot: only the later append
    val inc2 = st.readAppendedSince("t", afterCompact).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(inc2.toSeq === Seq((4L, "d")))
    // a compact-only window appends nothing
    assert(st.readAppendedSince("t", st.currentVersion("t")).count() === 0)
    // upserts surface as appends; delete rewrites do not
    st.upsert("t", Seq((2L, "B2")).toDF("id", "v"), Seq("id"))
    st.delete("t", col("id") === 1L)
    val inc3 = st.readAppendedSince("t", afterCompact).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(inc3.toSeq === Seq((2L, "B2"), (4L, "d")))
    // expiring history out from under an unconsumed incremental read is loud
    st.compact("t", 1)
    st.expireSnapshots("t", keepLast = 1)
    intercept[IllegalArgumentException] { st.readAppendedSince("t", afterCompact) }
  }

  test("create + append + read round-trip") {
    val st = newStore()
    st.create("t", schema)
    assert(st.read("t").count() === 0)
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    st.append("t", Seq((3L, "c")).toDF("id", "v"))
    val got = st.read("t").orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("addColumns: old files backfill null, old-shape producers keep writing") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    st.addColumns("t", StructType(Seq(StructField("score", DoubleType))))
    // pre-evolution file reads back with a null score
    val r1 = st.read("t").orderBy("id").collect()
    assert(r1.map(r => (r.getLong(0), r.isNullAt(2))).toSeq === Seq((1L, true)))
    // new-shape append carries the column; old-shape append still works
    st.append("t", Seq((2L, "b", 0.5)).toDF("id", "v", "score"))
    st.append("t", Seq((3L, "c")).toDF("id", "v"))
    val got = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq === Seq((1L, None), (2L, Some(0.5)), (3L, None)))
    // mutations across the evolution boundary stay file-pruned and correct
    st.delete("t", col("id") === 1L)
    assert(st.read("t").count() === 2)
    // duplicate (incl. case-variant), and non-nullable additions rejected
    intercept[IllegalArgumentException] {
      st.addColumns("t", StructType(Seq(StructField("score", DoubleType))))
    }
    intercept[IllegalArgumentException] {
      st.addColumns("t", StructType(Seq(StructField("Score", DoubleType))))
    }
    intercept[IllegalArgumentException] {
      st.addColumns("t",
        StructType(Seq(StructField("strict", LongType, nullable = false))))
    }
    // a frame missing a CREATE-time column is an error, not a null commit:
    // only evolved columns may be omitted
    intercept[IllegalArgumentException] {
      st.append("t", Seq((9L, 0.1)).toDF("id", "score"))
    }
  }

  test("delete rewrites only affected files (copy-on-write file pruning)") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val filesAfterBatch1 = st.currentFiles("t").toSet
    st.append("t", Seq((10L, "x"), (11L, "y")).toDF("id", "v"))
    st.delete("t", col("id") === 10L)
    val filesAfterDelete = st.currentFiles("t").toSet
    // batch-1 files must be carried over untouched
    assert(filesAfterBatch1.subsetOf(filesAfterDelete))
    assert(st.read("t").orderBy("id").select("id").as[Long].collect().toSeq
      === Seq(1L, 2L, 11L))
  }

  test("delete with no matches leaves the snapshot unchanged") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    val before = st.currentFiles("t")
    st.delete("t", col("id") === 999L)
    assert(st.currentFiles("t") === before)
  }

  test("applyNet: one commit removes keys and adds rows atomically") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "old"), (2L, "keep")).toDF("id", "v"))
    val newRows = Seq((1L, "new"), (3L, "ins")).toDF("id", "v")
    st.applyNet("t", newRows, newRows, Seq("id"))
    val got = st.read("t").orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
  }

  test("upsert into empty table is an append") {
    val st = newStore()
    st.create("t", schema)
    st.upsert("t", Seq((5L, "e")).toDF("id", "v"), Seq("id"))
    assert(st.read("t").count() === 1)
  }

  test("schema is catalog-owned and fixed at create") {
    val st = newStore()
    st.create("t", schema)
    assert(st.schema("t") === schema)
    // rows are aligned (projected/cast) to the stored schema on applyNet
    val extra = Seq((7L, "g", true)).toDF("id", "v", "junk")
    st.applyNet("t", extra.select("id"), extra, Seq("id"))
    assert(st.read("t").schema.fieldNames.toSeq === Seq("id", "v"))
  }

  test("partitioned table: layout, round-trip, and partition pruning") {
    val st = newStore()
    val sch = StructType(Seq(
      StructField("id", LongType), StructField("cat", StringType),
      StructField("v", StringType)))
    st.create("t", sch, partitionBy = Seq("cat"))
    st.append("t", Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "a", "z"))
      .toDF("id", "cat", "v"))
    // hive-style layout on disk
    assert(st.currentRelPaths("t").forall(p => p.startsWith("cat=")))
    // full round-trip with partition column restored in schema order
    val got = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "a", "z")))
    // partition-key predicate prunes at plan time
    val plan = st.read("t").filter(col("cat") === "a")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cat"), plan)
    // mutations keep the partitioned layout
    st.delete("t", col("id") === 1L)
    assert(st.read("t").count() === 2)
    assert(st.currentRelPaths("t").forall(p => p.startsWith("cat=")))
    st.upsert("t", Seq((2L, "b", "y2")).toDF("id", "cat", "v"), Seq("id"))
    assert(st.read("t").filter(col("id") === 2L).collect()(0).getString(2) === "y2")
  }

  test("time travel: every snapshot remains readable") {
    val st = newStore()
    st.create("t", schema)
    val v0 = st.currentVersion("t")
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    val v1 = st.currentVersion("t")
    st.delete("t", col("id") === 1L)
    assert(st.read("t").count() === 0)
    assert(st.readVersion("t", v0).count() === 0)
    assert(st.readVersion("t", v1).count() === 1)
    intercept[IllegalArgumentException] { st.readVersion("t", 999) }
  }

  test("compaction merges fragmented files without changing contents") {
    val st = newStore()
    st.create("t", schema)
    (1 to 5).foreach(i => st.append("t", Seq((i.toLong, s"v$i")).toDF("id", "v")))
    assert(st.currentRelPaths("t").size >= 5)
    st.compact("t", numFiles = 1)
    assert(st.currentRelPaths("t").size === 1)
    assert(st.read("t").orderBy("id").select("id").as[Long].collect().toSeq
      === (1L to 5L))
  }

  test("z-order compaction prunes range scans on BOTH clustered columns") {
    val st = newStore()
    val sch2 = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType), StructField("v", StringType)))
    st.create("t", sch2, zoneCols = Seq("a", "b"))
    // a 64x64 grid: a and b are independent, so any one-dimensional
    // layout leaves the other column unprunable
    val grid = for { a <- 0L until 64L; b <- 0L until 64L }
      yield (a, b, s"$a-$b")
    st.append("t", grid.toDF("a", "b", "v"))
    val want = grid.filter { case (_, b, _) => b >= 8 && b <= 15 }.sorted

    // hash-compacted baseline: every file spans both full domains —
    // a b-range scan can prune nothing
    st.compact("t", numFiles = 16)
    val hashScanned = st.readRange("t", "b", 8L, 15L)
      .select(input_file_name()).distinct().count()
    assert(hashScanned === 16L)

    st.compact("t", numFiles = 16, clusterCols = Seq("a", "b"))
    assert(st.currentRelPaths("t").size === 16)
    // correctness first: the pruned scan loses and invents nothing
    val got = st.readRange("t", "b", 8L, 15L).orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === want)
    // pruning: files are ~16x16 z-blocks, the 8-wide b-slice touches one
    // block row (+ sampling slop) — far fewer than the hash baseline's 16
    val zScanned = st.readRange("t", "b", 8L, 15L)
      .select(input_file_name()).distinct().count()
    assert(zScanned <= 8L, s"expected <=8 files after z-order, got $zScanned")
    // and the OTHER column prunes too — the point of interleaving
    val aScanned = st.readRange("t", "a", 8L, 15L)
      .select(input_file_name()).distinct().count()
    assert(aScanned <= 8L, s"expected <=8 files on a-range, got $aScanned")
    // guards: string column and too-many columns are rejected loudly
    intercept[IllegalArgumentException] {
      st.compact("t", 4, clusterCols = Seq("a", "v"))
    }
    intercept[IllegalArgumentException] {
      st.compact("t", 4, clusterCols = Seq("a"))
    }
  }

  test("declarative read().filter prunes files at plan time via zone maps") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import graft.tables.ZoneMapFileIndex
    val st = newStore()
    st.create("t", schema, zoneCols = Seq("id"))
    // four disjoint key-range files (one append = one file here)
    (0 until 4).foreach { b =>
      val lo = b * 100L
      st.append("t",
        (lo until lo + 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    }
    def indexOf(df: org.apache.spark.sql.DataFrame): ZoneMapFileIndex =
      df.queryExecution.optimizedPlan.collect {
        case l: LogicalRelation =>
          l.relation.asInstanceOf[HadoopFsRelation]
            .location.asInstanceOf[ZoneMapFileIndex]
      }.head

    // BETWEEN inside one file's range: 3 of 4 files pruned before the scan
    val q = st.read("t").filter(col("id") >= 120L && col("id") <= 180L)
    val got = q.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === (120L to 180L).map(i => (i, s"v$i")))
    assert(indexOf(q).lastScanCounts === Some((4, 1)))

    // equality point lookup: one file
    val eq = st.read("t").filter(col("id") === 250L)
    assert(eq.collect().map(_.getLong(0)).toSeq === Seq(250L))
    assert(indexOf(eq).lastScanCounts === Some((4, 1)))

    // filter on a NON-zone column: no pruning, still correct
    val nz = st.read("t").filter(col("v") === "v42")
    assert(nz.collect().map(_.getLong(0)).toSeq === Seq(42L))
    assert(indexOf(nz).lastScanCounts === Some((4, 4)))

    // unsupported shape (OR) fails open: all files kept, rows exact
    val or = st.read("t").filter(col("id") === 10L || col("id") === 310L)
    assert(or.collect().map(_.getLong(0)).sorted.toSeq === Seq(10L, 310L))
    assert(indexOf(or).lastScanCounts === Some((4, 4)))

    // IN prunes by the value-list envelope: both values in file 2 of 4
    val in = st.read("t").filter(col("id").isin(250L, 280L))
    assert(in.collect().map(_.getLong(0)).sorted.toSeq === Seq(250L, 280L))
    assert(indexOf(in).lastScanCounts === Some((4, 1)))

    // a LONG in-list (beyond the optimizer's InSet threshold) still prunes
    val big = st.read("t").filter(col("id").isin(210L to 260L: _*))
    assert(big.count() === 51L)
    assert(indexOf(big).lastScanCounts === Some((4, 1)))

    // pruning composes through a rename (filters arrive physically keyed)
    st.renameColumn("t", "id", "key")
    val rn = st.read("t").filter(col("key") === 250L)
    assert(rn.collect().map(_.getLong(0)).toSeq === Seq(250L))
    assert(indexOf(rn).lastScanCounts === Some((4, 1)))

    // an all-null zone file has no usable stats and is never pruned away
    st.renameColumn("t", "key", "id")
    val v4files = st.currentVersion("t")
    st.append("t", Seq((null.asInstanceOf[java.lang.Long], "nullrow"))
      .toDF("id", "v").select(col("id").cast("long"), col("v")))
    val nn = st.read("t").filter(col("id").isNull)
    assert(nn.collect().map(_.getString(1)).toSeq === Seq("nullrow"))

    // time travel scans skip files too (per-snapshot consolidated stats)
    val tv = st.readVersion("t", v4files).filter(col("id") === 250L)
    assert(tv.collect().map(_.getLong(0)).toSeq === Seq(250L))
    assert(indexOf(tv).lastScanCounts === Some((4, 1)))
  }

  test("string zone column: startsWith prunes files by prefix interval") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import graft.tables.ZoneMapFileIndex
    val st = newStore()
    st.create("t", StructType(Seq(
      StructField("k", StringType), StructField("n", LongType))),
      zoneCols = Seq("k"))
    // three files in disjoint prefix ranges: a*, m*, x*
    for (p <- Seq("a", "m", "x"))
      st.append("t", (0 until 50).map(i => (f"$p$i%03d", i.toLong))
        .toDF("k", "n").coalesce(1))
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case l: LogicalRelation =>
          l.relation.asInstanceOf[HadoopFsRelation]
            .location.asInstanceOf[ZoneMapFileIndex]
      }.head.lastScanCounts
    val pre = st.read("t").filter(col("k").startsWith("m0"))
    assert(pre.count() === 50L)
    assert(counts(pre) === Some((3, 1)))
    // prefix straddling no file: zero survivors, zero rows
    val none = st.read("t").filter(col("k").startsWith("q"))
    assert(none.count() === 0L)
    assert(counts(none) === Some((3, 0)))
  }

  test("partitioned table composes directory pruning with zone-map skipping") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import graft.tables.ZoneMapFileIndex
    val st = newStore()
    st.create("t", StructType(Seq(
      StructField("id", LongType), StructField("bucket", LongType),
      StructField("v", StringType))),
      partitionBy = Seq("bucket"), zoneCols = Seq("id"))
    // 2 partitions × 2 disjoint id-range files each
    for (b <- Seq(0L, 1L); lo <- Seq(0L, 100L))
      st.append("t", (lo until lo + 100L).map(i => (i, b, s"v$b-$i"))
        .toDF("id", "bucket", "v").coalesce(1))
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case l: LogicalRelation =>
          l.relation.asInstanceOf[HadoopFsRelation]
            .location.asInstanceOf[ZoneMapFileIndex]
      }.head.lastScanCounts

    // partition filter alone: one directory (2 of 4 files)
    val p = st.read("t").filter(col("bucket") === 1L)
    assert(p.count() === 200L)
    assert(counts(p) === Some((4, 2)))
    // zone filter alone: one file per partition (2 of 4)
    val z = st.read("t").filter(col("id") >= 120L && col("id") <= 150L)
    assert(z.count() === 62L)
    assert(counts(z) === Some((4, 2)))
    // composed: exactly 1 of 4 files survives both prunings
    val both = st.read("t")
      .filter(col("bucket") === 1L && col("id") >= 120L && col("id") <= 150L)
    assert(both.count() === 31L)
    assert(counts(both) === Some((4, 1)))
    // a row with a NULL partition value stays readable and isNull-filterable
    st.append("t", Seq((999L, null.asInstanceOf[java.lang.Long], "nullpart"))
      .toDF("id", "bucket", "v").select(col("id"), col("bucket").cast("long"), col("v")))
    assert(st.read("t").filter(col("bucket").isNull)
      .collect().map(_.getString(2)).toSeq === Seq("nullpart"))
    assert(st.read("t").count() === 401L)
  }

  test("consolidated snapshot stats serve pruning without per-file sidecars") {
    import org.apache.hadoop.fs.{Path => HPath}
    val st = newStore()
    st.create("t", schema, zoneCols = Seq("id"))
    (0 until 4).foreach { b =>
      val lo = b * 100L
      st.append("t",
        (lo until lo + 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    }
    val fs = new HPath(st.root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def consPath = new HPath(st.root,
      f"t/manifest-${st.currentVersion("t")}%06d.stats.json")
    assert(fs.exists(consPath), "commit must write the consolidated stats")

    // delete EVERY per-file sidecar: pruning must run entirely off the
    // consolidated file (the 100 TB path — one FS read per planned scan)
    fs.delete(new HPath(st.root, "t/stats"), true)
    val keys = Seq(150L).toDF("id")
    assert(st.candidateFilesForKeys("t", keys, Seq("id")).size === 1)
    assert(st.readRange("t", "id", 120L, 180L).count() === 61L)

    // legacy fallback: no consolidated file → sidecars are the source
    val st2 = newStore()
    st2.create("t", schema, zoneCols = Seq("id"))
    (0 until 4).foreach { b =>
      val lo = b * 100L
      st2.append("t",
        (lo until lo + 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    }
    val fs2 = new HPath(st2.root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    (1 to st2.currentVersion("t")).foreach { v =>
      fs2.delete(new HPath(st2.root, f"t/manifest-$v%06d.stats.json"), false)
    }
    assert(st2.candidateFilesForKeys("t", keys, Seq("id")).size === 1)
    // the next commit re-consolidates: prior files' stats are swept back
    // in from the sidecars, and sidecars are again not needed
    st2.append("t",
      (400L until 500L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    fs2.delete(new HPath(st2.root, "t/stats"), true)
    assert(st2.candidateFilesForKeys("t", keys, Seq("id")).size === 1)
    assert(st2.candidateFilesForKeys("t", Seq(450L).toDF("id"), Seq("id")).size === 1)

    // a CORRUPT consolidated file fails open: no pruning, reads stay exact
    val consNow = new HPath(st2.root,
      f"t/manifest-${st2.currentVersion("t")}%06d.stats.json")
    val out = fs2.create(consNow, true)
    out.write("{not json".getBytes("UTF-8")); out.close()
    assert(st2.candidateFilesForKeys("t", keys, Seq("id")).size === 5)
    assert(st2.read("t").filter(col("id") === 150L).count() === 1L)
  }

  test("commits survive a corrupt consolidated file and rebuild stats from sidecars") {
    import org.apache.hadoop.fs.{Path => HPath}
    val st = newStore()
    st.create("t", schema, zoneCols = Seq("id"))
    (0 until 4).foreach { b =>
      val lo = b * 100L
      st.append("t",
        (lo until lo + 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    }
    val fs = new HPath(st.root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val cons = new HPath(st.root,
      f"t/manifest-${st.currentVersion("t")}%06d.stats.json")
    val out = fs.create(cons, true)
    out.write("{not json".getBytes("UTF-8")); out.close()
    // the NEXT commit must not throw — and must re-consolidate from the
    // per-file sidecars, restoring pruning for the old files
    st.append("t",
      (400L until 500L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    fs.delete(new HPath(st.root, "t/stats"), true)
    assert(st.candidateFilesForKeys("t", Seq(150L).toDF("id"), Seq("id")).size === 1)
    assert(st.read("t").count() === 500L)
  }

  test("float zone column: stats widen exactly, equality literals never mis-prune") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.hadoop.fs.{Path => HPath}
    import graft.tables.ZoneMapFileIndex
    val st = newStore()
    st.create("t", StructType(Seq(
      StructField("f", FloatType), StructField("v", StringType))),
      zoneCols = Seq("f"))
    // 2.7f is NOT the double 2.7: a stat printed as "2.7" would parse
    // below the widened literal and wrongly prune the file that holds it
    st.append("t", Seq((1.1f, "a"), (2.7f, "b")).toDF("f", "v").coalesce(1))
    st.append("t", Seq((10.5f, "c"), (20.25f, "d")).toDF("f", "v").coalesce(1))
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case l: LogicalRelation =>
          l.relation.asInstanceOf[HadoopFsRelation]
            .location.asInstanceOf[ZoneMapFileIndex]
      }.head.lastScanCounts
    val eq = st.read("t").filter(col("f") === 2.7f)
    assert(eq.collect().map(_.getString(1)).toSeq === Seq("b"))
    assert(counts(eq) === Some((2, 1))) // pruned to the holding file, kept it
    val hi = st.read("t").filter(col("f") >= 10.0f)
    assert(hi.collect().map(_.getString(1)).sorted.toSeq === Seq("c", "d"))
    assert(counts(hi) === Some((2, 1)))

    // legacy narrow-printed float stats (pre-widening format) HEAL on
    // read: simulate a legacy table — no consolidated files, a sidecar
    // holding Float.toString bounds — and the 2.7f row must still match
    val fs = new HPath(st.root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    (1 to st.currentVersion("t")).foreach { v =>
      fs.delete(new HPath(st.root, f"t/manifest-$v%06d.stats.json"), false)
    }
    val rel1 = st.currentRelPaths("t").head // first append's file: (1.1f, 2.7f)
    val sc = new HPath(st.root, s"t/stats/${rel1.replace("/", "__")}.json")
    val o = fs.create(sc, true)
    o.write("""{"f": [1.1, 2.7]}""".getBytes("UTF-8")); o.close()
    val legacy = st.read("t").filter(col("f") === 2.7f)
    assert(legacy.collect().map(_.getString(1)).toSeq === Seq("b"))
    assert(counts(legacy) === Some((2, 1)))
  }

  test("NaN zone values degrade to no-stats; commits and reads continue") {
    val st = newStore()
    st.create("t", StructType(Seq(
      StructField("d", DoubleType), StructField("v", StringType))),
      zoneCols = Seq("d"))
    // max(d) over this file is NaN (NaN sorts greatest) — an unguarded
    // writer would emit invalid JSON and brick every later commit
    st.append("t", Seq((1.0, "a"), (Double.NaN, "n")).toDF("d", "v").coalesce(1))
    st.append("t", Seq((100.0, "z")).toDF("d", "v").coalesce(1))
    // the NaN file has no usable bounds → never pruned; results stay exact
    assert(st.read("t").filter(col("d") === 1.0).collect()
      .map(_.getString(1)).toSeq === Seq("a"))
    assert(st.read("t").filter(col("d").isNaN).collect()
      .map(_.getString(1)).toSeq === Seq("n"))
    assert(st.read("t").count() === 3L)
  }

  test("zone-less tables get a consolidated file too (lengths only, no probing)") {
    import org.apache.hadoop.fs.{Path => HPath}
    val st = newStore()
    st.create("t", schema) // no zone columns
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    val fs = new HPath(st.root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val cons = new HPath(st.root,
      f"t/manifest-${st.currentVersion("t")}%06d.stats.json")
    assert(fs.exists(cons))
    // planning reads statuses from the recorded lengths: deleting a data
    // file is only discovered at EXECUTION (scan), not at plan time
    val df = st.read("t")
    assert(df.count() === 1L)

    // corrupt-but-parseable lengths (zeros) must not fabricate empty
    // splits and silently drop rows — they fall back to getFileStatus
    val rel = st.currentRelPaths("t").head
    val out = fs.create(cons, true)
    out.write(s"""{"stats": {}, "len": {"$rel": 0}}""".getBytes("UTF-8"))
    out.close()
    assert(st.read("t").count() === 1L)
  }

  test("expireSnapshots deletes unreferenced files, keeps current readable") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    st.upsert("t", Seq((1L, "a2")).toDF("id", "v"), Seq("id")) // rewrites file
    val before = java.nio.file.Files.walk(
      java.nio.file.Paths.get(st.root, "t", "data")).iterator()
    val nBefore = before.asScala.count(p => java.nio.file.Files.isRegularFile(p))
    st.expireSnapshots("t", keepLast = 1)
    val nAfter = java.nio.file.Files.walk(
      java.nio.file.Paths.get(st.root, "t", "data")).iterator()
      .asScala.count(p => java.nio.file.Files.isRegularFile(p))
    assert(nAfter < nBefore)
    assert(st.read("t").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a2")))
    // expired versions are gone
    intercept[IllegalArgumentException] { st.readVersion("t", 1) }
  }

  test("applyNet deletes correctly with a NON-broadcast (shuffled) semi join") {
    // regression: input_file_name() projected after a shuffled join returns
    // "" and affected files were silently missed
    val st = newStore()
    st.create("t", schema)
    st.append("t", (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val newRows = (1L to 50L).map(i => (i, "upd")).toDF("id", "v")
      st.applyNet("t", newRows, newRows, Seq("id"))
      assert(st.read("t").count() === 100) // no duplicate keys
      assert(st.read("t").filter(col("v") === "upd").count() === 50)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("delete keeps rows where the predicate evaluates to NULL") {
    val st = newStore()
    st.create("t", schema)
    import org.apache.spark.sql.Row
    val data = new java.util.ArrayList[Row]()
    data.add(Row(1L, "a")); data.add(Row(null, "null-id"))
    st.append("t", spark.createDataFrame(data, schema))
    st.delete("t", col("id") === 1L)
    val left = st.read("t").collect().map(_.getString(1))
    assert(left.toSeq === Seq("null-id")) // NULL-predicate row survives
  }

  test("zone maps: key batches prune non-overlapping files without reads") {
    val st = newStore()
    st.create("t", schema, zoneCols = Seq("id"))
    // three appends with disjoint id ranges → three stat'd file sets
    st.append("t", (1L to 10L).map(i => (i, s"a$i")).toDF("id", "v"))
    st.append("t", (100L to 110L).map(i => (i, s"b$i")).toDF("id", "v"))
    st.append("t", (1000L to 1010L).map(i => (i, s"c$i")).toDF("id", "v"))
    val all = st.currentRelPaths("t")
    val keys = Seq(105L).toDF("id")
    val candidates = st.candidateFilesForKeys("t", keys, Seq("id"))
    assert(candidates.size < all.size, s"expected pruning, got $candidates")
    // the pruned set must still contain the file holding id=105
    st.upsert("t", Seq((105L, "UPDATED")).toDF("id", "v"), Seq("id"))
    val got = st.read("t").filter(col("id") === 105L).collect()
    assert(got.length === 1 && got(0).getString(1) === "UPDATED")
    assert(st.read("t").count() === 32)
    // out-of-range keys prune everything
    assert(st.candidateFilesForKeys("t", Seq(999999L).toDF("id"), Seq("id")).isEmpty)
  }

  test("readRange scans only files whose zone range can overlap") {
    val st = newStore()
    st.create("t", schema, zoneCols = Seq("id"))
    st.append("t", (1L to 10L).map(i => (i, s"a$i")).toDF("id", "v"))
    st.append("t", (100L to 110L).map(i => (i, s"b$i")).toDF("id", "v"))
    st.append("t", (1000L to 1010L).map(i => (i, s"c$i")).toDF("id", "v"))
    val got = st.readRange("t", "id", 100L, 200L)
    // correctness: exactly the middle batch
    assert(got.orderBy("id").select("id").as[Long].collect().toSeq ===
      (100L to 110L))
    // pruning: the planned scan reads strictly fewer files than the table has
    val scanned = got.select(input_file_name()).distinct().count()
    assert(scanned < st.currentFiles("t").size)
    // an empty range plans an empty scan, not a full one
    assert(st.readRange("t", "id", 5000L, 6000L).count() === 0)
    // non-zone column is rejected loudly
    intercept[IllegalArgumentException] { st.readRange("t", "v", "a", "b") }
  }

  test("upsert is idempotent: applying the same rows twice changes nothing") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val rows = Seq((1L, "a2"), (3L, "c")).toDF("id", "v")
    st.upsert("t", rows, Seq("id"))
    val first = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    st.upsert("t", rows, Seq("id"))
    val second = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(first === Seq((1L, "a2"), (2L, "b"), (3L, "c")))
    assert(second === first)
  }

  test("commit lock: a held lock makes a contender wait, then time out loudly") {
    val st = newStore()
    st.create("t", schema)
    val lock = java.nio.file.Paths.get(st.root, "t", "_commit.lock")
    java.nio.file.Files.createFile(lock) // simulate another writer mid-commit
    val prior = TableStore.LockWaitMs
    TableStore.LockWaitMs = 400L
    try {
      val t0 = System.currentTimeMillis()
      val e = intercept[IllegalStateException] {
        st.append("t", Seq((1L, "a")).toDF("id", "v"))
      }
      assert(e.getMessage.contains("concurrent writer"))
      assert(System.currentTimeMillis() - t0 >= 400L) // it WAITED, not fail-fast
    } finally TableStore.LockWaitMs = prior
    java.nio.file.Files.delete(lock)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    assert(st.read("t").count() === 1)
  }

  test("create(overwrite) replaces an existing table") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    st.create("t", schema, overwrite = true)
    assert(st.read("t").count() === 0)
    intercept[IllegalArgumentException] { st.create("t", schema) }
  }

  test("reader isolation: a DataFrame read before a commit still sees its snapshot") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val before = st.read("t") // plan pins the CURRENT file list
    st.upsert("t", Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), Seq("id"))
    // data files are immutable and retained until expireSnapshots — the
    // pre-commit reader keeps its consistent snapshot
    assert(before.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a"), (2L, "b")))
    assert(st.read("t").orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("stale commit lock is reclaimed automatically (crash recovery)") {
    val st = newStore()
    st.create("t", schema)
    // simulate a crashed writer: lock exists and is older than the
    // staleness threshold (backdate via Hadoop setTimes)
    val conf = spark.sessionState.newHadoopConf()
    val lock = new org.apache.hadoop.fs.Path(st.root + "/t/_commit.lock")
    val fs = lock.getFileSystem(conf)
    fs.create(lock, false).close()
    fs.setTimes(lock, System.currentTimeMillis() - TableStore.StaleLockMs - 1000, -1)
    // no manual deletion: the store must reclaim and commit
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    assert(st.read("t").count() === 1)
    // a FRESH lock (live writer) is waited on, then still fails loudly
    fs.create(lock, false).close()
    val prior = TableStore.LockWaitMs
    TableStore.LockWaitMs = 300L
    val e =
      try intercept[IllegalStateException] {
        st.append("t", Seq((2L, "b")).toDF("id", "v"))
      } finally TableStore.LockWaitMs = prior
    assert(e.getMessage.contains("concurrent writer"))
    fs.delete(lock, false)
  }

  test("RELATIVE local store root works (paths are qualified at construction)") {
    val rel = s"target/rel-store-${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      val st = new TableStore(spark, rel)
      st.create("t", schema)
      st.append("t", Seq((1L, "a")).toDF("id", "v"))
      st.upsert("t", Seq((1L, "a2")).toDF("id", "v"), Seq("id"))
      assert(st.read("t").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        === Seq((1L, "a2")))
    } finally {
      val p = new org.apache.hadoop.fs.Path(rel)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
  }

  test("bloom sidecars prune point lookups on columns zone maps can't touch") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import graft.tables.ZoneMapFileIndex
    val root = tmpDir("tablestore-bloom-")
    val st = new TableStore(spark, root)
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("u", LongType), StructField("s", StringType)))
    st.create("t", sch, zoneCols = Seq("id"),
      bloomCols = Seq("u", "s"), bloomItems = 1000)
    // four disjoint id-range files; u/s values SCATTER across the id
    // space (u = id*37 mod 10000 is injective on 0..399), so a given u
    // lives in exactly one file but zone maps on u would span everything
    (0 until 4).foreach { b =>
      val lo = b * 100L
      st.append("t", (lo until lo + 100L)
        .map(i => (i, i * 37 % 10000, s"s${i * 37 % 10000}"))
        .toDF("id", "u", "s").coalesce(1))
    }
    def countsOf(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      df.collect() // plan + run (listFiles fires during planning/execution)
      df.queryExecution.optimizedPlan.collect {
        case l: LogicalRelation =>
          l.relation.asInstanceOf[HadoopFsRelation]
            .location.asInstanceOf[ZoneMapFileIndex]
      }.head.lastScanCounts.get
    }

    // long equality: id=250 → u=9250 lives only in file 2; bloom hashing
    // is deterministic, so the survivor count is reproducible
    val eq = st.read("t").filter(col("u") === 9250L)
    assert(eq.collect().map(_.getLong(0)).toSeq === Seq(250L))
    val (tot, surv) = countsOf(st.read("t").filter(col("u") === 9250L))
    assert(tot === 4 && surv < 4, s"bloom pruned nothing: $tot -> $surv")

    // absent value: every file's bloom rejects (no false positive for
    // this value with these deterministic hashes) → empty, ideally 0 files
    val none = st.read("t").filter(col("u") === 77777L)
    assert(none.collect().isEmpty)

    // string probes work the same way (putBinary/mightContainString)
    val sEq = st.read("t").filter(col("s") === "s9250")
    assert(sEq.collect().map(_.getLong(0)).toSeq === Seq(250L))
    assert(countsOf(st.read("t").filter(col("s") === "s9250"))._2 < 4)

    // IN probes: a file survives if ANY member might be present
    val in = st.read("t").filter(col("u").isin(9250L, 1110L)) // ids 250, 30
    assert(in.collect().map(_.getLong(0)).sorted.toSeq === Seq(30L, 250L))

    // mutation path: candidateFilesForKeys probes blooms for key batches
    val keys = Seq(9250L).toDF("u")
    assert(st.candidateFilesForKeys("t", keys, Seq("u")).length < 4)

    // fail open: with the sidecars gone, scans keep all files and stay exact
    val bloomDir = new org.apache.hadoop.fs.Path(root, "t/bloom")
    val fs = bloomDir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(bloomDir, true)
    val open = st.read("t").filter(col("u") === 9250L)
    assert(open.collect().map(_.getLong(0)).toSeq === Seq(250L))
    assert(countsOf(st.read("t").filter(col("u") === 9250L))._2 === 4)

    // blooms rebuild on rewrite: compact, then pruning works again
    st.compact("t", numFiles = 4, clusterCols = Seq("id", "u"))
    val after = st.read("t").filter(col("u") === 9250L)
    assert(after.collect().map(_.getLong(0)).toSeq === Seq(250L))
  }

  test("blooms compose with hive partitioning: directory pruning then probes") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import graft.tables.ZoneMapFileIndex
    val st = newStore()
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("u", LongType), StructField("p", StringType)))
    st.create("t", sch, partitionBy = Seq("p"), zoneCols = Seq("id"),
      bloomCols = Seq("u"), bloomItems = 500)
    // two partitions × two id-range files each; u scatters
    Seq("x", "y").foreach { part =>
      (0 until 2).foreach { b =>
        val lo = b * 100L
        st.append("t", (lo until lo + 100L)
          .map(i => (i, i * 37 % 10000, part)).toDF("id", "u", "p").coalesce(1))
      }
    }
    // partition filter drops dir y; bloom probes the two x files
    // (id 150 -> u = 5550 lives in the second id-range file of each dir)
    val q = st.read("t")
      .filter(col("p") === "x" && col("u") === 5550L)
    val got = q.collect().map(r => (r.getLong(0), r.getString(2)))
    assert(got.toSeq === Seq((150L, "x")))
    val counts = q.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation =>
        l.relation.asInstanceOf[HadoopFsRelation]
          .location.asInstanceOf[ZoneMapFileIndex]
    }.head.lastScanCounts.get
    assert(counts._1 === 4 && counts._2 < 2,
      s"expected partition+bloom pruning below 2 files, got $counts")
  }

  test("bloom columns survive rename and refuse drop") {
    val st = newStore()
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("u", LongType)))
    st.create("t", sch, zoneCols = Seq("id"), bloomCols = Seq("u"),
      bloomItems = 100)
    st.append("t", (0L until 50L).map(i => (i, i * 31 % 997)).toDF("id", "u"))
    st.renameColumn("t", "u", "user_id")
    // physical sidecars keyed by the ORIGINAL name still probe
    val got = st.read("t").filter(col("user_id") === (7L * 31 % 997))
    assert(got.collect().map(_.getLong(0)).toSeq === Seq(7L))
    intercept[IllegalArgumentException] {
      st.dropColumn("t", "user_id")
    }
  }

  test("metadata-only aggregates answer from stats, not data") {
    val st = newStore()
    st.create("t", schema, zoneCols = Seq("id"))
    assert(st.rowCount("t") === Some(0L))
    (0 until 3).foreach { b =>
      val lo = b * 100L
      st.append("t",
        (lo until lo + 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    }
    assert(st.rowCount("t") === Some(300L))
    assert(st.columnRange("t", "id") === Some((0L, 299L)))
    // CoW delete keeps counts/bounds EXACT (rewritten files re-stat)
    st.delete("t", col("id") % 7 === 0)
    val expect = (0L until 300L).count(_ % 7 != 0).toLong
    assert(st.rowCount("t") === Some(expect))
    assert(st.columnRange("t", "id") === Some((1L, 299L)))
    assert(st.read("t").count() === expect) // metadata agrees with data
    // THE metadata-only proof: corrupt every data file — the answers
    // above must come from the consolidated stats alone
    val conf = spark.sessionState.newHadoopConf()
    st.currentFiles("t").foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      out.write("garbage".getBytes); out.close()
    }
    assert(st.rowCount("t") === Some(expect))
    assert(st.columnRange("t", "id") === Some((1L, 299L)))
  }

  test("count(*) is answered by the optimizer from metadata, no scan planned") {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val st = newStore()
    st.create("t", schema, zoneCols = Seq("id"))
    (0 until 3).foreach { b =>
      val lo = b * 100L
      st.append("t",
        (lo until lo + 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    }
    st.delete("t", col("id") % 3 === 0)
    val expect = (0L until 300L).count(_ % 3 != 0).toLong

    def scansOf(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case _: LogicalRelation => 1
      }.sum

    // plain count(): rewritten to a LocalRelation — zero relations planned
    val cnt = st.read("t").agg(count(lit(1)).as("cnt"))
    assert(cnt.collect().map(_.getLong(0)).toSeq === Seq(expect))
    assert(scansOf(cnt) === 0, "count(*) still planned a scan")
    assert(st.read("t").count() === expect) // Dataset.count() path too

    // min/max of a zone column rewrite too — even mixed with count, and
    // even through a rename (the attr resolves to the physical column)
    st.renameColumn("t", "id", "key")
    val mm = st.read("t").agg(count(lit(1)).as("cnt"),
      min(col("key")).as("lo"), max(col("key")).as("hi"))
    val row = mm.collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((expect, 1L, 299L)))
    assert(scansOf(mm) === 0, "min/max still planned a scan")
    st.renameColumn("t", "key", "id")
    // min/max of a NON-zone column must scan
    val nz = st.read("t").agg(min(col("v")))
    assert(scansOf(nz) === 1, "non-zone min must scan")

    // result survives data-file corruption — the answer IS metadata
    val conf = spark.sessionState.newHadoopConf()
    st.currentFiles("t").foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true); out.write("junk".getBytes); out.close()
    }
    assert(st.read("t").count() === expect)

    // conservative preconditions: any of these MUST still scan
    val filtered = st.read("t").filter(col("id") > 10L).agg(count(lit(1)))
    assert(scansOf(filtered) === 1, "filtered count must scan")
    val grouped = st.read("t").groupBy(col("v")).agg(count(lit(1)))
    assert(scansOf(grouped) === 1, "grouped count must scan")
    val distinct = st.read("t").agg(countDistinct(col("id")))
    assert(scansOf(distinct) === 1, "count distinct must scan")
    val countCol = st.read("t").agg(count(col("v"))) // null-sensitive
    assert(scansOf(countCol) === 1, "count(col) must scan")

    // an all-null zone file has no recorded bound: min/max must go back
    // to scanning (null-ignoring SQL semantics can't be derived), while
    // count(*) stays metadata-only — counts don't need bounds
    st.append("t", Seq(Tuple1("nullrow")).toDF("v")
      .select(lit(null).cast("long").as("id"), col("v")))
    assert(scansOf(st.read("t").agg(min(col("id")))) === 1,
      "min over an all-null-bound snapshot must scan")
    assert(scansOf(st.read("t").agg(count(lit(1)))) === 0)
  }

  test("merge updates only the named columns, inserts the unmatched") {
    val st = newStore()
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("status", StringType), StructField("amt", DoubleType)))
    st.create("t", sch, zoneCols = Seq("id"))
    st.append("t", Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "status", "amt"))
    // decoy status "X" must NOT land on matches; id=9 inserts whole row
    val src = Seq((2L, "X", 99.0), (9L, "n", 1.0)).toDF("id", "status", "amt")
    st.merge("t", src, Seq("id"), updateCols = Seq("amt"))
    val got = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, "a", 10.0), (2L, "b", 99.0),
      (3L, "c", 30.0), (9L, "n", 1.0)))
    // one commit for the whole merge
    assert(st.currentVersion("t") === 3)

    // insertUnmatched=false: unmatched keys vanish, source may be partial
    st.merge("t", Seq((3L, 33.0), (77L, 7.0)).toDF("id", "amt"),
      Seq("id"), updateCols = Seq("amt"), insertUnmatched = false)
    val after = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(after.toSeq === Seq((1L, "a", 10.0), (2L, "b", 99.0),
      (3L, "c", 33.0), (9L, "n", 1.0)))

    // null-key source row matches nothing -> inserts (SQL `=` semantics)
    val withNull = Seq((java.lang.Long.valueOf(4L), "d", 4.0),
      (null.asInstanceOf[java.lang.Long], "z", 0.0))
      .toDF("id", "status", "amt").select(col("id").cast("long"),
        col("status"), col("amt"))
    st.merge("t", withNull, Seq("id"), updateCols = Seq("amt"))
    assert(st.read("t").count() === 6)
    assert(st.read("t").filter(col("id").isNull).count() === 1)

    // merge into an empty table degrades to pure insert
    val st2 = newStore()
    st2.create("t", sch, zoneCols = Seq("id"))
    st2.merge("t", Seq((1L, "a", 1.0)).toDF("id", "status", "amt"),
      Seq("id"), updateCols = Seq("amt"))
    assert(st2.read("t").count() === 1)
  }

  test("partition evolution: future files use the new layout, mixed reads compose") {
    val st = newStore()
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("grp", StringType), StructField("pri", LongType)))
    st.create("t", sch, partitionBy = Seq("grp"), zoneCols = Seq("id"))
    st.append("t", Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "a", 20L))
      .toDF("id", "grp", "pri"))
    // metadata-only evolution: future writes partition by pri instead
    st.repartitionSpec("t", Seq("pri"))
    st.append("t", Seq((4L, "a", 10L), (5L, "c", 20L)).toDF("id", "grp", "pri"))
    // layout check: old files under grp=, new files under spec-1/pri=
    val rels = st.currentRelPaths("t")
    assert(rels.exists(_.startsWith("grp=")))
    assert(rels.exists(_.startsWith("spec-1/pri=")))
    // mixed read serves the full logical schema from both layouts
    val all = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(all.toSeq === Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "a", 20L),
      (4L, "a", 10L), (5L, "c", 20L)))
    // a filter on either layout's partition column stays correct:
    // partition-valued in one generation, data column in the other
    assert(st.read("t").filter(col("grp") === "a").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 4L))
    assert(st.read("t").filter(col("pri") === 20L).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 5L))
    // CoW mutations span generations in one atomic commit
    st.delete("t", col("id") === 1L || col("id") === 5L)
    assert(st.read("t").select("id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(2L, 3L, 4L))
    // compaction rewrites everything into the CURRENT spec
    st.compact("t", numFiles = 1)
    assert(st.currentRelPaths("t").forall(_.startsWith("spec-1/pri=")))
    assert(st.read("t").select("id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(2L, 3L, 4L))
    // time travel to the pre-evolution snapshot still reads spec-0 layout
    assert(st.readVersion("t", 2).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    // guards: same spec re-registration and bloom-col partitioning refuse
    intercept[IllegalArgumentException] { st.repartitionSpec("t", Seq("pri")) }
  }

  test("merge deleteWhen: delete beats update, NULL keeps, unmatched still inserts") {
    val st = newStore()
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("n", LongType)))
    st.create("t", sch)
    st.append("t", Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "n"))
    // id=1: matched, op=D, ALSO carries an update → must be DELETED
    // id=2: matched, op=U → updated (n only; decoy v must not land)
    // id=3: matched, op=NULL → condition NULL keeps the row → updated
    // id=9: unmatched, op=D → deleteWhen is a MATCHED clause; inserts
    val src = Seq((1L, "decoy", 111L, "D"), (2L, "decoy", 222L, "U"),
      (3L, "decoy", 333L, null.asInstanceOf[String]),
      (9L, "new", 999L, "D")).toDF("id", "v", "n", "__op")
    st.merge("t", src, Seq("id"), updateCols = Seq("n"),
      deleteWhen = Some(col("__op") === "D"))
    val got = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (2L, "b", 222L), (3L, "c", 333L), (9L, "new", 999L)))
  }

  test("metadata aggregates fall back to None when stats are incomplete") {
    val st = newStore()
    st.create("t", schema) // no zone cols — row counts still recorded
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(st.rowCount("t") === Some(2L))
    intercept[IllegalArgumentException] { st.columnRange("t", "id") }
    // kill the consolidated file AND the sidecars → unknown, not a guess
    val root = new org.apache.hadoop.fs.Path(st.root)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root, "t/stats"), true)
    val v = st.currentVersion("t")
    fs.delete(new org.apache.hadoop.fs.Path(root,
      f"t/manifest-$v%06d.stats.json"), false)
    assert(st.rowCount("t") === None)
  }

  test("removeOrphans deletes aged crash debris, never young or referenced files") {
    val root = tmpDir("tablestore-orphan-")
    val st = new TableStore(spark, root)
    st.create("t", schema, zoneCols = Seq("id"))
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // plant debris: a file in data/ no manifest references (the shape a
    // crash between staging-rename and commit leaves behind)
    val conf = spark.sessionState.newHadoopConf()
    val dataDir = new org.apache.hadoop.fs.Path(root, "t/data")
    val fs = dataDir.getFileSystem(conf)
    val orphan = new org.apache.hadoop.fs.Path(dataDir, "deadbeef-part00000.parquet")
    val out = fs.create(orphan, true); out.write("junk".getBytes); out.close()

    // young debris is protected by the age fence (could be an in-flight commit)
    assert(st.removeOrphans("t") === Seq.empty)
    assert(fs.exists(orphan))

    // age it past the cutoff: deleted, and ONLY it
    fs.setTimes(orphan, System.currentTimeMillis() - 2L * 24 * 3600 * 1000, -1)
    assert(st.removeOrphans("t") === Seq("deadbeef-part00000.parquet"))
    assert(!fs.exists(orphan))
    val got = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a"), (2L, "b")))

    // files referenced by RETAINED older manifests survive even when aged
    st.delete("t", col("id") === 1L)
    val old = st.currentFiles("t")
    listAll(fs, dataDir).foreach(p =>
      fs.setTimes(p, System.currentTimeMillis() - 2L * 24 * 3600 * 1000, -1))
    assert(st.removeOrphans("t") === Seq.empty) // all referenced somewhere
    assert(st.read("t").count() === 1)
    assert(old.forall(f => fs.exists(new org.apache.hadoop.fs.Path(f))))
  }

  private def listAll(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
    val it = fs.listFiles(dir, true)
    val b = Seq.newBuilder[org.apache.hadoop.fs.Path]
    while (it.hasNext) b += it.next().getPath
    b.result()
  }

  test("table root on an explicit file:-scheme Hadoop URI works end to end") {
    val st = new TableStore(spark, "file://" + tmpDir("tablestore-uri-"))
    st.create("t", schema, zoneCols = Seq("id"))
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    st.upsert("t", Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), Seq("id"))
    st.delete("t", col("v") === "a")
    val got = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((2L, "b2"), (3L, "c")))
    assert(st.currentVersion("t") === 4)
    st.compact("t", 1)
    st.expireSnapshots("t", keepLast = 1)
    assert(st.read("t").count() === 2)
  }
}
