package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Position deletes: (file, row-ordinal) sidecars — the second
  * merge-on-read flavor. Metadata-only commits, file-scoped masking,
  * coexistence with equality deletes, and single-pass materialization. */
class PosDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): TableStore = new TableStore(spark, tmpDir("pos-"))

  test("deletePos masks without rewriting; later appends unaffected") {
    val st = newStore()
    val df = spark.range(0, 100).select(col("id").as("k"),
      (col("id") % 10).as("m"))
    st.create("t", df.schema)
    st.append("t", df.repartition(4))
    val filesBefore = st.currentRelPaths("t")
    st.deletePos("t", col("k") % 7 === 0)
    assert(st.currentRelPaths("t") === filesBefore,
      "position delete must not touch data files")
    assert(st.pendingDeletes("t") === 1)
    val expect = (0L until 100L).filterNot(_ % 7 == 0)
    assert(st.read("t").select("k").collect().map(_.getLong(0)).sorted.toSeq
      === expect)
    // a LATER append re-inserting deleted keys is untouched (its file is
    // named in no sidecar) — no sequence bookkeeping needed
    st.append("t", Seq((7L, 99L), (14L, 99L)).toDF("k", "m"))
    assert(st.read("t").filter(col("m") === 99L).count() === 2L)
    assert(st.read("t").count() === expect.size + 2L)
  }

  test("position and equality deletes compose; one materialize folds both") {
    val st = newStore()
    val df = spark.range(0, 60).select(col("id").as("k"),
      (col("id") % 3).as("g"))
    st.create("t", df.schema)
    st.append("t", df.repartition(3))
    st.deleteMoR("t", Seq(10L, 11L).toDF("k"), Seq("k"))
    st.deletePos("t", col("g") === 2L && col("k") < 30L)
    assert(st.pendingDeletes("t") === 2)
    val expect = (0L until 60L)
      .filterNot(k => k == 10 || k == 11)
      .filterNot(k => k % 3 == 2 && k < 30)
    assert(st.read("t").select("k").collect().map(_.getLong(0)).sorted.toSeq
      === expect)
    st.materializeDeletes("t")
    assert(st.pendingDeletes("t") === 0)
    assert(st.read("t").select("k").collect().map(_.getLong(0)).sorted.toSeq
      === expect)
    assert(st.rowCount("t") === Some(expect.size.toLong),
      "metadata-only count returns after folding")
  }

  test("pos deletes stack, survive time travel, and fold under compaction") {
    val st = newStore()
    val df = spark.range(0, 40).select(col("id").as("k"))
    st.create("t", df.schema)
    st.append("t", df.coalesce(2))
    st.deletePos("t", col("k") < 10L)
    val vMasked = st.currentVersion("t")
    st.deletePos("t", col("k") >= 35L)
    assert(st.read("t").count() === 25L)
    // a snapshot between the two deletes shows only the first mask
    assert(st.readVersion("t", vMasked).count() === 30L)
    // ordinals recorded by the SECOND delete are of the MASKED scan but
    // mask the raw file — verify no over/under deletion after compact
    st.compact("t", numFiles = 1)
    assert(st.pendingDeletes("t") === 0)
    assert(st.read("t").select("k").collect().map(_.getLong(0)).sorted.toSeq
      === (10L until 35L))
  }

  test("deletePos on a hidden-partitioned, CoW-mutated table") {
    val st = newStore()
    val df = spark.range(0, 50).select(col("id").as("k"),
      (col("id") % 5).as("b"))
    st.create("t", df.schema, partitionBy = Seq("bucket(4:b)"))
    st.append("t", df)
    st.deletePos("t", col("k").between(10L, 19L))
    assert(st.read("t").count() === 40L)
    // CoW delete materializes the pending pos delete first
    st.delete("t", col("k") >= 45L)
    assert(st.pendingDeletes("t") === 0)
    assert(st.read("t").select("k").collect().map(_.getLong(0)).sorted.toSeq
      === ((0L until 10L) ++ (20L until 45L)))
  }

  test("updateMoR: one commit, no rewrite, chained updates compose, " +
    "materialize folds") {
    val st = newStore()
    val df = spark.range(0, 100).select(col("id").as("k"),
      (col("id") * 10).as("v"))
    st.create("t", df.schema)
    st.append("t", df.repartition(4))
    val filesBefore = st.currentRelPaths("t").toSet
    val verBefore = st.currentVersion("t")
    st.updateMoR("t", col("k") < 10, Map("v" -> (col("v") + 1)))
    // ONE commit: old files intact, new files appended, one pos sidecar
    assert(st.currentVersion("t") === verBefore + 1)
    assert(filesBefore.subsetOf(st.currentRelPaths("t").toSet),
      "MoR update must not rewrite existing files")
    assert(st.pendingDeletes("t") === 1)
    def vOf(k: Long): Long = st.read("t").filter(col("k") === k)
      .select("v").head().getLong(0)
    assert(vOf(3L) === 31L)
    assert(vOf(50L) === 500L)
    assert(st.read("t").count() === 100L)
    // a chained update touching previously-updated rows sees their NEW
    // values (the masked read includes the appended files)
    st.updateMoR("t", col("k") < 5, Map("v" -> (col("v") * 100)))
    assert(vOf(3L) === 3100L)
    assert(vOf(7L) === 71L)
    assert(st.read("t").count() === 100L)
    // update matching nothing commits nothing
    val ver = st.currentVersion("t")
    st.updateMoR("t", col("k") > 1000, Map("v" -> lit(0L)))
    assert(st.currentVersion("t") === ver)
    // time travel shows pre-update state; materialize folds everything
    assert(st.readVersion("t", verBefore).filter(col("k") === 3)
      .select("v").head().getLong(0) === 30L)
    st.materializeDeletes("t")
    assert(st.pendingDeletes("t") === 0)
    assert(vOf(3L) === 3100L)
    assert(st.read("t").count() === 100L)
  }
}
