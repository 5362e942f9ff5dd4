package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{AnnIndex, Similarity}
import graft.tables.TableStore

/** Persistent ANN index maintenance THROUGH THE CHANGE FEED: corpus
  * deletes/updates maintain the stored index with metadata-only
  * tombstones + delta appends — never a rebuild — and the served
  * results equal a from-scratch rebuild over the same corpus (the
  * equivalence that makes the maintained index trustworthy; the
  * append-only paths are separately DuckDB-oracled by the
  * sim_ann_*_incremental gates). */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def emb(n: Int): DataFrame =
    spark.range(0, n).select(col("id").as("vec_id"),
      Similarity.quantize(transform(sequence(lit(1), lit(64)),
        d => sin((col("id") + 1) * d.cast("double")))).as("embedding"),
      (col("id") % 7).cast("int").as("label"))

  private def served(st: TableStore, idx: String): Seq[(Long, Int, Long)] =
    AnnIndex.query(st, idx, st.read("corpus").filter($"vec_id" < 5), 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq

  test("corpus deletes/updates maintain the index via the feed, no rebuild") {
    val st = new TableStore(spark, tmpDir("annidx-"))
    val data = emb(200)
    st.create("corpus", data.schema)
    st.append("corpus", data)
    assert(AnnIndex.refresh(st, "corpus", "idx") === 200L)
    val filesAfterBuild = st.currentRelPaths("idx").toSet

    // corpus mutations: delete a slice, update one vector's label (an
    // applyNet = delete+insert of the same key in ONE commit)
    st.deleteMoR("corpus", (150L until 200L).toDF("vec_id"), Seq("vec_id"))
    st.applyNet("corpus",
      keys = Seq(7L).toDF("vec_id"),
      newRows = data.filter($"vec_id" === 7L).withColumn("label", lit(99)),
      keyCols = Seq("vec_id"))
    val n = AnnIndex.refresh(st, "corpus", "idx")
    assert(n === 1L, s"feed maintenance should re-index only vec 7, got $n")
    // NO index data file rewritten: maintenance = tombstone (metadata
    // only) + one delta append
    assert(filesAfterBuild.subsetOf(st.currentRelPaths("idx").toSet),
      "maintenance must never rewrite index files")
    assert(st.pendingDeletes("idx") > 0,
      "touched keys must mask via a pending tombstone")
    // equivalence: a from-scratch index over the same corpus serves the
    // SAME top-k (deleted vectors gone, vec 7's new label visible)
    val st2 = new TableStore(spark, tmpDir("annidx2-"))
    st2.create("corpus", data.schema)
    st2.append("corpus", st.read("corpus"))
    assert(AnnIndex.refresh(st2, "corpus", "idx") === 150L)
    assert(served(st, "idx") === served(st2, "idx"))
    assert(served(st, "idx").nonEmpty)
    // the updated row is what the MASKED index serves for vec 7: only
    // the new label remains (stale rows tombstoned)
    val lbl = st.read("idx").filter($"vec_id" === 7L)
      .select("label").distinct().collect()
    assert(lbl.map(_.getInt(0)).toSeq === Seq(99))
    // idempotence after maintenance
    assert(AnnIndex.refresh(st, "corpus", "idx") === 0L)
  }

  test("insert-then-delete within one refresh range nets to absent") {
    val st = new TableStore(spark, tmpDir("annidx3-"))
    val data = emb(50)
    st.create("corpus", data.schema)
    st.append("corpus", data.filter($"vec_id" < 40))
    AnnIndex.refresh(st, "corpus", "idx")
    // vec 45 appears AND disappears between refreshes — the net outcome
    // is absent, so the feed's per-key netting must not resurrect it
    st.append("corpus", data.filter($"vec_id" >= 40))
    st.deleteMoR("corpus", Seq(45L).toDF("vec_id"), Seq("vec_id"))
    AnnIndex.refresh(st, "corpus", "idx")
    val ids = st.read("idx").select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(45L), "netted-out key must not serve")
    assert(ids.contains(44L) && ids.contains(49L))
    // equals the rebuild
    val st2 = new TableStore(spark, tmpDir("annidx4-"))
    st2.create("corpus", data.schema)
    st2.append("corpus", st.read("corpus"))
    AnnIndex.refresh(st2, "corpus", "idx")
    assert(served(st, "idx") === served(st2, "idx"))
  }

  test("corpus drop + re-create with a matching head forces a rebuild") {
    // a bare version pointer is ambiguous across re-creation: the new
    // corpus's head can EQUAL the stored pointer, and refresh would
    // return 0 and serve vectors of a table that no longer exists. The
    // ann.indexed-uuid stamp (TableStore.tableUuid) disambiguates.
    val st = new TableStore(spark, tmpDir("annidx6-"))
    val data = emb(100)
    st.create("corpus", data.schema)
    st.append("corpus", data)
    assert(AnnIndex.refresh(st, "corpus", "idx") === 100L)
    assert(AnnIndex.refreshIvf(st, "corpus", "ivf") === 100L)
    assert(AnnIndex.refreshPq(st, "corpus", "pq") === 100L)
    val headV = st.currentVersion("corpus")
    // same name, same head VERSION NUMBER, entirely different rows
    val data2 = emb(300).filter($"vec_id" >= 200)
    st.create("corpus", data.schema, overwrite = true)
    st.append("corpus", data2)
    assert(st.currentVersion("corpus") === headV,
      "test setup: the re-created head must collide with the pointer")
    for ((idx, n) <- Seq(("idx", AnnIndex.refresh(st, "corpus", "idx")),
        ("ivf", AnnIndex.refreshIvf(st, "corpus", "ivf")),
        ("pq", AnnIndex.refreshPq(st, "corpus", "pq")))) {
      assert(n === 100L, s"$idx: uuid mismatch must trigger a full rebuild")
      val ids = st.read(idx).select("vec_id").distinct()
        .collect().map(_.getLong(0))
      assert(ids.nonEmpty && ids.forall(_ >= 200L),
        s"$idx still serves rows of the dropped corpus")
    }
    // and the pointer is coherent again afterwards
    assert(AnnIndex.refresh(st, "corpus", "idx") === 0L)
    assert(AnnIndex.refreshIvf(st, "corpus", "ivf") === 0L)
    assert(AnnIndex.refreshPq(st, "corpus", "pq") === 0L)
  }

  test("IVF and PQ maintenance: deletes mask, state stays fixed") {
    val st = new TableStore(spark, tmpDir("annidx5-"))
    val data = emb(120)
    st.create("corpus", data.schema)
    st.append("corpus", data)
    AnnIndex.refreshIvf(st, "corpus", "ivf")
    AnnIndex.refreshPq(st, "corpus", "pq")
    val cents = st.read("ivf_centroids").orderBy("cell").collect().toSeq
    val books = st.read("pq_codebooks").orderBy("s", "j").collect().toSeq
    st.deleteMoR("corpus", (100L until 120L).toDF("vec_id"), Seq("vec_id"))
    assert(AnnIndex.refreshIvf(st, "corpus", "ivf") === 0L)
    assert(AnnIndex.refreshPq(st, "corpus", "pq") === 0L)
    // stale rows masked; stored state untouched by maintenance
    assert(st.read("ivf").filter($"vec_id" >= 100L).count() === 0L)
    assert(st.read("pq").filter($"vec_id" >= 100L).count() === 0L)
    assert(st.read("ivf_centroids").orderBy("cell").collect().toSeq === cents)
    assert(st.read("pq_codebooks").orderBy("s", "j").collect().toSeq === books)
    val q = st.read("corpus").filter($"vec_id" < 5)
    assert(AnnIndex.queryIvf(st, "ivf", q, 10)
      .filter($"vec_id" >= 100L).count() === 0L)
    assert(AnnIndex.queryPq(st, "pq", q, 10)
      .filter($"vec_id" >= 100L).count() === 0L)
  }
}
