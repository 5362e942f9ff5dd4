package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Named refs: branches, tags, write-audit-publish. */
class RefsSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() = new TableStore(spark, tmpDir("refs-"))

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("write-audit-publish: branch commits are invisible until fast-forward") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    st.createBranch("t", "audit")
    st.append("t", Seq((2L, "staged")).toDF("id", "v"),
      branch = Some("audit"))
    st.append("t", Seq((3L, "staged2")).toDF("id", "v"),
      branch = Some("audit"))
    // audit: branch sees the staged rows, main does not
    assert(st.readRef("t", "audit").orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(st.read("t").collect().map(_.getLong(0)).toSeq === Seq(1L))
    // publish
    st.fastForward("t", "audit")
    assert(st.read("t").orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    st.dropRef("t", "audit")
    assert(st.refs("t").isEmpty)
  }

  test("fast-forward refuses when main advanced since the fork") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    st.createBranch("t", "b")
    st.append("t", Seq((2L, "branch")).toDF("id", "v"), branch = Some("b"))
    st.append("t", Seq((3L, "main")).toDF("id", "v")) // main moves
    val e = intercept[IllegalArgumentException] { st.fastForward("t", "b") }
    assert(e.getMessage.contains("cannot fast-forward"))
    // both lines still intact
    assert(st.read("t").orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(st.readRef("t", "b").orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("branch commits never surface in main incremental reads") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    val v1 = st.currentVersion("t")
    st.createBranch("t", "side")
    st.append("t", Seq((9L, "side")).toDF("id", "v"), branch = Some("side"))
    st.append("t", Seq((2L, "b")).toDF("id", "v"))
    val inc = st.readAppendedSince("t", v1).collect().map(_.getLong(0))
    assert(inc.toSeq === Seq(2L))
  }

  test("tags pin a snapshot through mutations and expiry") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    st.createTag("t", "v1-release")
    st.delete("t", col("id") === 1L)
    st.append("t", Seq((3L, "c")).toDF("id", "v"))
    st.compact("t", numFiles = 1)
    st.expireSnapshots("t", keepLast = 1)
    // the tag's manifest AND its data files survived expiry
    assert(st.readRef("t", "v1-release").orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(st.read("t").orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(2L, 3L))
    // tags are immutable names: re-creating is refused
    intercept[IllegalArgumentException] { st.createTag("t", "v1-release") }
    st.dropRef("t", "v1-release")
    intercept[RuntimeException] { st.readRef("t", "v1-release") }
  }

  test("branch head survives expiry; drop/create clears branch pointers") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    st.createBranch("t", "keepme")
    st.append("t", Seq((2L, "x")).toDF("id", "v"), branch = Some("keepme"))
    (1 to 3).foreach(i => st.append("t", Seq((10L + i, "m")).toDF("id", "v")))
    st.expireSnapshots("t", keepLast = 1)
    assert(st.readRef("t", "keepme").orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // re-create from scratch: no ghost refs
    st.create("t", schema, overwrite = true)
    assert(st.refs("t").isEmpty)
    st.append("t", Seq((5L, "fresh")).toDF("id", "v"))
    assert(st.read("t").collect().map(_.getLong(0)).toSeq === Seq(5L))
  }

  test("refs on the in-process CAS coordinator (catalog-backed shape)") {
    val root = tmpDir("refs-cas-")
    val st = new TableStore(spark, root,
      coordinator = Some(new InProcessCasCoordinator))
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    st.createBranch("t", "wap")
    st.append("t", Seq((2L, "staged")).toDF("id", "v"), branch = Some("wap"))
    assert(st.read("t").count() === 1)
    st.fastForward("t", "wap")
    assert(st.read("t").count() === 2)
    // drop clears the branch pointer from the external coordinator too
    st.drop("t")
    st.create("t", schema)
    st.append("t", Seq((7L, "n")).toDF("id", "v"))
    assert(st.refs("t").isEmpty)
  }
}
