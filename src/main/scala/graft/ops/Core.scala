package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One registered query: a Spark DataFrame program plus (optionally) an
  * equivalent ANSI-SQL oracle that DuckDB runs on the same parquet files.
  * Column names MUST match between the two — the driver sorts columns by
  * name before hashing values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  /** All testdata tables are single parquet files `<dir>/<name>.parquet`.
    *
    * Timestamp columns read back as whatever the fixture spells
    * (pandas-written `timestamp[us]`, `isAdjustedToUTC=false` →
    * TIMESTAMP_NTZ) and are deliberately NOT normalized here: the DuckDB
    * oracle returns tz-NAIVE values for the same files, so a gate that
    * emits a raw timestamp column must emit NTZ to value-match. The one
    * exception is the events stream table, whose `ts` needs session-zoned
    * TimestampType for watermarks/`unix_micros` — [[Events.ev]] owns that
    * cast (UTC session: same instant). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** Scratch roots for gates that materialize state (CDC table stores,
  * staged stream inputs): one subtree per sanitized sf-dir tag so corpora
  * never collide. ONE definition — tests reconstruct these paths, and a
  * drifting copy would silently inspect the wrong directory. */
object Scratch {
  def tag(dir: String): String = dir.replaceAll("[^A-Za-z0-9.]", "_")
  def dir(parts: String*): String =
    ("/root/repo/target" +: parts).mkString("/")
}

/** Shared helpers for cross-engine (Spark vs DuckDB) determinism.
  *
  * Doubles summed in arbitrary order are not reproducible across engines,
  * so every aggregate over a money-like column casts to DECIMAL first
  * (source data is verified 2-decimal-clean), sums exactly, and casts the
  * final result back to DOUBLE — bit-identical on both engines.
  */
object Dets {
  val D2: DecimalType = DecimalType(18, 2)
  val D4: DecimalType = DecimalType(18, 4)
  def dec(c: Column): Column = c.cast(D2)
  def dbl(c: Column): Column = c.cast(DoubleType)
  def tsLit(s: String): Column = lit(s).cast(TimestampType)
  /** exact decimal sum of a 2-decimal double column, returned as double */
  def dsum(c: Column): Column = dbl(sum(dec(c)))
}
