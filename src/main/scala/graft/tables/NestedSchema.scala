package graft.tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, struct, when}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Pure schema/column transforms for NESTED field evolution: the
  * logical schema (what users see, `_schema.json`) and the physical
  * schema (what parquet files carry) always have the SAME SHAPE — only
  * names differ, per the nested field catalog (`_nested.json`). All
  * helpers here exploit that congruence: fields pair positionally.
  *
  * Containers other than structs (arrays/maps of structs) do not
  * participate in nested evolution — resolution only descends
  * StructType, so a rename/drop inside an array element type is
  * refused at the API with a clear error rather than silently
  * mis-projecting. */
private[tables] object NestedSchema {

  /** Resolve a dotted path against a schema; None if any segment is
    * missing or a non-struct is descended into. */
  def resolve(schema: StructType, path: Seq[String]): Option[StructField] =
    path match {
      case Seq() => None
      case Seq(leaf) => schema.fields.find(_.name == leaf)
      case head +: rest => schema.fields.find(_.name == head)
        .flatMap(_.dataType match {
          case st: StructType => resolve(st, rest)
          case _ => None
        })
    }

  /** Replace the struct at `parentPath` (empty = top level) via `f`. */
  def updateAt(schema: StructType, parentPath: Seq[String],
      f: StructType => StructType): StructType =
    if (parentPath.isEmpty) f(schema)
    else StructType(schema.fields.map { fld =>
      if (fld.name != parentPath.head) fld
      else fld.dataType match {
        case st: StructType =>
          fld.copy(dataType = updateAt(st, parentPath.tail, f))
        case other => throw new IllegalArgumentException(
          s"${parentPath.head} is ${other.simpleString}, not a struct")
      }
    })

  /** Do two same-shaped types agree on every (nested) field name? */
  def congruentNames(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: StructType, y: StructType) =>
      x.fields.length == y.fields.length &&
        x.fields.zip(y.fields).forall { case (f, g) =>
          f.name == g.name && congruentNames(f.dataType, g.dataType)
        }
    case _ => true
  }

  /** Rename projection between two SAME-SHAPED fields (logical ⇄
    * physical, either direction): structs with differing nested names
    * are rebuilt field by field; identical subtrees pass through
    * untouched (keeping parquet nested-column pruning intact for
    * never-renamed structs). A null parent stays null — `struct()` of
    * children would otherwise fabricate a row of nulls. */
  def relabel(c: Column, from: StructField, to: StructField): Column =
    relabelType(c, from.dataType, to.dataType).as(to.name)

  private def relabelType(c: Column, from: DataType, to: DataType): Column =
    (from, to) match {
      case (fs: StructType, ts: StructType) if !congruentNames(fs, ts) =>
        val inner = struct(fs.fields.zip(ts.fields).map { case (ff, tf) =>
          relabelType(c.getField(ff.name), ff.dataType, tf.dataType)
            .as(tf.name)
        }.toSeq: _*)
        when(c.isNull, lit(null).cast(ts)).otherwise(inner)
      case _ => c
    }

  /** Align an incoming column to the target LOGICAL field: structs are
    * rebuilt so that subfields recorded as ADDED BY EVOLUTION backfill
    * null when the incoming frame predates them — any other missing
    * subfield fails loudly (a misspelled field must stay an error, the
    * same contract as top-level alignTo). Incoming extra subfields are
    * dropped, mirroring the top-level projection. */
  def align(tableName: String, c: Column, incoming: DataType,
      target: DataType, path: String, added: String => Boolean): Column =
    (incoming, target) match {
      case (is: StructType, ts: StructType) if is != ts =>
        val inner = struct(ts.fields.map { tf =>
          val sub = s"$path.${tf.name}"
          is.fields.find(_.name == tf.name) match {
            case Some(ifld) =>
              align(tableName, c.getField(tf.name), ifld.dataType,
                tf.dataType, sub, added).as(tf.name)
            case None =>
              require(added(sub),
                s"incoming data for table $tableName lacks nested field " +
                  s"$sub (only fields added by addNestedField may be omitted)")
              lit(null).cast(tf.dataType).as(tf.name)
          }
        }.toSeq: _*)
        when(c.isNull, lit(null).cast(ts)).otherwise(inner)
      case _ => c.cast(target)
    }

  /** (logicalPath, physicalPath) of every LEAF and struct node, by the
    * positional congruence of the two schemas. */
  def pathPairs(logical: StructType, physical: StructType): Seq[(String, String)] = {
    def walk(l: StructType, p: StructType, lp: String, pp: String)
        : Seq[(String, String)] =
      l.fields.zip(p.fields).flatMap { case (lf, pf) =>
        val lpath = if (lp.isEmpty) lf.name else s"$lp.${lf.name}"
        val ppath = if (pp.isEmpty) pf.name else s"$pp.${pf.name}"
        val below = (lf.dataType, pf.dataType) match {
          case (ls: StructType, ps: StructType) => walk(ls, ps, lpath, ppath)
          case _ => Nil
        }
        (lpath, ppath) +: below
      }
    walk(logical, physical, "", "")
  }
}
