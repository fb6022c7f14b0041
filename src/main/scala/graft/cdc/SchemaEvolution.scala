package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lossless type-widening schema evolution for CDC feeds.
  *
  * A long-lived pipeline sees its source columns widen (INT→BIGINT,
  * FLOAT→DOUBLE, DECIMAL(10,2)→DECIMAL(12,2)) and new columns appear.
  * The lake table must follow WITHOUT rewriting history: the stored
  * frame and the incoming batch are both cast up to the evolved
  * schema, and only provably lossless widenings are allowed —
  * anything else fails fast instead of silently truncating
  * (`ALTER TABLE … MODIFY COLUMN` semantics, minus the lossy cases).
  */
object SchemaEvolution {

  /** Is `from` → `to` a lossless widening? */
  def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b                   => true
    case (ByteType, ShortType | IntegerType | LongType)  => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType)            => true
    case (FloatType, DoubleType)            => true
    case (DateType, TimestampType | TimestampNTZType) => true
    case (a: DecimalType, b: DecimalType) =>
      b.scale >= a.scale && (b.precision - b.scale) >= (a.precision - a.scale)
    case (ByteType | ShortType | IntegerType | LongType, d: DecimalType) =>
      // integral → decimal with enough integer digits
      val need = from match {
        case ByteType => 3; case ShortType => 5; case IntegerType => 10; case _ => 20
      }
      (d.precision - d.scale) >= need
    case _ => false
  }

  /** The evolved schema of (stored, incoming): per shared column the
    * wider type (in whichever direction), new incoming columns
    * appended, stored-only columns kept. Throws on a column pair
    * widenable in neither direction (e.g. string vs long).
    */
  def evolve(stored: StructType, incoming: StructType): StructType = {
    val byName = incoming.fields.map(f => f.name -> f).toMap
    val merged = stored.fields.map { s =>
      byName.get(s.name) match {
        case None => s
        case Some(i) =>
          if (canWiden(i.dataType, s.dataType)) s
          else if (canWiden(s.dataType, i.dataType)) StructField(s.name, i.dataType, nullable = true)
          else throw new IllegalArgumentException(
            s"column ${s.name}: ${s.dataType.sql} and ${i.dataType.sql} are not widenable either way")
      }
    }
    val newCols = incoming.fields.filterNot(f => stored.fieldNames.contains(f.name))
      .map(f => f.copy(nullable = true))
    StructType(merged ++ newCols)
  }

  /** Cast a frame up to the evolved target schema: widen existing
    * columns (validated lossless), null-fill missing ones, keep the
    * target's column order. */
  def widenTo(df: DataFrame, target: StructType): DataFrame = {
    val present = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = target.fields.map { t =>
      present.get(t.name) match {
        case None => lit(null).cast(t.dataType).as(t.name)
        case Some(from) =>
          if (!canWiden(from, t.dataType)) throw new IllegalArgumentException(
            s"column ${t.name}: ${from.sql} → ${t.dataType.sql} is not a lossless widening")
          col(t.name).cast(t.dataType).as(t.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Widen-and-merge: evolve the union schema of (stored, changes),
    * cast both up, and run the latest-wins PK merge — the full
    * "source column widened mid-stream" path in one call.
    */
  def widenMerge(stored: DataFrame, changes: DataFrame, keyCols: Seq[String],
                 versionCols: Seq[String], deleteFlag: String): DataFrame = {
    val changesData = StructType(changes.schema.fields.filterNot(_.name == deleteFlag))
    val target = evolve(stored.schema, changesData)
    val s = widenTo(stored, target).withColumn(deleteFlag, lit(false))
    val c = widenTo(changes, StructType(target.fields :+ changes.schema(deleteFlag)))
    PkTable.snapshotMerge(s, c, keyCols, versionCols.map(col), col(deleteFlag))
      .drop(deleteFlag)
  }
}
