package graft.etl

import org.apache.spark.sql.types._

/** E39 — schema-compatibility contract checker: can data written with
  * `writer` be read by a consumer expecting `reader`? The
  * producer/consumer handshake every pipeline boundary needs BEFORE a
  * deploy, as a checkable function instead of a code review: IO10
  * proves the engine's runtime behaviors (mergeSchema nulls, JDBC
  * ALTER, loud type rejects); this is the static rule set a CI gate
  * runs against a proposed schema change.
  *
  * Rules (the parquet/Avro-resolution consensus):
  *   - a reader field missing from the writer is OK only if nullable
  *     (it reads NULL) — a required field missing is a break;
  *   - writer fields the reader ignores are always OK (projection);
  *   - identical types are OK; integral/fractional WIDENING
  *     (byte→short→int→long, float→double, int→long→double) is OK;
  *     narrowing or cross-family changes are breaks;
  *   - nested structs recurse; arrays/maps compare element-wise;
  *   - a nullable writer field feeding a non-nullable reader
  *     expectation is a break (NULLs would violate the contract).
  * Every violation is reported with its full field path — the checker
  * returns ALL of them, not the first. */
object SchemaCompat {

  final case class Violation(path: String, reason: String)

  private val widenChains: Map[DataType, Set[DataType]] = Map(
    ByteType -> Set(ShortType, IntegerType, LongType, DoubleType),
    ShortType -> Set(IntegerType, LongType, DoubleType),
    IntegerType -> Set(LongType, DoubleType),
    LongType -> Set(DoubleType),
    FloatType -> Set(DoubleType))

  private def typeOk(w: DataType, r: DataType, path: String,
      acc: List[Violation]): List[Violation] = (w, r) match {
    case (a, b) if a == b => acc
    case (a: StructType, b: StructType) => check(a, b, path, acc)
    case (ArrayType(we, wn), ArrayType(re, rn)) =>
      val nul = if (wn && !rn)
        Violation(s"$path[]", "writer elements may be null; reader " +
          "requires non-null") :: acc
      else acc
      typeOk(we, re, s"$path[]", nul)
    case (MapType(wk, wv, wn), MapType(rk, rv, rn)) =>
      val nul = if (wn && !rn)
        Violation(s"$path{}", "writer values may be null; reader " +
          "requires non-null") :: acc
      else acc
      typeOk(wv, rv, s"$path{}", typeOk(wk, rk, s"$path{key}", nul))
    case (a, b) if widenChains.get(a).exists(_.contains(b)) => acc
    case (a, b) =>
      Violation(path, s"incompatible type change ${a.sql} -> ${b.sql} " +
        "(only widening within a numeric family is readable)") :: acc
  }

  private def check(writer: StructType, reader: StructType, prefix: String,
      acc0: List[Violation]): List[Violation] = {
    val wByName = writer.fields.map(f => f.name.toLowerCase -> f).toMap
    reader.fields.foldLeft(acc0) { (acc, rf) =>
      val path = if (prefix.isEmpty) rf.name else s"$prefix.${rf.name}"
      wByName.get(rf.name.toLowerCase) match {
        case None =>
          if (rf.nullable) acc // reads NULL — the mergeSchema contract
          else Violation(path,
            "required by the reader but absent from the writer") :: acc
        case Some(wf) =>
          val nul = if (wf.nullable && !rf.nullable)
            Violation(path, "writer may produce NULL; reader requires " +
              "non-null") :: acc
          else acc
          typeOk(wf.dataType, rf.dataType, path, nul)
      }
    }
  }

  /** All compatibility violations, writer → reader; empty = safe. */
  def violations(writer: StructType, reader: StructType): Seq[Violation] =
    check(writer, reader, "", Nil).reverse

  def canRead(writer: StructType, reader: StructType): Boolean =
    violations(writer, reader).isEmpty
}
