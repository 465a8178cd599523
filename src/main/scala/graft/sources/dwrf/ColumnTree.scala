package graft.sources.dwrf

import org.apache.spark.sql.types._

/** Pre-order column-id assignment over a Spark schema — the join key
  * between types, streams and stats (reference orc_proto.proto:76-96:
  * root struct = 0, children numbered pre-order).
  */
object ColumnTree {

  /** Number of column ids a type subtree occupies (itself + children). */
  def subtreeSize(dt: DataType): Int = dt match {
    case s: StructType => 1 + s.fields.map(f => subtreeSize(f.dataType)).sum
    case a: ArrayType => 1 + subtreeSize(a.elementType)
    case m: MapType => 1 + subtreeSize(m.keyType) + subtreeSize(m.valueType)
    case _ => 1
  }

  /** Total column count for a file schema (root struct included). */
  def columnCount(schema: StructType): Int = subtreeSize(schema)

  /** Column ids of each top-level field of `schema` (root = 0). */
  def topLevelIds(schema: StructType): Array[Int] = {
    val ids = new Array[Int](schema.fields.length)
    var next = 1
    var i = 0
    while (i < schema.fields.length) {
      ids(i) = next
      next += subtreeSize(schema.fields(i).dataType)
      i += 1
    }
    ids
  }

  /** Dotted path → (column id, type) for every struct-addressable field:
    * top-level fields plus every field reachable through struct nesting
    * (`st.ok`, `a.b.c`). Catalyst pushes nested-field predicates with
    * exactly these dotted names, and the writer records stats per column
    * id for nested columns too — this map joins the two so stripe/stride
    * skipping works below the top level. Array/map interiors have no
    * dotted address and are not emitted. On a (pathological) collision
    * between a nested path and a top-level column literally named
    * "st.ok", the top-level column wins — matching Spark's own
    * resolution order for unquoted names.
    */
  def pathIds(schema: StructType): Map[String, (Int, DataType)] = {
    val out = Map.newBuilder[String, (Int, DataType)]
    def walk(prefix: String, fields: Array[StructField], startId: Int): Unit = {
      var id = startId
      fields.foreach { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        out += path -> (id -> f.dataType)
        f.dataType match {
          case s: StructType => walk(path, s.fields, id + 1)
          case _ =>
        }
        id += subtreeSize(f.dataType)
      }
    }
    walk("", schema.fields, 1)
    // top-level names override nested paths on collision
    val top = schema.fields.map(_.name).zip(
      topLevelIds(schema).zip(schema.fields.map(_.dataType))).toMap
    out.result() ++ top
  }

  /** Mark the whole subtree of the field with column id `id` as included. */
  def includeSubtree(include: Array[Boolean], id: Int, dt: DataType): Unit = {
    include(id) = true
    var child = id + 1
    dt match {
      case s: StructType =>
        s.fields.foreach { f =>
          includeSubtree(include, child, f.dataType)
          child += subtreeSize(f.dataType)
        }
      case a: ArrayType => includeSubtree(include, child, a.elementType)
      case m: MapType =>
        includeSubtree(include, child, m.keyType)
        includeSubtree(include, child + subtreeSize(m.keyType), m.valueType)
      case _ =>
    }
  }
}
