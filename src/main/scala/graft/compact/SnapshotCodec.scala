package graft.compact

import com.fasterxml.jackson.core.JsonGenerator
import com.fasterxml.jackson.core.util.{DefaultIndenter, DefaultPrettyPrinter}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** JSON (de)serialization for [[SnapshotMeta]] using Jackson (ships inside
  * Spark — the offline build resolves nothing new).
  *
  * The wire format pair-encodes maps: `databases` and `tables` are arrays
  * of `[id, value]` 2-tuples (README.md:82-104; destructured at
  * kompactor.ts:190-191). Jackson's tree model handles the heterogeneous
  * tuples; codegen'd data-binding cannot, hence the hand round-trip.
  * Unknown top-level fields are preserved verbatim so a rewrite is faithful
  * for documents richer than the spec.
  */
object SnapshotCodec {
  private val mapper = new ObjectMapper()

  /** Byte-exact `JSON.stringify(value, null, 2)` formatting
    * (kompactor.ts:309): `": "` key separator (Jackson's default is
    * `" : "`), every array element on its own 2-space-indented line
    * (Jackson's default inlines arrays), empty containers as `[]`/`{}`
    * (not `[ ]`). Number VALUES above 2^53 are where we deliberately
    * diverge: the reference's JS renderer rounds them through a double
    * (bug 1, SURVEY §7.4); Longs here print exactly. */
  private class StringifyPrinter extends DefaultPrettyPrinter {
    indentArraysWith(DefaultIndenter.SYSTEM_LINEFEED_INSTANCE)
    indentObjectsWith(DefaultIndenter.SYSTEM_LINEFEED_INSTANCE)
    override def createInstance(): DefaultPrettyPrinter = new StringifyPrinter
    override def writeObjectFieldValueSeparator(g: JsonGenerator): Unit =
      g.writeRaw(": ")
    override def writeEndArray(g: JsonGenerator, nrOfValues: Int): Unit = {
      if (!_arrayIndenter.isInline) _nesting -= 1
      if (nrOfValues > 0) _arrayIndenter.writeIndentation(g, _nesting)
      g.writeRaw(']')
    }
    override def writeEndObject(g: JsonGenerator, nrOfEntries: Int): Unit = {
      if (!_objectIndenter.isInline) _nesting -= 1
      if (nrOfEntries > 0) _objectIndenter.writeIndentation(g, _nesting)
      g.writeRaw('}')
    }
  }

  def parse(json: String): SnapshotMeta = {
    val root = mapper.readTree(json)
    SnapshotMeta(
      writer_id = root.path("writer_id").asText(),
      parquet_size_bytes = root.path("parquet_size_bytes").asLong(),
      row_count = root.path("row_count").asLong(),
      min_time = root.path("min_time").asLong(),
      max_time = root.path("max_time").asLong(),
      databases = root.path("databases").elements.asScala.map { pair =>
        val dbId = pair.get(0).asLong()
        val tables = pair.get(1).path("tables").elements.asScala.map { tp =>
          val tableId = tp.get(0).asLong()
          val files = tp.get(1).elements.asScala.map(parseFile).toVector
          TableFiles(tableId, files)
        }.toVector
        DbTables(dbId, tables)
      }.toVector)
  }

  private def parseFile(n: JsonNode): FileMeta = FileMeta(
    id = n.path("id").asLong(),
    path = n.path("path").asText(),
    size_bytes = n.path("size_bytes").asLong(),
    row_count = n.path("row_count").asLong(),
    chunk_time = n.path("chunk_time").asLong(),
    min_time = n.path("min_time").asLong(),
    max_time = n.path("max_time").asLong())

  /** Pretty 2-space render mirroring the reference's
    * `JSON.stringify(..., null, 2)` output shape (kompactor.ts:309). */
  def render(m: SnapshotMeta): String = {
    val root = mapper.createObjectNode()
    root.put("writer_id", m.writer_id)
    root.put("parquet_size_bytes", m.parquet_size_bytes)
    root.put("row_count", m.row_count)
    root.put("min_time", m.min_time)
    root.put("max_time", m.max_time)
    val dbs = root.putArray("databases")
    m.databases.foreach { db =>
      val pair = dbs.addArray()
      pair.add(db.dbId)
      val obj = pair.addObject()
      val tables = obj.putArray("tables")
      db.tables.foreach { t =>
        val tp = tables.addArray()
        tp.add(t.tableId)
        val fs = tp.addArray()
        t.files.foreach(f => fs.add(renderFile(f)))
      }
    }
    mapper.writer(new StringifyPrinter).writeValueAsString(root)
  }

  private def renderFile(f: FileMeta): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("id", f.id)
    n.put("path", f.path)
    n.put("size_bytes", f.size_bytes)
    n.put("row_count", f.row_count)
    n.put("chunk_time", f.chunk_time)
    n.put("min_time", f.min_time)
    n.put("max_time", f.max_time)
    n
  }
}
