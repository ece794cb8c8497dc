package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ObjectNode, TextNode}
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Recursive trace scrubber.
  *
  * Behavior mirror of `traces/tools/scrub.jq:2-40`: walking an
  * arbitrary query-info JSON document,
  *   - `splitInfo.path` and any `tableLocation` string are redacted,
  *   - `remoteUserAddress` and `self` fields are deleted,
  *   - every string-valued field that looks like an ISO timestamp is
  *     deleted (the jq version deletes all ISO-timestamp-valued keys).
  * Output is canonical: object keys sorted, compact separators — so
  * scrubbing is deterministic and idempotent (property-tested).
  *
  * Uses Jackson (already on the Spark classpath) via a UDF; trace
  * volumes are tiny relative to the query workload.
  */
object JsonScrub {
  private val Redacted = "[redacted]"
  private val DropKeys = Set("remoteUserAddress", "self")
  private val RedactKeys = Set("tableLocation", "path")
  private val IsoTs =
    """^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}(:?\d{2})?)?$""".r

  private val mapper = {
    val m = new ObjectMapper()
    m.configure(
      com.fasterxml.jackson.databind.SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS,
      true)
    m
  }

  private def scrubNode(node: JsonNode, parentKey: String): JsonNode =
    node match {
      case obj: ObjectNode =>
        val out = mapper.createObjectNode()
        // sorted keys → canonical output
        obj.properties().asScala.toSeq.map(e => e.getKey -> e.getValue)
          .sortBy(_._1)
          .foreach { case (k, v) =>
            if (DropKeys.contains(k)) ()                // delete
            else if (RedactKeys.contains(k) && v.isTextual &&
              (k != "path" || parentKey == "splitInfo"))
              out.set[JsonNode](k, new TextNode(Redacted))
            else if (v.isTextual && IsoTs.matches(v.asText())) ()
            else out.set[JsonNode](k, scrubNode(v, k))
          }
        out
      case arr if arr.isArray =>
        val out = mapper.createArrayNode()
        arr.elements().asScala.foreach(e => out.add(scrubNode(e, parentKey)))
        out
      case leaf => leaf
    }

  def scrub(json: String): String =
    try mapper.writeValueAsString(scrubNode(mapper.readTree(json), ""))
    catch { case _: Exception => null }

  def register(spark: SparkSession): Unit =
    spark.udf.register("scrub_json", (s: String) => scrub(s))
}
