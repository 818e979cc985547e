package graft.core

import org.apache.spark.sql.types.{MapType, StringType}

/** Shared schema for the JSON-string round-trip that keeps tag maps out
 *  of aggregation buffers (map-typed buffers force SortAggregate; the
 *  string form keeps plans on HashAggregate). */
object TagsJson {
  val MapSchema: MapType = MapType(StringType, StringType)
}
