package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Bridge to Spark's internal Jackson JSON→InternalRow parser, used by
  * the Jira DSv2 source to decode REST response bodies inside a
  * PartitionReader (the same machinery Spark's own JSON file source
  * uses). Lives under org.apache.spark.sql.* for package-private
  * access.
  */
object JsonBridge {

  /** Parse one JSON document into InternalRows for `schema`. */
  def parseJson(schema: StructType, json: String): Seq[InternalRow] = {
    val parser = new JacksonParser(
      schema,
      new JSONOptions(Map.empty[String, String], "UTC"),
      allowArrayAsStructs = true,
      Nil
    )
    parser
      .parse[String](json, CreateJacksonParser.string, UTF8String.fromString)
      .toSeq
  }
}
