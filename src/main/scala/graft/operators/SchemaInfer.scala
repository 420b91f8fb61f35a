package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Schema inference endpoint (reference pkg/api/schema_handler.go:160-249):
  * sample the latest N documents, union their field/type sets, and
  * recursively flatten nested fields to dot paths.
  *
  * Spark's JSON schema inference replaces the hand-rolled type mapper;
  * the dot-path flattening walk is the same recursion the reference
  * does over `bson.M`, applied to a StructType instead.
  */
object SchemaInfer {

  /** Reference type names (schema_handler.go:228-249). */
  def typeName(dt: DataType): String = dt match {
    case LongType | IntegerType => "int"
    case DoubleType | FloatType => "float"
    case StringType             => "string"
    case BooleanType            => "bool"
    case TimestampType | DateType => "date"
    case _: ArrayType           => "array"
    case _: StructType          => "object"
    case _                      => dt.simpleString
  }

  /** Recursive dot-path flatten of a schema (schema_handler.go:160-225);
    * struct fields recurse, everything else emits (path, type). */
  def flatten(schema: StructType, prefix: String = ""): Seq[(String, String)] =
    schema.fields.toSeq.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case st: StructType => (path, "object") +: flatten(st, path)
        case dt             => Seq((path, typeName(dt)))
      }
    }

  /** Infer the schema of a JSON document column from the latest N rows
    * (the reference samples 10 by natural order descending). */
  def inferJsonColumn(spark: SparkSession, docs: DataFrame, jsonCol: String,
      orderCol: String, n: Int = 10): StructType = {
    val sample = docs.orderBy(col(orderCol).desc).limit(n)
      .select(col(jsonCol)).collect().map(_.getString(0))
    spark.read.json(spark.createDataset(sample.toSeq)(
      org.apache.spark.sql.Encoders.STRING)).schema
  }

  /** Oracle-checked query: infer events.props' schema from the latest
    * 10 events and emit (field, type) rows — plus the flattened
    * dot-paths of the canonical change-event payload, exercising the
    * nested walk. */
  def inferEventDoc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val inferred = inferJsonColumn(spark, Tables(spark, dir, "events"), "props", "event_id")
    val nested = StructType(Seq(
      StructField("key", LongType),
      StructField("after", StructType(Seq(
        StructField("value", DoubleType),
        StructField("props", inferred))))))
    flatten(nested).toDF("field", "type")
  }
}
