package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader over the driver-provided TESTDATA layout
  * (`<sfDir>/<table>.parquet`). All queries read through here so that
  * column pruning / filter pushdown reach the parquet scans uniformly.
  *
  * `events.parquet` carries TIMESTAMP(NANOS) which Spark only reads as
  * Long (`spark.sql.legacy.parquet.nanosAsLong=true`, set by
  * [[graft.GraftSession]]); any Long-typed `ts`/`*date` column is
  * normalized to a microsecond TimestampType here. The testdata has no
  * sub-microsecond components, so the conversion is lossless.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == LongType && (f.name == "ts" || f.name.endsWith("date")))
        // integral `div`, not `/`: double division loses precision above
        // 2^53 and epoch-nanos (~1.7e18) would round to the wrong micro.
        d.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
      else d
    }
  }
}
