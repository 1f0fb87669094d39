package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("scratch")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("created_at", TimestampType),
      StructField("updated_at", TimestampType),
      StructField("document_id", StringType),
      StructField("text", StringType),
      StructField("embedding", ArrayType(DoubleType)),
      StructField("metadata", StringType),
      StructField("chunk_index", IntegerType)))

    val df = spark.read.schema(schema).option("multiLine", true)
      .json("fixtures/refstore/chunks")
    df.show(3, truncate = 40)
    df.select(col("id"), col("created_at"), col("metadata")).show(3, truncate = 60)

    val withVar = df.select(col("id"),
      expr("cast(parse_json(metadata) AS map<string, variant>)").as("m"))
    withVar.select(col("id"),
      expr("transform_values(m, (k, v) -> schema_of_variant(v))").as("types"))
      .show(5, truncate = 80)

    val enc = withVar.select(col("id"), expr(
      """transform_values(m, (k, v) -> CASE
        |  WHEN schema_of_variant(v) = 'STRING' THEN concat('s:', cast(v as string))
        |  WHEN schema_of_variant(v) = 'BOOLEAN' THEN concat('b:', cast(v as string))
        |  WHEN schema_of_variant(v) IN ('TINYINT','SMALLINT','INT','BIGINT')
        |    THEN concat('i:', cast(cast(v as long) as string))
        |  WHEN schema_of_variant(v) = 'DOUBLE' OR schema_of_variant(v) LIKE 'DECIMAL%'
        |    THEN concat('f:', cast(cast(v as double) as string))
        |  ELSE raise_error(concat('unsupported metadata type ', schema_of_variant(v)))
        |END)""".stripMargin).as("meta"))
    enc.show(8, truncate = 80)
    println("null metadata rows: " + df.where(col("metadata").isNull).count())
  }
}
