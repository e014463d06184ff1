package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark-side builder plus (when SQL-expressible) an
  * equivalent ANSI/DuckDB SQL oracle over the same parquet tables. The
  * driver's correctness gate runs both and hash-compares (see Verify).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])
