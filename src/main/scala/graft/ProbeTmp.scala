package graft
import org.apache.spark.sql.SparkSession

/** Temporary portability probe — deleted after pipeline ops are built. */
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    spark.sql(
      """SELECT CAST(conv(substr(md5('abc'),1,8),16,10) AS BIGINT) AS hexparse,
        |       md5('hello world') AS m,
        |       hex(encode('ab','UTF-8')) AS hx,
        |       length(encode('abc','UTF-8')) AS octet,
        |       regexp_extract_all('ab 12 cd!', '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0) AS toks,
        |       split(trim('  a  b c '), '\\s+') AS words
        |""".stripMargin).show(false)

    // left-fold dot product on real embeddings: print exact bits for first
    // few query x candidate pairs to diff against DuckDB list_reduce
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    emb.createOrReplaceTempView("emb")
    val r = spark.sql(
      """SELECT a.vec_id ia, b.vec_id ib,
        |  aggregate(zip_with(a.embedding, b.embedding,
        |              (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |            CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS dot
        |FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 2 AND b.vec_id < 4
        |ORDER BY ia, ib""".stripMargin)
    r.collect().foreach { row =>
      println(s"DOT ${row.getLong(0)} ${row.getLong(1)} ${java.lang.Double.doubleToLongBits(row.getDouble(2))} ${row.getDouble(2)}")
    }
    spark.stop()
  }
}
