package graft
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.localSession(cpus)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${util.Json.quote(k)}: ${util.Json.quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Two-backend dump of the pipeline operators' relational re-expressions
    // (VERDICT r6 #3): for each PipelineRelational.prql entry, write the
    // DataFrame-fold result and the SQL-text-backend result side by side;
    // tools/compare.py diffs them against each other AND the operator's own
    // output above. The catalog views are re-registered first — the
    // pipeline runs in the main loop rebound them to raw parquet.
    for (t <- Seq("documents", "events", "embeddings"))
      try Graft.parquetCatalog(spark, sfDir)(t).createOrReplaceTempView(t)
      catch { case e: Throwable =>
        System.err.println(s"[verify] relback view $t failed: ${e.getMessage}")
      }
    pipeline.PipelineRelational.registerKernels(spark)
    // the relational texts hardcode default knobs; pin the session to
    // defaults so the dump is comparable to the operators' (ADVICE r8)
    pipeline.PipelineRelational.pinDefaults(spark)
    pipeline.PipelineRelational.prql.foreach { case (name, prql) =>
      try {
        Graft.compileDir(prql, spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/relback/${name}__df")
        spark.sql(Graft.toSparkSql(prql)).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/relback/${name}__sql")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] relback $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
