package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg (dev only, driver passes two): comma-separated
    // key subset for a fast re-check of just-changed operators
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the SHARED session builder — same extensions (TopKPerKey), same
    // parquet/timestamp semantics (incl. inferTimestampNTZ=false, which
    // the r10 driver testdata regeneration made load-bearing), same AQE
    // configs the bench runs under: verify what you bench
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      // saveAsTable output (the shingle layout below) stays out of the repo
      .config("spark.sql.warehouse.dir",
        graft.GraftSession.scratchDir("graft-verify-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // r14 advice: the q_hits oracle always replays the DEFAULT quantum
    // (m = 1e9); a correctness dump run with the conf set would produce
    // a false q_hits mismatch. A mixed-quantum compare pair must be
    // impossible by construction, not by comment.
    require(spark.conf.getOption("spark.graft.hits.quantum").isEmpty,
      "verify: spark.graft.hits.quantum must be UNSET for a correctness " +
        "dump (the DuckDB oracle replays the default m=1e9)")
    new java.io.File(outDir).mkdirs()
    // Materialize the shingle layout so the dedup family is checked over
    // the SAME path the bench times (tokenize paid once, consumers
    // tokenizer-free). Any failure falls back to the raw-scan path — the
    // queries are proven result-identical both ways (WarehouseSpec).
    try operators.Warehouse.materializeShingles(spark, sfDir, buckets = cpus.toInt)
    catch { case e: Throwable =>
      System.err.println(s"[verify] shingle layout skipped: ${e.getMessage}")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
