package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg (dev only; the driver passes 2): comma-separated
    // query names — dump and list only those, for fast local iteration
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def selected(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the shared engine baseline (SessionDefaults), so the dumped
    // results come from the same planning policy Bench times —
    // round 11 flagged the bench-only preferSortMergeJoin as a
    // per-entry-point divergence
    val spark = SessionDefaults.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name))
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
    // Dynamic oracles (ANN gates) render here, AFTER the query dump:
    // their SQL inlines the trained model from the per-JVM cache
    // (graft.similarity.TrainedModels), so dump and oracle share one
    // training run and training's ulp jitter cannot split them.
    val dynSql = SparkEntry.dynamicOracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, f) => k -> renderDynOracle(k, f, spark, sfDir) }
    val json = (SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) } ++ dynSql)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  /** Render one dynamic oracle, failing LOUD on error: omitting the
    * entry would downgrade the gate to a rows-only driver check that
    * still reads green. The sentinel is valid DuckDB SQL whose
    * one-column schema can never match the gate dump, so the driver
    * reports the gate red and names the render failure. Extracted so
    * VerifySentinelSpec can execute the failure path (it never fires
    * in a healthy round).
    */
  def renderDynOracle(
      name: String,
      f: (SparkSession, String) => String,
      spark: SparkSession,
      sfDir: String): String =
    try f(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] dyn oracle $name failed: ${e.getMessage}")
      "SELECT 'graft Verify: dynamic oracle render failed: " +
        String.valueOf(e.getMessage).replace("'", "''") +
        "' AS dyn_oracle_render_error"
    }
}
