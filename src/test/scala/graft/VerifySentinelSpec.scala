package graft

/** Executes Verify's dynamic-oracle failure sentinel — the path that
  * never fires in a healthy round but is load-bearing for q45/q106's
  * hash-gated status: if a model render ever fails, the sentinel SQL
  * (not a silent omission) must reach oracle_sql.json so the driver
  * reports the gate RED instead of downgrading it to a rows-only
  * check that still reads green.
  */
class VerifySentinelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("a render failure yields the loud one-column sentinel, quotes escaped") {
    val sql = Verify.renderDynOracle("q_fake",
      (_, _) => throw new IllegalStateException("model returned NaN 'centroid'"),
      spark, dir)
    assert(sql.contains("dyn_oracle_render_error"),
      "sentinel lost its marker column — the driver could not tell the gate failed")
    assert(sql.startsWith("SELECT '"),
      "sentinel must be standalone valid SQL (no table refs that could also fail)")
    assert(sql.contains("model returned NaN ''centroid''"),
      "failure message must survive with SQL-escaped quotes")
  }

  test("a null-message failure still renders valid SQL") {
    val sql = Verify.renderDynOracle("q_fake",
      (_, _) => throw new NullPointerException(),
      spark, dir)
    assert(sql.contains("dyn_oracle_render_error"),
      "sentinel lost its marker column on a null-message exception")
    assert(sql.contains("render failed: null"),
      "String.valueOf must keep a null message printable")
  }

  test("a healthy render passes through untouched") {
    val sql = Verify.renderDynOracle("q_fake",
      (_, d) => s"SELECT 1 AS ok FROM read_parquet('$d/region.parquet')",
      spark, dir)
    assert(sql == s"SELECT 1 AS ok FROM read_parquet('$dir/region.parquet')")
  }
}
