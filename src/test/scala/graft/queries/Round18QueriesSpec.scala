package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-18 gate queries. */
class Round18QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("chi-square: full grid, non-negative statistic, V in [0,1]") {
    val row = graft.SparkEntry.queries("q206_chi_square")(spark, dir).head()
    val d = graft.Tables.load(spark, dir, "documents")
    val nSources = d.select("source").distinct().count()
    val nLangs = d.select("lang").distinct().count()
    assert(row.getAs[Long]("n_cells") === nSources * nLangs,
      "every (source, lang) cell must enter the statistic, observed or not")
    assert(row.getAs[Long]("dof") === (nSources - 1) * (nLangs - 1))
    assert(row.getAs[Double]("chi2") >= 0.0)
    val v = row.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0, s"Cramér's V out of range: $v")
  }

  test("chi-square is zero on a perfectly independent table") {
    import spark.implicits._
    // 2x2 grid with exact independence: o = rt*ct/N for every cell
    val d = Seq.fill(20)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    d.toDF("source", "lang").createOrReplaceTempView("documents_indep")
    // recompute the statistic inline with the same integer identity
    val obs = spark.table("documents_indep").groupBy("source", "lang").count()
    val chi = obs
      .join(obs.groupBy("source").agg(sum("count").as("rt")), "source")
      .join(obs.groupBy("lang").agg(sum("count").as("ct")), "lang")
      .crossJoin(obs.agg(sum("count").as("n")))
      .select(((col("count") * col("n") - col("rt") * col("ct")) *
        (col("count") * col("n") - col("rt") * col("ct"))).cast("double")
        .divide((col("rt") * col("ct") * col("n")).cast("double")).as("term"))
      .agg(sum("term")).head().getDouble(0)
    assert(chi === 0.0)
  }

  test("ks: bounded in [0,1], zero against itself") {
    val row = graft.SparkEntry.queries("q208_ks_statistic")(spark, dir).head()
    val ks = row.getAs[Double]("ks")
    assert(ks >= 0.0 && ks <= 1.0)
    assert(row.getAs[Long]("na") + row.getAs[Long]("nb") ===
      graft.Tables.load(spark, dir, "embeddings").count())
    // identical samples → every cross-multiplied gap is 0
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val s1 = Seq(1.0, 2.0, 2.0, 3.0)
    val both = s1.map(v => (0, v)) ++ s1.map(v => (1, v))
    val per = both.toDF("g", "score").groupBy("score")
      .agg(sum(when(col("g") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val maxGap = per
      .withColumn("gap", abs(sum(col("ca")).over(w) * s1.size
        - sum(col("cb")).over(w) * s1.size))
      .agg(max("gap")).head().getLong(0)
    assert(maxGap === 0L)
  }

  test("kappa: perfect agreement is 1, bounded above by 1") {
    val row = graft.SparkEntry.queries("q209_cohens_kappa")(spark, dir).head()
    val kappa = row.getAs[Double]("kappa")
    assert(kappa <= 1.0)
    assert(row.getAs[Long]("agree") <= row.getAs[Long]("n"))
    // agree == n forces kappa == 1 in the integer identity
    val n = row.getAs[Long]("n")
    val pe = row.getAs[Long]("pe_num")
    assert(((n * n - pe).toDouble / (n * n - pe).toDouble) === 1.0)
  }

  test("pr/f1 sweep: monotone recall, consistent confusion counts") {
    val out = graft.SparkEntry.queries("q210_pr_f1_sweep")(spark, dir).cache()
    assert(out.count() === 9)
    // recall can only fall as the threshold rises
    val recalls = out.orderBy("decile").select("recall")
      .collect().map(_.getDouble(0))
    assert(recalls.sliding(2).forall { case Array(a, b) => b <= a },
      "recall must be non-increasing in the threshold")
    // tp+fn is the positive count — identical at every threshold
    val posCounts = out.select((col("tp") + col("fn")).as("p"))
      .distinct().collect()
    assert(posCounts.length === 1)
    assert(out.filter(col("f1") < 0 || col("f1") > 1).isEmpty)
    out.unpersist()
  }

  test("assortativity is a correlation: in [-1, 1], symmetric sums") {
    val row = graft.SparkEntry.queries("q211_degree_assortativity")(spark, dir).head()
    val r = row.getAs[Double]("assortativity")
    assert(r >= -1.0 && r <= 1.0, s"assortativity out of range: $r")
    assert(row.getAs[Long]("m") % 2 === 0, "symmetrized edge list has even size")
  }

  test("auc: bounded, and a perfect separator scores exactly 1") {
    val out = graft.SparkEntry.queries("q207_auc_ranksum")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("auc") < 0 || col("auc") > 1).isEmpty)
    out.unpersist()

    // hand-built sanity: scores {1,2,3,4} with labels {0,0,1,1} → the
    // label-1 class is perfectly above → AUC 1; label-0 class → AUC 0
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Seq((0, 1.0), (0, 2.0), (1, 3.0), (1, 4.0)).toDF("label", "score")
    val ranked = e
      .withColumn("rk", rank().over(Window.orderBy("score")).cast("long"))
      .withColumn("ties", count(lit(1)).over(Window.partitionBy("score")))
      .withColumn("r2", lit(2L) * col("rk") + col("ties") - 1L)
    val n = ranked.count()
    val by = ranked.groupBy("label")
      .agg(count(lit(1)).as("np"), sum("r2").as("r2s"))
      .select(col("label"),
        ((col("r2s") - col("np") * (col("np") + 1)).cast("double") /
          (lit(2L) * col("np") * (lit(n) - col("np"))).cast("double")).as("auc"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(by(1) === 1.0 && by(0) === 0.0)
  }
}
