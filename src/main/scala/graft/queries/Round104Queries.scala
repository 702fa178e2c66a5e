package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Round-10 gates: the Auto-resolved curation pipeline.
  *
  * q109 hash-gates [[graft.pipelines.CorpusCuration]] with exact
  * postings and q530 with MinHash-LSH — both EXPLICIT choices, which
  * means the 100 TB user must already know which density regime their
  * corpus is in. `NearDupCandidates.Auto` removes that requirement: a
  * pre-flight posting-density probe (candidate pairs the exact
  * expansion would emit per posting row) picks the source per corpus,
  * with the cutoff placed between the measured regimes (SCALING.md
  * round 10: gate-class corpora probe ~5 pairs/posting where exact is
  * faster AND complete; the dense rungs probe 52–158 where exact goes
  * quadratic and LSH stays posting-linear).
  *
  * This gate runs the pipeline with Auto end to end — the probe
  * aggregate executes live inside the gate, resolves to ExactPostings
  * on the gate corpus (density an order of magnitude under the
  * cutoff), and the full audit frame must then hash-match q109's
  * oracle exactly. A probe regression (wrong density math, inverted
  * cutoff, resolution not applied) flips the candidate source and
  * breaks the hash on every near-dup the bands miss. The dense-corpus
  * side of the switch is pinned in CurationAutoSpec (a crafted corpus
  * above the cutoff must resolve to MinHashLsh and still verify
  * exactly); the oracle SQL is shared with q109 by reference so the
  * two gates can never drift apart.
  */
object Round104Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------ Auto-resolved curation
  private val q532 = QueryDef(
    "q532_curation_auto",
    (s, dir) => graft.pipelines.CorpusCuration.audit(
      t(s, dir, "documents"),
      graft.pipelines.CorpusCuration.Config(
        candidates = graft.pipelines.CorpusCuration.NearDupCandidates.Auto())),
    // fail FAST at object init if the shared oracle ever disappears (a
    // q109 rename or a switch to dynOracle): a silent None here would
    // downgrade this gate to the rows-only check and only CoverageDrift
    // in a full-suite run would notice
    Some(Round4Queries.all.find(_.name == "q109_curation_pipeline")
      .flatMap(_.oracle)
      .getOrElse(sys.error("q532 shares q109_curation_pipeline's oracle, which is missing"))),
    covers = Seq("T-curation-auto"))

  val all: Seq[QueryDef] = Seq(q532)
}
