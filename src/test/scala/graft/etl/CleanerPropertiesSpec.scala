package graft.etl

import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants over the cleaner (SURVEY §5.2.5):
  * generated raw records of every shape must satisfy the output
  * contract regardless of field combinations. Samples are drawn with
  * fixed seeds so failures reproduce.
  */
class CleanerPropertiesSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val clock = Clock(Instant.parse("2026-02-14T11:18:10Z"))

  private val genType: Gen[String] = Gen.oneOf(
    "verstoring", "werkzaamheden", "calamiteit", "storing",
    "DISRUPTION", "MAINTENANCE", "CALAMITY", "cancellation", "weird", "")

  private val genTs: Gen[Option[String]] = Gen.oneOf(
    Gen.const(None),
    Gen.const(Some("not-a-timestamp")),
    Gen.chooseNum(0, 86000).map(s =>
      Some(f"2026-02-14T${s / 3600}%02d:${s / 60 % 60}%02d:${s % 60}%02d+0100")))

  private case class RawRec(id: Option[String], typ: String,
      title: Option[String], start: Option[String], end: Option[String])

  private val genRec: Gen[RawRec] = for {
    id <- Gen.option(Gen.alphaNumStr.map(_.take(10)))
    t <- genType
    title <- Gen.option(Gen.alphaStr.map(_.take(30)))
    st <- genTs
    en <- genTs
  } yield RawRec(id, t, title, st, en)

  private def toJson(r: RawRec): String = {
    def q(o: Option[String], k: String) =
      o.map(v => s""""$k":"${v.replace("\"", "")}"""").toList
    (q(r.id, "id") ++ List(s""""type":"${r.typ}"""") ++
      q(r.title, "title") ++ q(r.start, "start") ++ q(r.end, "end"))
      .mkString("{", ",", "}")
  }

  test("invariants hold for arbitrary record batches") {
    samples(Gen.listOfN(30, genRec), 5).foreach { recs =>
      import spark.implicits._
      val raw = spark.read.schema(NsSchemas.raw)
        .json(recs.map(toJson).toDS)
      val out = DisruptionCleaner.clean(raw, clock).cache()

      // P9: no null ids survive; row count = rows with non-null id.
      assert(out.filter(col("disruption_id").isNull).count() == 0)
      assert(out.count() == raw.filter(col("id").isNotNull).count())

      // P7/P10: impact always within [1,5].
      assert(out.filter(col("impact_level") < 1 || col("impact_level") > 5)
        .count() == 0)

      // P5: end_time never null (parsed or imputed).
      assert(out.filter(col("end_time").isNull).count() == 0)

      // P6: duration null ⇔ start null (end is always imputed), and
      // never negative.
      assert(out.filter(col("duration_minutes").isNull =!=
        col("start_time").isNull && col("duration_minutes").isNotNull &&
        col("duration_minutes") < 0).count() == 0)
      assert(out.filter(col("duration_minutes") < 0).count() == 0)

      // P3: no titles shorter than 5 chars survive as non-null.
      assert(out.filter(length(col("title")) < 5).count() == 0)

      // P2: types are lowercase.
      assert(out.filter(col("type") =!= lower(col("type"))).count() == 0)
      out.unpersist()
    }
  }

  test("calamity and cancel types always map to impact 5") {
    samples(Gen.zip(genTs, genTs), 5).foreach { case (st, en) =>
      import spark.implicits._
      val recs = Seq(
        RawRec(Some("a"), "calamiteit", Some("Calamiteit ergens"), st, en),
        RawRec(Some("b"), "cancellation", Some("Cancelled thing"), st, en))
      val raw = spark.read.schema(NsSchemas.raw).json(recs.map(toJson).toDS)
      val impacts = DisruptionCleaner.clean(raw, clock)
        .select("impact_level").collect().map(_.getInt(0)).toSeq
      assert(impacts == Seq(5, 5))
    }
  }
}
