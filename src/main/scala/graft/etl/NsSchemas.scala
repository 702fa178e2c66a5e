package graft.etl

import org.apache.spark.sql.types._

/** Schemas for the NS disruption domain (FIXTURES.md §1-§6; reference
  * `src/storage/schema.sql` + observed `data/raw` JSON payloads).
  *
  * The raw schema is explicit — never inferred — so tests are stable
  * and absent fields surface as typed nulls (the reference's
  * "column may be absent" dynamism, `cleaners.py:70-116`).
  */
object NsSchemas {

  private val stationStruct = StructType(Seq(
    StructField("coordinate", StructType(Seq(
      StructField("lat", DoubleType), StructField("lng", DoubleType)))),
    StructField("countryCode", StringType),
    StructField("name", StringType),
    StructField("stationCode", StringType),
    StructField("uicCode", StringType)))

  /** Raw NS API disruption record — the fields the cleaner touches
    * plus commonly present metadata (FIXTURES.md §1).
    */
  val raw: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("start", StringType),
    StructField("end", StringType),
    StructField("isActive", BooleanType),
    StructField("topic", StringType),
    StructField("local", BooleanType),
    StructField("url", StringType),
    StructField("priority", StringType),
    StructField("lastUpdated", StringType),
    StructField("registrationTime", StringType),
    StructField("releaseTime", StringType),
    StructField("period", StringType),
    StructField("phase", StructType(Seq(
      StructField("id", StringType), StructField("label", StringType)))),
    StructField("impact", StructType(Seq(StructField("value", LongType)))),
    StructField("expectedDuration", StructType(Seq(
      StructField("description", StringType),
      StructField("endTime", StringType)))),
    // Probed by the cleaner but absent in real payloads (stations
    // actually live under publicationSections) — kept in the schema so
    // the faithful lookup path resolves to typed nulls (SURVEY P8).
    StructField("section", StructType(Seq(
      StructField("direction", StringType),
      StructField("stations", ArrayType(stationStruct))))),
    StructField("publicationSections", ArrayType(StructType(Seq(
      StructField("sectionType", StringType),
      StructField("section", StructType(Seq(
        StructField("direction", StringType),
        StructField("stations", ArrayType(stationStruct))))))))),
    StructField("timespans", ArrayType(StructType(Seq(
      StructField("start", StringType),
      StructField("end", StringType),
      StructField("period", StringType),
      StructField("situation", StructType(Seq(
        StructField("label", StringType),
        StructField("stations", ArrayType(StructType(Seq(
          StructField("stationCode", StringType)))))))),
      StructField("cause", StructType(Seq(StructField("label", StringType))))))))))

  /** Cleaned `disruptions` fact table (schema.sql:15-35 +
    * cleaners.py:255-264 column order).
    */
  val cleaned: StructType = StructType(Seq(
    StructField("disruption_id", StringType, nullable = false),
    StructField("type", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("start_time", TimestampType),
    StructField("end_time", TimestampType),
    StructField("duration_minutes", DoubleType),
    StructField("impact_level", IntegerType),
    StructField("affected_stations", StringType),
    StructField("is_resolved", BooleanType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)))

  /** `stations` dimension seed (schema.sql:38-45,79-86). */
  val stationSeed: Seq[(String, String, Double, Double, String)] = Seq(
    ("ASD", "Amsterdam Centraal", 52.3791, 4.9003, "NL"),
    ("UTR", "Utrecht Centraal", 52.0894, 5.1101, "NL"),
    ("RTD", "Rotterdam Centraal", 51.9249, 4.4690, "NL"),
    ("EHV", "Eindhoven Centraal", 51.4433, 5.4814, "NL"),
    ("GVC", "Den Haag Centraal", 52.0808, 4.3247, "NL"),
    ("LEDN", "Leiden Centraal", 52.1664, 4.4817, "NL"))
}
