package graft.sources

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.DbSource._

/** Pins the S9 contracts (reference database.py:35-89): backend
  * autoselect (host AND password → Postgres, else local fallback),
  * env defaults, the 30 s·n linear-backoff connect retry with loud
  * final failure, and the local-store read/write roundtrip.
  */
class DbSourceSpec extends AnyFunSuite {

  private def env(m: Map[String, String]): String => Option[String] = m.get

  test("autoselect: host AND password present selects Postgres with env defaults") {
    val b = chooseBackend(env(Map(
      "AWS_RDS_HOST" -> "db.example.internal",
      "AWS_RDS_PASSWORD" -> "pw")))
    assert(b == Postgres(PgConfig(
      "db.example.internal", 5432, "postgres", "postgres", "pw")))
  }

  test("autoselect: explicit port/dbname/user override the defaults") {
    val b = chooseBackend(env(Map(
      "AWS_RDS_HOST" -> "h", "AWS_RDS_PASSWORD" -> "pw",
      "AWS_RDS_PORT" -> "5433", "AWS_RDS_DBNAME" -> "rail",
      "AWS_RDS_USER" -> "etl")))
    assert(b == Postgres(PgConfig("h", 5433, "rail", "etl", "pw")))
  }

  test("autoselect: missing host OR password falls back to the local store") {
    assert(chooseBackend(env(Map("AWS_RDS_HOST" -> "h")), "r") == LocalStore("r"))
    assert(chooseBackend(env(Map("AWS_RDS_PASSWORD" -> "pw")), "r") == LocalStore("r"))
    assert(chooseBackend(env(Map.empty), "r") == LocalStore("r"))
  }

  test("jdbc url carries sslmode=require (the reference's ssl_context=True)") {
    assert(PgConfig("h", 5432, "d", "u", "pw").url ==
      "jdbc:postgresql://h:5432/d?sslmode=require")
  }

  test("connect retry: 30s/60s linear backoff, then success") {
    val sleeps = ArrayBuffer.empty[Long]
    var calls = 0
    val got = connectWithRetry(
      () => { calls += 1; if (calls < 3) throw new RuntimeException("cold") else "conn" },
      sleep = sleeps += _)
    assert(got == "conn" && calls == 3)
    assert(sleeps.toSeq == Seq(30000L, 60000L))
  }

  test("connect retry: exhaustion rethrows the last failure, no sleep after it") {
    val sleeps = ArrayBuffer.empty[Long]
    var calls = 0
    val e = intercept[RuntimeException] {
      connectWithRetry(
        () => { calls += 1; throw new RuntimeException(s"fail$calls") },
        sleep = sleeps += _)
    }
    assert(e.getMessage == "fail3" && calls == 3)
    assert(sleeps.toSeq == Seq(30000L, 60000L))
  }

  test("local backend: write/read roundtrip; absent table reads empty") {
    val spark = SparkSpec.session
    import spark.implicits._
    val root = Files.createTempDirectory("graft-db-local").toString
    val b = LocalStore(root)
    assert(DbSource.read(spark, b, "absent").isEmpty)
    DbSource.write(spark, b, "t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(DbSource.read(spark, b, "t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq(1L -> "a", 2L -> "b"))
  }

  test("local backend: absent table with schemaIfAbsent is an empty TYPED table") {
    val spark = SparkSpec.session
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-db-schema").toString
    val b = LocalStore(root)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val df = DbSource.read(spark, b, "absent", schema)
    assert(df.schema == schema)
    // the fresh-SQLite contract: downstream column references resolve
    assert(df.filter(org.apache.spark.sql.functions.col("id") > 0).count() == 0L)
    // a PRESENT table ignores the fallback schema and reads as stored
    DbSource.write(spark, b, "t2",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(7L, "x"))), schema))
    assert(DbSource.read(spark, b, "t2", schema).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq(7L -> "x"))
  }
}
