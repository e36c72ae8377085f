package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/** Shared local SparkSession for connector specs. */
trait SparkFixture extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = SparkFixture.session

  override def afterAll(): Unit = super.afterAll()
}

object SparkFixture {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    // match the Verify/Bench sessions: events.parquet carries
    // TIMESTAMP(NANOS), surfaced as long and converted in Tables.events
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // match Verify/Bench: native functions + the VCF auto-projection rule
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()
}
