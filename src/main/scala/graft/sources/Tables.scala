package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver's TPC-H-ish star schema plus the
  * text/embedding/event extension tables (see /root/repo/TESTDATA.md).
  *
  * The reference engine's only "source" is a char-at-a-time text-file scan
  * (`/root/reference/worker.c:188-205`); here every source is a columnar
  * parquet scan so Catalyst can push filters and prune columns — at 100 TB
  * the scan is the dominant cost and pushdown/pruning is what keeps it
  * proportional to the query, not the dataset.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events parquet stores ns-precision timestamps, which Spark 4
    * rejects outright (PARQUET_TYPE_ILLEGAL). Read them as raw nanos and
    * floor-convert to a µs TimestampType — identical to what Spark's own
    * ns→µs truncation would produce, and consistent with the DuckDB
    * oracle's `epoch_ms` flooring.
    *
    * REQUIRES `spark.sql.legacy.parquet.nanosAsLong=true` on the session
    * (set at build time in Bench/Verify/tests; there is no per-read parquet
    * option for it, and mutating session config here would silently change
    * schemas of unrelated parquet reads). `ts div 1000` truncates toward
    * zero, which equals floor only for ts >= 0 — fine for this corpus
    * (all timestamps post-1970 per TESTDATA.md); pre-epoch data would need
    * an explicit floor-div.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet is TIMESTAMP(NANOS): set spark.sql.legacy.parquet.nanosAsLong=true at session build time")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
