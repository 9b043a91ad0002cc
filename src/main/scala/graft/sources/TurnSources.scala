package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Turn
import graft.streaming.StreamingPipeline.turnSchema

/** Pluggable turn sources — the Spark translation of the reference's source
  * registry (reference cmd/run.go:66-89, one switch arm per provider).
  * Every reader lands on the same typed Dataset[Turn], mirroring how every
  * reference source emits the same SourceMessage envelope.
  */
object TurnSources {

  /** Parquet table scan (the primary source — reference nomad source S2). */
  def parquet(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read.schema(turnSchema).parquet(path).as[Turn]
  }

  /** CSV with explicit schema (no inference job at scale). */
  def csv(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read
      .schema(turnSchema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)
      .as[Turn]
  }

  /** JSON-lines with explicit schema. */
  def jsonl(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read
      .schema(turnSchema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .json(path)
      .as[Turn]
  }

  /** Deterministic in-memory generator (reference dummy source S1). */
  def dummy(spark: SparkSession, nConvs: Int, turnsPerConv: Int): Dataset[Turn] = {
    import spark.implicits._
    graft.model.Transcripts.synthetic(spark, nConvs, turnsPerConv).as[Turn]
  }

  /** Multi-source merge: the reference's shared outbound channel
    * (broker/connector.go:87-105) is a unionByName of typed sources. */
  def union(sources: Dataset[Turn]*): Dataset[Turn] =
    sources.reduce(_ unionByName _)
}
