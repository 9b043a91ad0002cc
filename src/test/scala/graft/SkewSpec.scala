package graft

import org.apache.spark.sql.functions._
import graft.model.Transcripts
import graft.pipeline.Pipeline

/** Hot-conversation skew handling (SURVEY.md §7 step 7, north_rule "salted
  * repartitioning"): one conversation owning ~50 % of all rows must not pin a
  * single task. */
class SkewSpec extends SparkSpec {

  test("salted repartition spreads a hot conversation over many partitions") {
    // partition-count measurement needs coalescing off (the tiny fixture
    // otherwise merges to 1 partition regardless of salting)
    val prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
    // conv-00000 gets 400 extra turns: ~51% of all rows
    val turns = Transcripts.synthetic(spark, nConvs = 39, turnsPerConv = 10,
      hotConvExtraTurns = 400)
    val hotShare = turns.filter(col("conv_id") === "conv-00000").count().toDouble / turns.count()
    assert(hotShare > 0.4, s"fixture must be skewed, got $hotShare")

    val salted = Pipeline.parsedSalted(turns, saltBuckets = 32)
    val sizes = salted
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(_.getLong(1))
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.length > 1)
    assert(sizes.max <= mean * 3,
      s"salting failed: max partition ${sizes.max} vs mean $mean (${sizes.toSeq})")

    // WITHOUT salt (partition by conv only): the hot conv pins one partition
    val unsalted = graft.parse.GrokParser.parse(turns).repartition(col("conv_id"))
    val uSizes = unsalted.groupBy(spark_partition_id().as("pid")).count()
      .collect().map(_.getLong(1))
    assert(uSizes.max >= turns.count() * 2 / 5,
      "control: unsalted repartition should concentrate the hot conv")
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)
  }

  test("routing results are identical with and without salting") {
    val turns = Transcripts.synthetic(spark, 20, 6, hotConvExtraTurns = 100)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("conv_id", "turn_idx", "sink").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted
    val withSalt = graft.route.Router.fanOut(Pipeline.parsedSalted(turns, 32))
    val noSalt = graft.route.Router.fanOut(graft.parse.GrokParser.parse(turns))
    assert(canon(withSalt).sameElements(canon(noSalt)))
  }
}
