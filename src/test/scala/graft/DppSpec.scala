package graft

import graft.relational.Tpch
import graft.tools.PlanPin
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning over the hive-partitioned orders layout:
  * the plan must carry a `dynamicpruning` partition filter (not a post-scan
  * row filter), and after execution the scan's partitions-read metric must
  * equal the hot-month count k — the evidence that a 100 TB fact scan would
  * list and read only k month directories. Row-level parity with the
  * unpartitioned table is the `q_dpp_hot_months` DuckDB oracle's job; here a
  * Spark-side twin re-checks it so the suite stands alone. */
class DppSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 8

  test("ensurePartitionedOrders: one file per month directory, rerun is a no-op") {
    val (pdir, dimDir) = Tpch.ensurePartitionedOrders(spark, sfDir)
    val months = graft.util.Fs.listDir(java.nio.file.Paths.get(pdir))
      .filter(p => p.getFileName.toString.startsWith("o_month="))
    assert(months.nonEmpty)
    months.foreach { m =>
      val files = graft.util.Fs.listDir(m).filter { p =>
        val n = p.getFileName.toString
        !n.startsWith("_") && !n.startsWith(".")
      }
      assert(files.size === 1, s"expected one file per month dir, $m has ${files.size}")
    }
    // the dim carries one row per month with a dense 1..n revenue rank
    val dim = spark.read.parquet(dimDir)
    assert(dim.count() === months.size.toLong)
    assert(dim.select("rev_rank").collect().map(_.getInt(0)).sorted.toSeq
      === (1 to months.size).toSeq)
    val before = months.map(_.getFileName.toString).sorted
    assert(Tpch.ensurePartitionedOrders(spark, sfDir) === (pdir, dimDir))
    assert(graft.util.Fs.listDir(java.nio.file.Paths.get(pdir))
      .filter(_.getFileName.toString.startsWith("o_month="))
      .map(_.getFileName.toString).sorted === before)
  }

  test("DPP fires: dynamicpruning partition filter, k partitions read, rows match twin") {
    PlanPin.withStaticPlans(spark) {
      val df = Tpch.revenueHotMonths(spark, sfDir, K)
      val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq

      val plan = df.queryExecution.executedPlan
      assert(plan.toString.contains("dynamicpruning"),
        "partitioned scan must carry a dynamicpruning PartitionFilter")
      val scans = plan.collect {
        case f: FileSourceScanExec if f.metadata.get("Location").exists(
          _.contains("graft_orders_bymonth")) => f
      }
      assert(scans.size === 1, s"expected the partitioned fact scan, got ${scans.size}")
      val partsRead = scans.head.metrics("numPartitions").value
      val totalMonths = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(date_format(col("o_orderdate"), "yyyy-MM")).distinct().count()
      assert(partsRead === K.toLong,
        s"DPP should read exactly $K of $totalMonths month partitions, read $partsRead")
      assert(totalMonths > K.toLong, "fixture must have more months than k")

      // Spark-side twin over the unpartitioned table, dim re-derived from
      // scratch (oracle-independent)
      import org.apache.spark.sql.expressions.Window
      val monthly = spark.read.parquet(s"$sfDir/orders.parquet")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("rev"))
      val hotTwin = monthly
        .withColumn("rk", row_number().over(Window.orderBy(col("rev").desc, col("m"))))
        .filter(col("rk") <= K).select(col("m"))
      val want = spark.read.parquet(s"$sfDir/orders.parquet")
        .join(hotTwin, date_format(col("o_orderdate"), "yyyy-MM") === col("m"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("price_cents"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(rows === want)
    }
  }

  test("without the selective dim filter no pruning happens (negative control)") {
    PlanPin.withStaticPlans(spark) {
      // same join, but the dim is the bare month list (no selective filter):
      // DPP must not prune anything — pinning WHY revenueHotMonths keeps its
      // rev_rank <= k Filter on the dim
      val (pdir, dimDir) = Tpch.ensurePartitionedOrders(spark, sfDir)
      val dim = spark.read.parquet(dimDir).select(col("m"))
      val joined = spark.read.parquet(pdir)
        .join(broadcast(dim), col("o_month") === col("m"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      joined.collect()
      val scans = joined.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec if f.metadata.get("Location").exists(
          _.contains("graft_orders_bymonth")) && !f.metadata.get("Location")
          .exists(_.contains("__dim")) => f
      }
      assert(scans.head.metrics("numPartitions").value >
        spark.read.parquet(dimDir).count() - 5,
        "an unfiltered dim must not prune the fact scan")
    }
  }
}
