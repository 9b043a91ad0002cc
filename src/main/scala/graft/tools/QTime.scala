package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted per-query timing: the per-query phase of [[graft.Bench]] for an
  * arbitrary subset, without the scaling/headline phases — for re-baselining
  * one regressed query on a quiet box or A/B-ing a plan change quickly.
  * Same session shape and noop-write measurement as Bench's phase 3.
  *
  * Usage: runMain graft.tools.QTime <sfDir> <reps> <query>[,query...]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("q_minhash_pairs"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = graft.E2eRunner.session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("q_route_counts")(spark, sfDir).count() // warm-up
    names.foreach { name =>
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      // Bench's median (even rep counts average the middle two) — a QTime
      // re-baseline must report the same statistic as the headline it A/Bs
      val med = graft.Bench.median(runs)
      println(f"QTIME $name median=$med%.2f min=${runs.min}%.2f " +
        runs.map(r => f"$r%.2f").mkString("runs=[", ",", "]"))
    }
    spark.stop()
  }
}
