package graft

import java.nio.file.{Files, Paths}

import graft.streaming.StreamingAnomaly
import graft.temporal.Anomaly
import org.apache.spark.sql.streaming.Trigger

/** Online anomaly flags: flag-for-flag parity with the batch operator when
  * samples arrive in order across micro-batch boundaries (warm-up state
  * crossing triggers is the point), plus unit pins of the judge kernel's
  * edge semantics. */
class StreamingAnomalySpec extends SparkSpec {

  import spark.implicits._

  test("streamed flags equal batch madFlags across micro-batch boundaries") {
    // two keys, 30 ordered samples each: steady ~100 with a spike at t=17
    // on key a and a null at t=21 on key b; sliced into 6 files fed one per
    // trigger, so baselines and warm-up cross trigger boundaries
    val rows = for (key <- Seq("a", "b"); t <- 0L until 30L) yield {
      val v: Option[Long] =
        if (key == "a" && t == 17) Some(500L)
        else if (key == "b" && t == 21) None
        else Some(100L + (t * (if (key == "a") 1 else 3)) % 7)
      (key, t, v)
    }
    val dir = Files.createTempDirectory("graft-sanomaly").toString + "/in"
    val all = rows.toDF("key", "t", "v")
    for (slice <- 0 until 6) {
      all.filter($"t" >= slice * 5 && $"t" < (slice + 1) * 5)
        .coalesce(1).write.mode("append").parquet(dir)
      // deterministic trigger order: stamp each slice's files with an
      // increasing mtime (the file source processes oldest-first)
      graft.util.Fs.listDir(Paths.get(dir))
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .foreach { p =>
          val f = p.toFile
          if (f.lastModified() > slice * 10000L) f.setLastModified(slice * 10000L)
        }
    }
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = StreamingAnomaly.flagStream(stream, window = 5, k = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("sanomaly_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("key", "t", "med2", "dev2", "mad4", "anomaly")
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        def optI(i: Int) =
          if (r.isNullAt(i)) None
          else Some(r.get(i).asInstanceOf[Number].intValue)
        (r.getString(0), r.getLong(1)) -> (opt(2), opt(3), opt(4), optI(5))
      }.toMap
    val streamed = canon(spark.table("sanomaly_out"))
    val batch = canon(Anomaly.madFlags(all, Seq("key"), Seq("t"), "v",
      window = 5, k = 3))
    assert(streamed.size === 60)
    assert(streamed === batch)
    // the run exercised all three regimes
    val flags = streamed.collect { case ((k, _), (_, _, _, Some(f))) => f }.toSeq
    assert(streamed(("a", 17L))._4 === Some(1), "the spike must flag")
    assert(flags.contains(0) && streamed(("a", 2L))._4 === None,
      "steady points pass, warm-up is null")
    // the null sample's frame-mates are judged insufficient, like batch
    assert(streamed(("b", 23L)) === batch(("b", 23L)))
  }

  test("judge kernel: warm-up, null contamination, flatline, exact spike math") {
    import StreamingAnomaly.judge
    val steady = Seq(10L, 12L, 11L, 13L).map(Option(_))
    assert(judge(steady.take(3), Some(50L), 4, 3) === ((None, None, None, None)))
    assert(judge(steady :+ None, Some(50L), 5, 3) === ((None, None, None, None)))
    // same hand case as AnomalySpec: med2=23, dev2=77, mad4=4 → flag
    assert(judge(steady, Some(50L), 4, 3) ===
      ((Some(23L), Some(77L), Some(4L), Some(1))))
    // flatline: MAD=0 — continuation passes, any move flags
    val flat = Seq.fill(4)(Option(7L))
    assert(judge(flat, Some(7L), 4, 6)._4 === Some(0))
    assert(judge(flat, Some(9L), 4, 6)._4 === Some(1))
    // null current value: baseline computed, verdict null
    assert(judge(steady, None, 4, 3) === ((Some(23L), None, Some(4L), None)))
  }
}
