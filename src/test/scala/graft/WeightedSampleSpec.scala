package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions.col

/** Efraimidis–Spirakis weighted sampling: exact match vs a sequential
  * reference model (same md5-derived uniforms), determinism across
  * partitionings and reruns, weight-proportional inclusion across many
  * salts, and the weight-domain edges. */
class WeightedSampleSpec extends SparkSpec {

  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(
      s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def refKeys(ids: Seq[Long], w: Long => Long,
      salt: String): Map[Long, Long] =
    ids.map { id =>
      val v = java.lang.Long.parseLong(md5Hex(s"$id$salt").take(13), 16)
      val u = (v + 1).toDouble / 4503599627370496.0
      id -> math.floor(1000000.0 * (math.log(u) / w(id))).toLong
    }.toMap

  test("exact key/selection match vs the sequential reference model") {
    val w = (id: Long) => 1L + id % 7
    val df = (0L until 300L).map(id => (id, w(id))).toDF("id", "w")
      .repartition(8)
    val got = TextAnalysis.weightedSample(df, "id", "w", k = 20, salt = "s1")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val keys = refKeys(0L until 300L, w, "s1")
    val want = keys.toSeq.sortBy { case (id, km) => (-km, id) }.take(20)
    assert(got.toSeq === want)
  }

  test("deterministic across partitionings; a different salt reshuffles the draw") {
    val df = (0L until 200L).map(id => (id, 5L)).toDF("id", "w")
    def ids(parts: Int, salt: String) =
      TextAnalysis.weightedSample(df.repartition(parts), "id", "w", 15, salt)
        .collect().map(_.getLong(0)).toSeq
    assert(ids(3, "a") === ids(11, "a"))
    assert(ids(3, "a") !== ids(3, "b"), "salt must change the draw")
  }

  test("inclusion tracks weight: the heavy item appears in most draws") {
    // one item with 50x the weight of 99 others: P(include in top-10) is
    // near-certain per draw; across 30 salts it must dominate
    val df = (0L until 100L).map(id => (id, if (id == 7L) 500L else 10L))
      .toDF("id", "w")
    val hits = (1 to 30).count { i =>
      TextAnalysis.weightedSample(df, "id", "w", 10, s"salt$i")
        .collect().exists(_.getLong(0) == 7L)
    }
    assert(hits >= 25, s"heavy item drawn only $hits/30 times")
  }

  test("null and non-positive weights are excluded; k > n returns all eligible") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(0L)), (4L, Some(-2L)),
      (5L, Some(3L))).toDF("id", "w")
    val got = TextAnalysis.weightedSample(df, "id", "w", 10)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 5L))
  }
}
