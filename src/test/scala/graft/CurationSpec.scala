package graft

import org.apache.spark.sql.functions._
import graft.text.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 120L).map { i =>
    val body =
      if (i % 4 == 0) s"the quick fox $i and the lazy dog of the town to market in a day is fine"
      else if (i == 7L || i == 11L) "the exact same duplicated text and the same again of it to keep is"
      else s"the report $i of mail$i@example.com and the number 123456789 to file is in"
    (i, body)
  }.toDF("doc_id", "text")

  test("composite curation DAG: dedup, scrub, split partition, packing invariants") {
    val out = Curation.run(docs, Curation.Config(maxTokens = 16, nShards = 4))
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6), r.getString(7)))

    // exact dup pair collapsed to the lower doc_id
    val ids = rows.map(_._1).toSet
    assert(!ids.contains(11L), "exact duplicate must be deduped")
    assert(rows.map(_._1).length === ids.size, "one output row per doc")

    // scrub ran: no raw emails or long digit runs survive
    assert(rows.forall(r => !r._8.contains("@") && !r._8.contains("123456789")))
    assert(rows.exists(r => r._8.contains("<EMAIL>") && r._8.contains("<NUM>")))

    // split and shard are the documented pure functions of doc_id
    assert(rows.forall { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split${r._1}".getBytes("UTF-8")).map("%02x".format(_)).mkString
      r._3 === (if (md.substring(0, 4) < "2000") "valid" else "train") &&
        r._4 === r._1 % 4
    })

    // packing is per (split, shard) in export order: pack_id starts at 0 and
    // is non-decreasing in ord; a pack never exceeds the budget once a
    // second doc joins it (first doc may overflow alone, by construction)
    rows.groupBy(r => (r._3, r._4)).foreach { case (_, grp) =>
      val seq = grp.sortBy(_._5)
      assert(seq.head._6 === 0L)
      assert(seq.sliding(2).forall {
        case Array(a, b) => a._6 <= b._6; case _ => true
      })
      seq.groupBy(_._6).foreach { case (_, pack) =>
        val tokens = pack.map(_._7.toLong).sum
        assert(pack.length === 1 || tokens <= 16 + pack.map(_._7).max,
          s"pack over budget: $tokens tokens across ${pack.length} docs")
      }
    }

    // sampling bites but does not empty the corpus
    assert(ids.nonEmpty && ids.size < 119)
  }

  test("curation plan is one linear chain: no joins, bounded exchanges") {
    // the annotating window forms must not re-evaluate the scan->dedup->gate
    // subtree: a join-composed version of this DAG measured 16 exchanges /
    // 4 scans; the linear form needs only the three window exchanges
    // (dedup fingerprint, shard order, (split,shard) packing)
    val out = Curation.run(docs, Curation.Config(maxTokens = 16, nShards = 4))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"curation must not self-join:\n${plan.take(1500)}")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 4, s"expected <= 4 exchanges, found $exchanges")
  }
}
