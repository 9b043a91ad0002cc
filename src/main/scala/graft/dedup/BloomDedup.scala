package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Incremental corpus dedup — "which of today's documents are genuinely new
  * against everything already ingested" — EXACT result, Bloom-accelerated.
  *
  * The corpus side aggregates a Bloom filter over xxhash64(text) with
  * Spark's own distributed sketch aggregate (partial sketches merge on the
  * way up; only the final O(numBits) sketch reaches the driver, like the IVF
  * centroid matrix). Incoming rows the sketch REJECTS are provably new
  * (Bloom has no false negatives) and bypass the join entirely; only the
  * accepted rows — true duplicates plus the ~fpp false-positive share —
  * enter the exact anti-join. At 100 TB the anti-join's shuffle therefore
  * carries dup-rate + fpp of the incoming table instead of all of it, while
  * results stay exactly equal to the plain anti-join (the final join is on
  * the TEXT itself, so even a 64-bit hash collision cannot change the
  * answer). This is the runtime-bloom-pruned-join pattern Spark applies to
  * equi-joins, made explicit for the anti-join it does not cover.
  */
object BloomDedup {

  /** Distributed Bloom build: one aggregation over `fp` (a bigint column),
    * O(numBits) result. numBits defaults to 8M bits ≈ 1 MiB — fpp ≈ 1 % at
    * a million items; size the pair like any Bloom filter. */
  def bloomBytes(corpus: DataFrame, fp: Column,
      expectedItems: Long = 1000000L, numBits: Long = 8388608L): Array[Byte] = {
    val agg = new BloomFilterAggregate(Bridge.expression(fp),
      Literal(expectedItems), Literal(numBits), 0, 0)
    corpus.agg(Bridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** `might_contain` over a pre-built sketch — codegen'd, usable as a plain
    * filter Column on any bigint fingerprint. */
  def mightContain(bloom: Array[Byte], fp: Column): Column =
    Bridge.column(new BloomFilterMightContain(
      Literal.create(bloom, BinaryType), Bridge.expression(fp)))

  /** Incoming rows whose `textCol` does not occur in `corpus.textCol` —
    * exactly the anti-join result, with the Bloom prefilter keeping
    * definitely-new rows out of the shuffle. The incoming side is read
    * twice (both reads pruned scans); the saving is the exchange, which
    * dominates at scale. */
  def newDocs(incoming: DataFrame, corpus: DataFrame, textCol: String,
      expectedItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val bloom = bloomBytes(corpus, xxhash64(col(textCol)), expectedItems, numBits)
    // empty (or all-null-text) corpus: the sketch aggregate returns null —
    // nothing can match, every incoming row is new
    if (bloom == null) return incoming
    // coalesce: a null textCol hashes to null → might_contain null → the row
    // would vanish from BOTH filter branches; the anti-join this must equal
    // KEEPS null-key rows, so route them through the definitely-new branch
    val suspect = coalesce(mightContain(bloom, xxhash64(col(textCol))), lit(false))
    val confirmedNew = incoming.filter(suspect)
      .join(corpus.select(col(textCol).as("__corpus_text")),
        col(textCol) === col("__corpus_text"), "left_anti")
    incoming.filter(!suspect).unionByName(confirmedNew)
  }
}
