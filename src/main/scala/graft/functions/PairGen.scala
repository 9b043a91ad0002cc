package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-bucket unordered-pair generation from a collected id array — the
  * shared tail of every LSH family (MinHash bands, hyperplane bands): a
  * bucket's ids are already local after the band groupBy, so pairing is a
  * generator chain, not a join.
  *
  * Built from generators + `slice` only: the earlier
  * `transform(filter(transform(...)))` formulation ran its lambdas
  * interpreted (higher-order functions never enter whole-stage codegen);
  * `posexplode`/`explode`/`slice` are all codegen'd built-ins. Each
  * unordered pair is emitted exactly once (element × strictly-later
  * elements), normalized to (least, greatest) so output order does not
  * depend on `collect_list`'s nondeterministic element order.
  */
object PairGen {

  /** All unordered pairs from `idsCol` (an array column), one row per pair,
    * as (id_a, id_b) with id_a < id_b. Rows whose array has < 2 elements
    * produce nothing. Output may contain duplicates across input rows —
    * callers `.distinct()` (on the two id columns only: the whole point of
    * pairing before re-attaching payloads is an id-only dedup exchange). */
  def unorderedPairs(buckets: DataFrame, idsCol: String): DataFrame =
    buckets
      .select(col(idsCol).as("__ids"), posexplode(col(idsCol)).as(Seq("__pos", "__a")))
      // strictly-later elements: 1-based slice start __pos+2, length n-__pos-1
      // (length 0 → empty array → explode emits nothing for the last element)
      .select(col("__a"), explode(slice(col("__ids"), col("__pos") + lit(2),
        size(col("__ids")) - col("__pos") - lit(1))).as("__b"))
      .select(least(col("__a"), col("__b")).as("id_a"),
        greatest(col("__a"), col("__b")).as("id_b"))
      // a duplicated id inside one bucket would pair with itself by
      // POSITION; the value-based formulations this replaces (b > a,
      // id_a < id_b) never emitted self-pairs — preserve that contract
      .filter(col("id_a") =!= col("id_b"))
}
