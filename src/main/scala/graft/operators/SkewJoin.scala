package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. a hot key inside a single
  * shuffle partition that must still co-locate with a non-broadcastable
  * right side).
  *
  * Shape: the skewed (big) side gets a deterministic salt in [0, S)
  * derived from row content, the small side is replicated S times, and
  * the join key becomes (key, salt) — a hot key's rows now spread over S
  * shuffle partitions instead of one. Replication multiplies the small
  * side S×, so S trades straggler time against shuffle volume; at 100 TB
  * pick S ≈ (hot-key rows / target partition rows).
  *
  * Inner equi-join semantics are preserved exactly: every (left, right)
  * key match appears once, because each left row carries exactly one
  * salt value and the right side has exactly one replica per salt.
  */
object SkewJoin {

  /** Inner-join `big` with `small` on `keys`, salting `big` into
    * `saltBuckets` sub-keys. `saltOn` should be a column that varies
    * within a hot key (a row id); salting is deterministic in it. */
  def saltedInner(big: DataFrame, small: DataFrame, keys: Seq[String],
                  saltOn: String, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val salted = big.withColumn("__salt", pmod(hash(col(saltOn)), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit(_)): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
