package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed joins — the manual counterpart to AQE's
  * skew-join splitting, for when the skew is known up front (one hot
  * customer, one stop-word shingle) or the engine runs without AQE.
  *
  * The skewed LEFT side gets a uniform random-ish salt in [0, n) derived
  * deterministically from its row: hash of all columns MIXED WITH
  * monotonically_increasing_id(). The id term matters — hot-key skew very
  * often consists of fully identical rows (the same event repeated), and a
  * salt from the column values alone would assign them all the same salt,
  * silently re-concentrating the key on one reducer. The id is
  * partition-id << 33 | row-offset, a pure function of the input partition
  * layout, so a task retry recomputes identical salts (no rand(): the plan
  * stays deterministic and retry-safe). The RIGHT side is replicated n
  * ways with every salt value. The join key becomes (key, salt): a hot key's
  * rows now spread over n reducers instead of one. Replication multiplies
  * the right side n× — use it when right is the small(er) side, and size n
  * to the observed hot-key factor.
  */
object SkewJoin {

  def saltedJoin(skewed: DataFrame, other: DataFrame,
                 key: String, nSalts: Int = 8): DataFrame = {
    val saltedLeft = skewed.withColumn(
      "_salt",
      pmod(hash(skewed.columns.map(col) :+ monotonically_increasing_id(): _*),
           lit(nSalts)))
    val replicatedRight = other.withColumn(
      "_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    saltedLeft
      .join(replicatedRight, Seq(key, "_salt"))
      .drop("_salt")
  }
}
