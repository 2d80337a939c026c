package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins: salt the skewed (fact) side so one hot
  * key's rows spread over `salts` shuffle partitions, and replicate the
  * small side once per salt. Complements AQE's skew-join splitting —
  * salting is the static answer when a key is known-hot (a single station
  * producing most of the traffic, the reference's obvious skew risk).
  *
  * Correctness: every fact row keeps exactly one salt, every dim key
  * exists for all salts, so (key, salt) equi-join ≡ key equi-join.
  */
object SaltedJoin {

  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    // any within-key-varying assignment works; monotonic id varies per row
    val saltedFact = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
