package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §4.3 posture: "skewed keys ->
  * salting or AQE skew-join").
  *
  * AQE's skew-join split handles sort-merge joins whose PARTITIONS are
  * skewed; salting is the tool for the cases AQE cannot rebalance:
  * a single hot KEY inside one partition (AQE cannot split one key's
  * hash bucket across tasks for an aggregation), or a shuffled join
  * where one key's rows alone exceed a task's memory.
  *
  * Both transforms are pure plan rewrites — results are provably equal
  * to the unsalted equivalents (pinned by SkewSpec equivalence tests). */
object Skew {

  /** Two-phase salted aggregation: spread one hot group key over
    * `numSalts` reducer tasks, then combine the partials. Correct for any
    * algebraic aggregate (sum/count/min/max + anything with a merge):
    * pass the per-salt partial aggs and the matching re-combine step.
    *
    * `saltBy` picks the salt deterministically from a high-cardinality
    * column (NOT rand() — retries/replays must produce identical
    * partitioning for exactly-once sinks). */
  def saltedAgg(df: DataFrame, key: Column, saltBy: Column, numSalts: Int)(
      partial: Seq[Column], combine: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltBy), lit(numSalts.toLong)))
      .groupBy(key.as("__k"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__k"))
      .agg(combine.head, combine.tail: _*)
      .withColumnRenamed("__k", "key")

  /** Salted equi-join for a skewed probe side: the build (dim) side is
    * replicated `numSalts` times, the probe (fact) side gets a
    * deterministic salt, and the join key becomes (key, salt) — one hot
    * key now lands on `numSalts` reducers. Use when the build side is too
    * big to broadcast but small enough to replicate numSalts times. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                 saltBy: Column, numSalts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltBy), lit(numSalts.toLong)).cast("int"))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedFact.join(repDim,
        saltedFact(factKey) === repDim(dimKey) &&
        saltedFact("__salt") === repDim("__salt"))
      .drop("__salt")
  }
}
