package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokenHash64

/** Deterministic corpus-curation operators: weighted source mixing and
  * fixed-size carve-outs. Everything is keyed by md5-derived hashes of
  * the document id — NO rand(): the same doc lands in the same
  * mix/sample on every run, every engine, every partition count, which
  * is what makes training-data builds reproducible (and these queries
  * DuckDB-oracle-checkable). The reference has no sampling surface; this
  * extends its scan→filter shape (usr_functions.c:153-186) with
  * hash-derived predicates.
  *
  * Scale: both operators are a map-side filter / one bounded window —
  * no extra shuffle beyond what the caller already has (sourceMix is
  * pipelined into the scan; hashSamplePerGroup is one exchange on the
  * group key with WindowGroupLimit pre-pruning to k per partition).
  */
object Curation {

  // distinct prefixes per operator: if sampling shared the mix key, the
  // per-group "uniform" sample would be exactly the head of the mix
  // survival order — maximally correlated, never representative of
  // mixed-out docs
  private def hashKey(prefix: String, idCol: String) =
    pmod(tokenHash64(concat(lit(prefix), col(idCol).cast("string"))), lit(1000000L))

  /** Weighted source mixing: keep each row of source s with probability
    * weights(s) (default `defaultWeight`), decided by the doc's hash —
    * a deterministic Bernoulli per document. Weights are exact to 1e-6.
    */
  def sourceMix(docs: DataFrame, sourceCol: String, idCol: String,
                weights: Map[String, Double],
                defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values.toSeq :+ defaultWeight).forall(w => w >= 0 && w <= 1),
      "weights must be in [0, 1]")
    // round, don't truncate: 0.29 * 1e6 = 289999.99999999994 in doubles —
    // toLong would shift the threshold by 1e-6 and drift from an oracle
    // that writes the natural `key < 290000`
    val threshold = weights.foldLeft(lit(math.round(defaultWeight * 1000000.0))) {
      case (acc, (s, w)) =>
        when(col(sourceCol) === s, lit(math.round(w * 1000000.0))).otherwise(acc)
    }
    docs.filter(hashKey("mix_", idCol) < threshold)
  }

  /** Train/eval contamination check: which eval docs share >= `minShared`
    * winnowing fingerprints with some training doc — the benchmark-leak
    * scan every training-data pipeline runs before shipping an eval set.
    * The eval side is small by construction (a carve-out), so its
    * fingerprints broadcast: the train corpus is scanned once, never
    * shuffled. Returns (eval_id, train_id, n_shared).
    */
  def contaminationCheck(train: DataFrame, eval_ : DataFrame,
                         idCol: String, textCol: String,
                         k: Int, w: Int, minShared: Int): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val tf = Dedup.winnowFingerprints(train, idCol, textCol, k, w)
    val ef = Dedup.winnowFingerprints(eval_, idCol, textCol, k, w)
      .withColumnRenamed("id", "eval_id")
    tf.join(broadcast(ef), Seq("fp"))
      .groupBy(col("eval_id"), col("id").as("train_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Deterministic k-per-group sample: the k docs with the smallest
    * md5-derived keys in each group — a uniform-without-replacement
    * sample that is stable across runs (the standard trick for carving
    * fixed eval sets out of a moving corpus).
    */
  def hashSamplePerGroup(docs: DataFrame, groupCol: String, idCol: String,
                         k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(groupCol)
      .orderBy(hashKey("sample_", idCol).asc, col(idCol).asc)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
