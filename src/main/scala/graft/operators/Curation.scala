package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{tokenHash64, tokenHash64Jvm, tokens}

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

  /** PII patterns, restricted to the Java-regex ∩ RE2 common subset (no
    * lookarounds, no \b) so the DuckDB oracle can apply the IDENTICAL
    * pattern strings. Simple by design — production pipelines layer
    * validators on top; the operator shape (codegen'd regexp chain,
    * map-only at any scale) is what matters here.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII redaction: emails, NNN-NNN-NNNN phones and IPv4 addresses
    * replaced by typed placeholder tokens, in that order (emails first —
    * an email's host part may itself be an IPv4). Pure expression work
    * (codegen'd regexp_replace chain): map-only, pipelined into the
    * scan.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")

  /** Per-type PII match counts, each counted on the text as the previous
    * redaction left it (an email's embedded IPv4 is counted as email,
    * not both) — mirror the CTE chain in the oracle SQL.
    */
  def piiCounts(text: Column): Column = {
    val afterEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhonePattern, "<PHONE>")
    struct(
      size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(PhonePattern), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(afterPhone, lit(Ipv4Pattern), lit(0))).cast("long").as("n_ips"))
  }

  /** Per-document boilerplate ratio: the fraction of a doc's positional
    * token k-grams that are corpus-wide boilerplate (shared by >=
    * `minDocFreq` distinct docs) — the C4-style "repeated span" signal
    * that catches navigation chrome / license headers which per-pair
    * dedup never surfaces. Three bounded shuffles, single pass over the
    * gram UDF, one traversal of the corpus: (gram, doc) occurrence
    * counts; per-gram doc frequency as a groupBy aggregation equi-joined
    * back on the gram key; per-doc roll-up.
    * Skew note: doc frequency is a groupBy (map-side partial counts — a
    * universal gram like "of the" reduces to one long per map task), and
    * the join back on `g` is a plain equi-join AQE's skew-join can
    * split. The earlier window formulation
    * (`count().over(Window.partitionBy("g")))` buffered one row per
    * containing DOC in a single un-splittable window partition — a
    * one-task hot spot at corpus scale.
    */
  def boilerplateRatio(docs: DataFrame, idCol: String, textCol: String,
                       k: Int, minDocFreq: Int): DataFrame = {
    require(k >= 1 && minDocFreq >= 1,
      s"k and minDocFreq must be >= 1, got $k/$minDocFreq")
    // positional k-gram hashes INCLUDING repeats (repetition inside one
    // doc is the point); shorter-than-k docs contribute their whole text
    val gramUdf = udf { tk: Seq[String] =>
      if (tk == null) null
      else if (tk.size < k) Array(tokenHash64Jvm(tk.mkString(" ")))
      else Array.tabulate(tk.size - k + 1)(i =>
        tokenHash64Jvm(tk.slice(i, i + k).mkString(" ")))
    }.asNondeterministic()
    val occ = docs
      .select(col(idCol).as("id"), explode(gramUdf(tokens(col(textCol)))).as("g"))
      .groupBy("g", "id").agg(count(lit(1)).as("occ"))
    val docFreq = occ.groupBy("g").agg(count(lit(1)).as("doc_freq"))
    occ.join(docFreq, Seq("g"))
      .groupBy("id")
      .agg(sum(col("occ")).as("n_grams"),
        sum(when(col("doc_freq") >= minDocFreq, col("occ")).otherwise(lit(0L)))
          .as("n_boiler"))
      .select(col("id"), col("n_grams"), col("n_boiler"),
        round(col("n_boiler").cast("double") / col("n_grams").cast("double"), 4)
          .as("boiler_ratio"))
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
