package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TRAINED quality classifier — the learned complement of the rule-based
  * gates in [[TextAnalysis.gopherRules]]. Real curation pipelines
  * (CCNet, the GPT-3 data stack) train a cheap linear classifier against
  * weak labels and score the whole crawl with it; this is that shape,
  * kept INTEGER-EXACT so the trained weights and every prediction
  * hash-match a DuckDB oracle cell-for-cell:
  *
  *  - features: hashed bag-of-words (md5-derived bucket `j = h60(word)
  *    % d`, count `x`) plus a constant bias feature at `j = d` — the
  *    "hashing trick", which keeps the model d+1 integers no matter how
  *    large the vocabulary grows;
  *  - weak labels: `y = +1` iff `10 * n_stop >= n_words` (stopword-dense
  *    text reads as natural language) — the same integer
  *    cross-multiplication discipline as every gate in this repo;
  *  - learner: the BATCH perceptron. Round r computes every document's
  *    margin `m_i = Σ_j w_j x_ij` under the current weights, then adds
  *    `Σ_{y_i m_i <= 0} y_i x_ij` to each weight (ties train, the
  *    classical convention). All sums are integer, so the trajectory is
  *    exactly reproducible in any engine — no learning rate, no float.
  *
  * Distribution shape (the 100 TB contract): the MODEL is d+1 longs and
  * lives in the plan as a literal array (broadcast-by-value to every
  * task); the DATA never leaves the cluster. Each round is two shuffled
  * aggregates over the feature relation — margins by doc (map-side
  * partial sums), weight deltas by bucket — and one d+1-row collect of
  * the deltas, the classic "broadcast model, aggregate the gradient"
  * loop of every distributed linear learner. The feature relation is
  * localCheckpoint'ed once and re-scanned per round, so plan size stays
  * constant across rounds.
  */
object Perceptron {

  /** Gopher-gate stopword list — THE shared English list
    * ([[TextAnalysis.stopwords]]), referenced rather than copied so the
    * weak labels can never drift from the gate they complement. */
  val StopWords: Seq[String] = TextAnalysis.stopwords.toMap.apply("en")

  /** Trains `rounds` batch-perceptron rounds over hashed bag-of-words
    * features and returns `(trajectory, predictions)`:
    * trajectory = `(round, j, w)` — the full weight history, bias at
    * `j = d`; predictions = `(doc_id, y, margin, pred)` under the final
    * weights with `pred = +1 iff margin > 0`.
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
      d: Int = 32, rounds: Int = 4): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val words = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(expr(Dedup.wordsExpr(textCol))).as("word"))
    val lab = words.groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(when(col("word").isin(StopWords: _*), 1L).otherwise(0L))
          .as("n_stop"))
      .select(col("doc_id"),
        when(lit(10) * col("n_stop") >= col("n_words"), 1L)
          .otherwise(-1L).as("y"))
    val bag = words
      .groupBy(col("doc_id"),
        expr(s"${Dedup.h60raw("word")} % $d").as("j"))
      .agg(count(lit(1)).cast("long").as("x"))
    // (doc_id, j, x, y) with the constant bias feature appended; scanned
    // 2 x rounds + 1 times — materialize once
    val feat = bag
      .unionByName(lab.select(col("doc_id"), lit(d.toLong).as("j"),
        lit(1L).as("x")))
      .join(lab, "doc_id")
      .localCheckpoint(true)

    val w = Array.fill(d + 1)(0L)
    def marginCol = sum(col("x") *
      element_at(array(w.map(lit(_)).toIndexedSeq: _*),
        (col("j") + 1).cast("int"))).cast("long")
    val snaps = new ArrayBuffer[Row]
    for (r <- 1 to rounds) {
      // one pass: margins by doc under the CURRENT literal weights, the
      // misclassified set (y*m <= 0: ties train), deltas by bucket
      val dw = feat.groupBy(col("doc_id"), col("y"))
        .agg(marginCol.as("m"))
        .where(col("y") * col("m") <= 0)
        .select("doc_id")
        .join(feat.select("doc_id", "j", "x", "y"), "doc_id")
        .groupBy("j").agg(sum(col("y") * col("x")).cast("long").as("dw"))
        .collect() // <= d+1 rows — the model, not the data
      dw.foreach(row => w(row.getLong(0).toInt) += row.getLong(1))
      for (j <- 0 to d) snaps += Row(r.toLong, j.toLong, w(j))
    }

    val trajSchema = StructType(Seq(StructField("round", LongType),
      StructField("j", LongType), StructField("w", LongType)))
    val traj = spark.createDataFrame(
      spark.sparkContext.parallelize(snaps.toSeq, 1), trajSchema)
    val predict = feat.groupBy(col("doc_id"), col("y"))
      .agg(marginCol.as("margin"))
      .select(col("doc_id"), col("y"), col("margin"),
        when(col("margin") > 0, 1L).otherwise(-1L).as("pred"))
    (traj, predict)
  }

  /** Classifier scorecard — per-class precision/recall/F1 in exact
    * ppm, the evaluation every quality-filter change is judged by
    * before it gates a corpus. One map-side-combinable groupBy over
    * `(label, pred)` (the confusion matrix, classes²-sized), then
    * pure arithmetic on that tiny relation; integer divisions floor
    * identically in both engines
    * (`f1 = 2·p·r div (p + r)` over ppm values, 0 when degenerate).
    * Output: `(class, tp, fp, fn, precision_ppm, recall_ppm, f1_ppm)`
    * — one row per DISTINCT label or predicted class. */
  def classifierEval(pred: DataFrame, labelCol: String,
      predCol: String): DataFrame =
    evalFromConfusion(confusion(pred, labelCol, predCol))

  /** The corpus-facing half: ONE map-side-combinable groupBy to the
    * classes²-sized confusion relation `(y, p, n)`. Counts are
    * ADDITIVE across any partition of the predictions — what lets the
    * streamed twin ([[graft.streaming.StreamingEval]]) fold per-batch
    * confusion deltas and re-derive the scorecard read-side. */
  def confusion(pred: DataFrame, labelCol: String,
      predCol: String): DataFrame =
    pred.select(col(labelCol).cast("long").as("y"),
        col(predCol).cast("long").as("p"))
      .groupBy(col("y"), col("p"))
      .agg(count(lit(1)).cast("long").as("n"))

  /** The finisher: pure arithmetic on the tiny confusion relation. */
  def evalFromConfusion(cm: DataFrame): DataFrame = {
    val classes = cm.select(col("y").as("class"))
      .union(cm.select(col("p").as("class"))).distinct()
    classes
      .crossJoin(cm) // classes × classes² — tiny both sides
      .groupBy(col("class"))
      .agg(
        sum(when(col("y") === col("class") && col("p") === col("class"),
          col("n")).otherwise(0L)).as("tp"),
        sum(when(col("y") =!= col("class") && col("p") === col("class"),
          col("n")).otherwise(0L)).as("fp"),
        sum(when(col("y") === col("class") && col("p") =!= col("class"),
          col("n")).otherwise(0L)).as("fn"))
      .withColumn("precision_ppm",
        expr("tp * 1000000L div greatest(tp + fp, 1L)"))
      .withColumn("recall_ppm",
        expr("tp * 1000000L div greatest(tp + fn, 1L)"))
      .withColumn("f1_ppm", expr(
        "2L * precision_ppm * recall_ppm" +
          " div greatest(precision_ppm + recall_ppm, 1L)"))
  }
}
