package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array

/** Model-based document quality scoring: a fasttext-style linear
  * classifier over hashed token counts, the learned counterpart of
  * [[TextAnalysis.qualityScore]]'s fixed heuristic (re-expresses the
  * quality-filter stage of CCNet/RedPajama-style curation pipelines;
  * reference capability family: src/pipeline/transformation — scoring
  * transforms over document batches).
  *
  * Why this shape at 100 TB: features are a hashing trick (no vocabulary
  * build, no dictionary shuffle — each doc's sparse vector is computed
  * map-side), and logistic regression trains by L-BFGS whose per-
  * iteration cost is one treeAggregate shipping a `numFeatures`-sized
  * gradient per partition — model-sized shuffles, like the IVF/PQ
  * training loops; the corpus never leaves the executors. Scoring is a
  * broadcast of the coefficient vector and one map-side pass. The model
  * persists via ML Pipeline save/load, giving the same train-once/
  * score-forever economics as the stored dedup and ANN indexes. */
object QualityModel {

  /** Train on `docs` with a boolean/numeric label expression (weak
    * labels: a curated-source indicator, a thresholded heuristic score,
    * human ratings — anything cheap at corpus scale). */
  def train(docs: DataFrame, label: Column, textCol: String = "text",
            numFeatures: Int = 1 << 15, regParam: Double = 1e-3,
            maxIter: Int = 50): PipelineModel = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__tokens")
      .setPattern("\\s+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("__tokens").setOutputCol("__features")
      .setNumFeatures(numFeatures)
    val lr = new LogisticRegression()
      .setLabelCol("__label").setFeaturesCol("__features")
      .setMaxIter(maxIter).setRegParam(regParam)
    val fitted = new Pipeline().setStages(Array(tok, tf, lr))
      .fit(docs.withColumn("__label", label.cast("double")))
    // The fitted LR stage keeps its training summary, which pins the
    // SparkSession — scoring closures then drag the session into task
    // serialization and fail. A persisted-then-reloaded model has no
    // summary (save/load drops it), so stripping it here just applies
    // the on-disk contract without the disk round-trip. setSummary is
    // private[spark] to Scala but public in bytecode -> reflection.
    fitted.stages.foreach { st =>
      try st.getClass.getMethod("setSummary", classOf[Option[_]])
        .invoke(st, None)
      catch { case _: NoSuchMethodException => () }
    }
    fitted
  }

  /** Score `docs`: (idCol, model_quality) with model_quality = P(label=1)
    * rounded to 6 dp. One map-side pass over a broadcast model. */
  def score(model: PipelineModel, docs: DataFrame,
            idCol: String = "doc_id"): DataFrame =
    model.transform(docs)
      .withColumn("model_quality",
        round(vector_to_array(col("probability")).getItem(1), 6))
      .select(col(idCol), col("model_quality"))

  /** Train-once/score-forever: persist and reload the fitted pipeline. */
  def save(model: PipelineModel, dir: String): Unit =
    model.write.overwrite().save(dir)

  def load(dir: String): PipelineModel = PipelineModel.load(dir)

  /** The deterministic held-out predicate shared by the train and probe
    * phases: the same 20% is held out in every engine and every run, so
    * a model trained by [[trainHeldOut]] never saw the rows the stored-
    * model entry scores. */
  def heldOutPred(idCol: String = "doc_id"): Column =
    pmod(xxhash64(col(idCol)), lit(5)) === 0

  /** Train-once phase of the held-out shape: fit on the NON-held-out
    * 80% against the thresholded heuristic label. Persist the result
    * with [[save]] and every later scoring run is [[score]] over a
    * broadcast coefficient vector — no L-BFGS, no training scan. */
  def trainHeldOut(docs: DataFrame, threshold: Double = 0.75,
                   idCol: String = "doc_id",
                   textCol: String = "text"): PipelineModel = {
    val labeled = TextAnalysis.qualityScore(docs, textCol)
      .withColumn("__held_out", heldOutPred(idCol))
    // empty/degenerate docs score NaN on the heuristic (0/0 ratios):
    // NaN >= t is false in ANSI SQL but surfaces as null through some
    // rewrites — coalesce so the label column can never be null
    train(labeled.where(!col("__held_out")),
      coalesce(col("quality_score") >= threshold, lit(false)), textCol)
  }

  /** The `text_quality_model` query shape: deterministic 80/20 split by
    * xxhash64(id), train on the 80% against the thresholded heuristic
    * score, emit model scores for the HELD-OUT 20% — so the entry
    * certifies generalisation, not memorisation. */
  def heldOutScores(docs: DataFrame, threshold: Double = 0.75,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    score(trainHeldOut(docs, threshold, idCol, textCol),
      docs.where(heldOutPred(idCol)), idCol)
}
