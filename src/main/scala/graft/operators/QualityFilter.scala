package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** MODEL-based quality filtering — the classifier analog of the heuristic
  * quality score (x03): fit a logistic regression that separates a small
  * curated TARGET set from the raw corpus over the engine's own quality
  * features, then score every document by the model. This is the shape of
  * the fastText/CCNet quality filters used to curate web corpora (score
  * against a Wikipedia-like target), with the engine's codegen'd feature
  * expressions instead of an external embedding.
  *
  * Feature vector (fixed order — the scoring fold and the oracle both
  * depend on it): [stopword ratio, punctuation ratio, mean token length,
  * min(n_tokens/100, 1)]. All four are already oracle-gated derivations
  * (the x03/x63 quality CTEs), so the DuckDB side re-derives the features
  * independently and only the FITTED WEIGHTS are staged — the same
  * staged-model contract as the k-means centroids (x13).
  *
  * Scoring uses the LINEAR LOGIT z = b + w·x, not sigmoid(z): sigmoid is
  * monotone (identical ranking) but exp() differs in last-ulp between
  * libm implementations, while b + w0·x0 + … as a fixed left-associated
  * chain of IEEE adds/multiplies is bit-portable — the selection boundary
  * cannot flip between engines.
  *
  * Scale shape: the fit runs on a per-doc feature frame (4 doubles per
  * document — at 100 TB this is the small side; fit on a sample if even
  * that is too big) and is cached per corpus by [[Fitted]]; scoring is a
  * stateless per-row expression that pipelines with the scan.
  */
object QualityFilter {

  /** The fixed feature order. `ts` must be `tokens(textCol)`. */
  private def features(ts: Column, text: Column): Seq[Column] = Seq(
    TextFunctions.stopwordRatioOf(ts),
    TextFunctions.punctRatio(text),
    TextFunctions.meanTokenLenOf(ts),
    least(size(ts).cast("double") / 100, lit(1.0)))

  /** (id, f array<double>) — the featurized frame. */
  def featurize(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ts = TextFunctions.tokens(col(textCol))
    df.select(col(idCol).as("id"),
      array(features(ts, col(textCol)): _*).as("f"))
  }

  /** Fit the target-vs-corpus classifier; returns ONE row
    * (weights array<double>, intercept double) — the stageable model.
    */
  def fit(df: DataFrame, idCol: String, textCol: String, isTarget: Column,
      maxIter: Int = 25, regParam: Double = 0.01): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val train = featurize(df, idCol, textCol)
      .join(df.select(col(idCol).as("id"), isTarget.cast("double").as("label")),
        Seq("id"))
      .select(array_to_vector(col("f")).as("features"), col("label"))
    val m = new LogisticRegression().setMaxIter(maxIter).setRegParam(regParam)
      .fit(train)
    Seq((m.coefficients.toArray.toSeq, m.intercept))
      .toDF("weights", "intercept")
  }

  /** Score `df` with a fitted model: (id, logit). The model frame is tiny
    * (one row) and is collected once — the weights become FOLDABLE
    * literals, so scoring is one codegen'd projection with no join.
    */
  def logits(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val row = model.select(col("weights"), col("intercept")).head()
    val w = row.getAs[scala.collection.Seq[Double]]("weights")
    val b = row.getAs[Double]("intercept")
    val ts = TextFunctions.tokens(col(textCol))
    val fs = features(ts, col(textCol))
    require(w.size == fs.size,
      s"model has ${w.size} weights for ${fs.size} features")
    // fixed left-associated fold: b + w0*f0 + w1*f1 + … (the bit-portable
    // order the oracle replicates)
    val z = fs.zipWithIndex.foldLeft(lit(b): Column) {
      case (acc, (f, i)) => acc + lit(w(i)) * f
    }
    df.select(col(idCol).as("id"), z.as("logit"))
  }
}
