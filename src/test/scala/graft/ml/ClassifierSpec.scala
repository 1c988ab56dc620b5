package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SGD-family half of the classifier port (train_baseline.py:135-176):
  * softmax-by-gradient-agg has no closed-form SQL oracle, so the checks
  * here are the optimization invariants — loss strictly improves over
  * the untrained model, the trained model separates a separable corpus,
  * predictions beat the prior-only baseline — plus the S9 artifact
  * round-trip. The oracled half (NB metrics/submission) is covered by
  * the driver queries ml_classifier_metrics / ml_nb_submission.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Separable 3-class corpus: each class has its own vocabulary, plus
    * shared filler tokens. */
  private lazy val corpus: DataFrame = {
    val rows = (0 until 120).map { i =>
      val cls = i % 3
      val word = Seq("alpha beta", "gamma delta", "epsilon zeta")(cls)
      (i.toLong, s"$word filler$i common tok", s"c$cls")
    }
    rows.toDF("id", "text", "label")
  }

  private lazy val feats = TfIdf.transformTfIdf(
    corpus, TfIdf.fitIdf(corpus, "id", "text", n = 3), "id", "text", n = 3)
  private lazy val labels = corpus.select(col("id"), col("label"))

  test("softmax training reduces NLL vs the zero-weight model") {
    val w0 = SoftmaxRegression.train(feats, labels, epochs = 0)
    val w = SoftmaxRegression.train(feats, labels, epochs = 10, lr = 2.0)
    val l0 = SoftmaxRegression.loss(feats, labels, w0)
    val l = SoftmaxRegression.loss(feats, labels, w)
    assert(math.abs(l0 - math.log(3.0)) < 1e-9,
      s"zero-weight NLL should be ln(C): $l0")
    assert(l < l0 * 0.5, s"training did not reduce loss: $l0 -> $l")
  }

  test("trained softmax separates the separable corpus and beats priors") {
    val w = SoftmaxRegression.train(feats, labels, epochs = 10, lr = 2.0)
    val pred = SoftmaxRegression.predict(feats, w, labels.select("id"))
      .join(labels, "id")
    val acc = pred.agg(
      avg(when(col("label_pred") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.95, s"separable-corpus accuracy too low: $acc")
  }

  test("sampled softmax (classSample) still learns, lands near the exact path") {
    val w0 = SoftmaxRegression.train(feats, labels, epochs = 0)
    val wEx = SoftmaxRegression.train(feats, labels, epochs = 10, lr = 2.0)
    // 2-of-3 classes per epoch, deterministic rotation: each class
    // trains on ~2/3 of the epochs, so give it proportionally more
    val wSm = SoftmaxRegression.train(feats, labels, epochs = 15, lr = 2.0,
      classSample = Some(2))
    val l0 = SoftmaxRegression.loss(feats, labels, w0)
    val lSm = SoftmaxRegression.loss(feats, labels, wSm)
    assert(lSm < l0 * 0.7, s"sampled softmax did not reduce loss: $l0 -> $lSm")
    def acc(w: DataFrame): Double =
      SoftmaxRegression.predict(feats, w, labels.select("id"))
        .join(labels, "id")
        .agg(avg(when(col("label_pred") === col("label"), 1.0).otherwise(0.0)))
        .head().getDouble(0)
    val (aEx, aSm) = (acc(wEx), acc(wSm))
    assert(aSm >= 0.9, s"sampled-softmax accuracy too low: $aSm")
    assert(math.abs(aEx - aSm) <= 0.1,
      s"sampled path too far from exact: exact=$aEx sampled=$aSm")
  }

  test("S9: model artifact save/load round-trips the weights frame") {
    val w = SoftmaxRegression.train(feats, labels, epochs = 3, lr = 1.0)
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    ModelIO.save(w, dir, Map("model" -> "softmax", "epochs" -> "3"))
    val back = ModelIO.load(spark, dir)
    assert(back.count() == w.count())
    val diff = w.withColumnRenamed("w", "w1")
      .join(back.withColumnRenamed("w", "w2"), Seq("label", "term"))
      .filter(abs(col("w1") - col("w2")) > 1e-12).count()
    assert(diff == 0, "weights changed across save/load")
    assert(ModelIO.loadMeta(dir).contains("softmax"))
  }

  test("NB cv metrics are sane on the separable corpus") {
    val m = NaiveBayesText.cvMetrics(corpus, "id", "text", "label",
      folds = 3, minDf = 2L).collect()
    assert(m.length == 3)
    m.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      val top3 = r.getAs[Double]("top3_acc")
      assert(acc > 0.9, s"fold accuracy $acc")
      assert(top3 >= acc)
    }
  }
}
