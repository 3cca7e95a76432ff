package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed classical classifiers over token features — the
  * label-this-corpus stage of a training-data pipeline (language /
  * quality / domain routing), built from joins and aggregates so the
  * "model" is itself a DataFrame that broadcasts.
  */
object Classify {

  /** Multinomial Naive Bayes with Laplace-1 smoothing, trained and
    * scored in one plan, reported as a confusion matrix. `docs` carries
    * (`idCol`, `labelCol`, `textCol`); rows with id % 5 == `testFold`
    * are held out, the rest train. Scores are EXACT e6 fixed-point
    * log₂ ([[Bm25.log2E6]]): for class c and test doc d,
    *   score = log₂(n_docs_c) + Σ_tok m·log₂(cnt_{tok,c}+1)
    *           − |d|·log₂(total_c + V)
    * (the shared −log₂(n_docs) prior term cancels in the argmax).
    * Unseen-in-class tokens contribute log₂(0+1) = 0 minus the
    * denominator — exactly Laplace. Argmax ties break toward the
    * smaller class label. Output: (label, pred, n_docs).
    *
    * Scale: the model (token × class counts) is the only joined state —
    * vocabulary-sized, class-count-wide, broadcastable for real
    * vocabularies; scoring is one grid join + one per-(doc, class)
    * aggregate + one per-doc argmax, all keyed, no collect. */
  def naiveBayesConfusion(docs: DataFrame, idCol: String, labelCol: String,
                          textCol: String, testFold: Long = 0L): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(labelCol).as("label"),
      col(textCol).as("text"))
    val tok = base
      .select(col("id"), col("label"), (col("id") % 5).as("fold"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val trainTok = tok.filter(col("fold") =!= testFold)
    val model = trainTok.groupBy(col("tok"), col("label").as("c"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // vocab x classes: the broadcastable model
    val classTot = model.groupBy(col("c"))
      .agg(sum(col("cnt")).as("tot_c"))
    val prior = base.filter(col("id") % 5 =!= testFold)
      .groupBy(col("label").as("c")).agg(count(lit(1)).as("n_c"))
    val vocab = model.select(col("tok")).distinct().agg(count(lit(1)).as("v"))
    val classes = classTot.join(prior, Seq("c"))
      .crossJoin(broadcast(vocab))
      .select(col("c"), Bm25.log2E6(col("n_c")).as("prior_e6"),
        Bm25.log2E6(col("tot_c") + col("v")).as("denom_e6"))
      .localCheckpoint(false)
    val testTok = tok.filter(col("fold") === testFold)
      .groupBy(col("id"), col("label"), col("tok"))
      .agg(count(lit(1)).as("m"))
    val scored = testTok.crossJoin(broadcast(classes.select(col("c"))))
      .join(broadcast(model), Seq("tok", "c"), "left")
      .withColumn("cnt1", coalesce(col("cnt"), lit(0L)) + 1L)
      .groupBy(col("id"), col("label"), col("c"))
      .agg(sum(col("m") * Bm25.log2E6(col("cnt1"))).as("num_e6"),
        sum(col("m")).as("len"))
      .join(broadcast(classes), Seq("c"))
      .select(col("id"), col("label"), col("c"),
        (col("prior_e6") + col("num_e6") - col("len") * col("denom_e6"))
          .as("score"))
    scored.groupBy(col("id"), col("label"))
      .agg(min(struct((-col("score")).as("ns"), col("c"))).getField("c")
        .as("pred")) // max score, ties toward the smaller class label
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
