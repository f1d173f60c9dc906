package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear quality classifier — the fastText-style
  * learned filter (Joulin et al. 2017, "Bag of Tricks for Efficient
  * Text Classification") that modern curation pipelines (CCNet, DCLM,
  * LLaMA) run between heuristic gates and training: fit a logistic
  * model on weak labels (a trusted in-domain slice vs the raw pool),
  * then score every document with the learned probability.
  * Complements the repo's heuristic quality signals (gopher rules,
  * C4 clean, char entropy) with the *learned* stage those pipelines
  * layer on top.
  *
  * Features: presence of distinct word unigrams + bigrams, hashed
  * into `dim` buckets (the hashing trick — fixed feature budget, no
  * vocab table), optionally L1-normalized per document (fastText's
  * mean-of-embeddings shape — see [[hashedFeatures]] for the
  * normalized-vs-raw trade). The gram hashes come from the codegen'd
  * [[graft.functions.Hashes]] expressions — no per-gram strings
  * materialize.
  *
  * Training is batch gradient descent, distributed Spark-first:
  * the hashed feature stream is built ONCE, repartitioned by doc and
  * persisted; every iteration is then (broadcast-join the weight
  * table) → (per-doc margin agg, no extra exchange — the stream is
  * already doc-partitioned) → (per-feature gradient agg, the one
  * shuffle keyed by feature). The weight vector and gradient are
  * bounded by `dim` (driver-side arrays, `dim ≤ 2^20` enforced), so
  * the only collects are provably bounded — the same contract as the
  * BPE merge table and k-means sample.
  *
  * Determinism (the repo contract): every cross-row float sum runs as
  * 9-dp-rounded decimals — per-doc margins, per-feature gradients,
  * the bias gradient and the loss — so training is bit-identical on
  * any partitioning of the input, and [[score]] rounds to 6 dp.
  * Iterative optimization is not ANSI-SQL-expressible, so the
  * SparkEntry row is rows-only; exact semantics are pinned by
  * ClassifierSpec's plain-JVM sequential cross-check.
  */
object TextClassifier {

  /** Trained model: dense-in-a-map weights over hashed features (only
    * features seen in training are present; absent = 0.0), plus the
    * per-iteration mean log-loss trace for convergence checks.
    * `l1Normalize` records the feature scaling the model was trained
    * under — scoring MUST feed it the same scaling, so it rides the
    * model rather than being a separate scoring knob.
    */
  final case class Model(dim: Int, bias: Double, weights: Map[Int, Double],
                         losses: Seq[Double], l1Normalize: Boolean = true)

  private def dec9(c: Column): Column = round(c, 9).cast("decimal(30,12)")
  private val MaxDim = 1 << 20

  /** Bound a training set to `sampleMax` docs by the repo's
    * hash-deterministic sample convention (ORDER BY xxhash64(id), id
    * LIMIT n — Pq.train / Ivf.train): returns (sampled labels,
    * docs semi-joined to them). The 100 TB contract for learned gates
    * (fastText / CCNet quality filters): TRAINING reads a bounded
    * sample — the persisted feature frame and the per-epoch passes are
    * sample-sized, not corpus-sized — while SCORING stays full-corpus.
    * sampleMax <= 0 disables the bound (the plain-JVM cross-check
    * trains tiny frames unsampled). When sampleMax >= corpus size the
    * sample IS the corpus and training is bit-identical to unbounded
    * (decimal sums make fold order irrelevant).
    */
  private def boundTraining(docs: DataFrame, labels: DataFrame,
                            sampleMax: Int,
                            idCol: String): (DataFrame, DataFrame) =
    if (sampleMax <= 0) (docs, labels)
    else {
      val lab = labels.orderBy(xxhash64(col(idCol)), col(idCol))
        .limit(sampleMax)
      (docs.join(lab.select(col(idCol)), Seq(idCol), "left_semi"), lab)
    }

  /** Hashed presence features: one row per (doc, feature bucket) with
    * `tf` = cnt/n_features when `l1Normalize` (fastText's
    * mean-of-embeddings shape — margins independent of doc length,
    * the right scaling when downstream thresholds must mean the same
    * thing for tweets and books) or raw cnt when not (classic
    * bag-of-words logistic regression — much better conditioned for
    * few-iteration full-batch descent, margins grow with evidence).
    * cnt > 1 only when two distinct grams collide into a bucket.
    * Distinct unigrams and bigrams of the space-split text, hashed by
    * the codegen'd GramHashes expression and folded into `dim`
    * buckets. Docs with empty text still emit their single
    * empty-gram feature — no document is dropped.
    */
  def hashedFeatures(docs: DataFrame, dim: Int, textCol: String = "text",
                     idCol: String = "doc_id",
                     l1Normalize: Boolean = true): DataFrame = {
    require(dim > 0 && dim <= MaxDim,
      s"dim must be in (0, $MaxDim]: the weight vector and gradient are " +
        s"driver-side arrays bounded by dim (got $dim)")
    val grams = concat(
      graft.functions.Hashes.gram_hashes(col(textCol), 1),
      graft.functions.Hashes.gram_hashes(col(textCol), 2))
    val n = docs.select(col(idCol), explode(grams).as("__h"))
      .select(col(idCol), pmod(col("__h"), lit(dim.toLong)).cast("int").as("feat"))
      .groupBy(idCol, "feat").agg(count(lit(1)).as("cnt"))
    if (!l1Normalize)
      n.select(col(idCol), col("feat"), col("cnt").cast("double").as("tf"))
    else {
      val tot = n.groupBy(idCol).agg(sum("cnt").as("__n"))
      n.join(tot, idCol :: Nil)
        .select(col(idCol), col("feat"),
          (col("cnt").cast("double") / col("__n")).as("tf"))
    }
  }

  /** Fit logistic weights on (doc, label∈{0,1}) weak labels by `iters`
    * rounds of full-batch gradient descent with learning rate `lr`
    * and L2 penalty `l2`. Deterministic on any input partitioning.
    * Contract: `labels` carries ONE row per doc — a duplicated label
    * row would fan out that doc's feature rows and double its weight
    * in the batch gradient.
    */
  def train(docs: DataFrame, labels: DataFrame, dim: Int, iters: Int = 8,
            lr: Double = 2.0, l2: Double = 0.0, textCol: String = "text",
            idCol: String = "doc_id", l1Normalize: Boolean = true,
            stopTol: Double = 0.0, biasInit: Double = 0.0,
            sampleMax: Int = 100000): Model = {
    require(iters > 0, s"iters must be > 0: $iters")
    require(stopTol >= 0.0, s"stopTol must be >= 0: $stopTol")
    val spark = docs.sparkSession
    import spark.implicits._
    val (docsB, labelsB) = boundTraining(docs, labels, sampleMax, idCol)
    // the expensive subtree (tokenize + hash + per-doc agg) evaluates
    // once: doc-partitioned and persisted, every iteration's margin agg
    // and residual join sit on this partitioning with no new exchange
    val feats = hashedFeatures(docsB, dim, textCol, idCol, l1Normalize)
      .join(labelsB.select(col(idCol), col("label").cast("double").as("__y")),
        idCol :: Nil)
      .repartition(col(idCol))
      .persist()
    try {
      // nDocs rides the first iteration's gradient collect (the bias
      // row carries a doc count) instead of a dedicated
      // distinct().count() pass over the feature stream — that pass
      // cost a full extra scan + exchange per train() call
      var nDocs = 0.0
      val w = new Array[Double](dim)
      // biasInit at the class-prior log-odds (ln(n_pos/n_neg)) skips the
      // 1-2 full-batch epochs plain descent spends collapsing the bias
      // toward the majority class before weights start separating —
      // every epoch then buys separation, not calibration-to-prior.
      // Default 0.0 = the classic zero init the JVM cross-check pins.
      var bias = biasInit
      val losses = Seq.newBuilder[Double]
      // early-stop on loss-delta plateau: `iters` stays the hard budget,
      // stopTol > 0 ends training once the RELATIVE per-iteration loss
      // improvement falls below it (strongly-separated batches converge
      // in 2-3 passes; the remaining epochs buy nothing but wall-clock).
      // stopTol = 0 (default) disables it — bit-identical to the
      // fixed-iteration schedule the plain-JVM cross-check pins.
      var prevLoss = Double.NaN
      var plateaued = false
      var it = 0
      while (it < iters && !plateaued) {
        it += 1
        val nz = w.iterator.zipWithIndex.collect {
          case (v, i) if v != 0.0 => (i, v)
        }.toSeq
        val wdf =
          if (nz.isEmpty) Seq((0, 0.0)).toDF("feat", "__w").limit(0)
          else nz.toDF("feat", "__w")
        // margin_d = Σ_f tf·w_f (+ bias): decimal-summed so the fold
        // order across a doc's feature rows cannot change the result
        val resid = feats.join(broadcast(wdf), Seq("feat"), "left")
          .groupBy(idCol)
          .agg(sum(dec9(col("tf") * coalesce(col("__w"), lit(0.0))))
            .as("__m"), first(col("__y")).as("__y"))
          .select(col(idCol), col("__y"),
            (lit(1.0) / (lit(1.0) + exp(-(col("__m").cast("double") + lit(bias)))))
              .as("__p"))
          .select(col(idCol), (col("__p") - col("__y")).as("__r"),
            // log-loss. The sigmoid's mathematical range is (0,1) but in
            // double precision a saturated margin rounds __p to exactly
            // 0.0/1.0, so clamp into [eps, 1-eps] before the log terms —
            // gradients use the unclamped __p (p - y is finite anyway)
            (-(col("__y") * log(greatest(col("__p"), lit(1e-15))) +
              (lit(1.0) - col("__y")) *
                log(greatest(lit(1.0) - col("__p"), lit(1e-15))))).as("__l"))
        // ONE action per iteration: the per-feature gradient (the one
        // shuffle, keyed by feat, bounded by dim — collected like the
        // BPE table) unioned with a feat = -1 row carrying the bias
        // gradient and the loss sum, so stats don't cost a second job
        val grad = feats.join(resid.select(col(idCol), col("__r"), col("__l")),
            idCol :: Nil)
          .groupBy("feat")
          .agg(sum(dec9(col("__r") * col("tf"))).cast("double").as("g"),
            lit(Double.NaN).as("loss"), lit(0L).as("nd"))
          .unionByName(resid.agg(
            lit(-1).as("feat"),
            sum(dec9(col("__r"))).cast("double").as("g"),
            sum(dec9(col("__l"))).cast("double").as("loss"),
            count(lit(1)).as("nd")))
          .as[(Int, Double, Double, Long)].collect()
        val (_, gb, lossSum, nd) = grad.find(_._1 == -1).get
        nDocs = nd.toDouble
        require(nDocs > 0, "no labeled documents to train on")
        for ((f, g, _, _) <- grad if f >= 0) w(f) -= lr * (g / nDocs + l2 * w(f))
        bias -= lr * gb / nDocs
        val loss = lossSum / nDocs
        losses += loss
        if (stopTol > 0.0 && !prevLoss.isNaN &&
          math.abs(prevLoss - loss) <= stopTol * math.max(prevLoss, 1e-12))
          plateaued = true
        prevLoss = loss
      }
      Model(dim, bias,
        w.iterator.zipWithIndex.collect { case (v, i) if v != 0.0 => (i, v) }.toMap,
        losses.result(), l1Normalize)
    } finally { feats.unpersist(blocking = false); () }
  }

  /** Multi-class softmax model — the fastText langid shape (Joulin
    * et al. 2017 §2 with a softmax output over `nClasses`): sparse
    * weights keyed (feature, class), per-class biases, per-iteration
    * mean cross-entropy trace. Scoring MUST reuse the recorded
    * feature scaling (the [[Model]] rationale).
    */
  final case class SoftmaxModel(dim: Int, nClasses: Int,
                                biases: Seq[Double],
                                weights: Map[(Int, Int), Double],
                                losses: Seq[Double],
                                l1Normalize: Boolean = true)

  /** Per-doc class-margin array under sparse (feat, cls) weights:
    * the shared kernel of softmax train and score. Input must carry
    * (idCol, feat, tf) (+ passthrough columns aggregated by first).
    * Margins sum as 9-dp decimals per (doc, class); both groupBys
    * ride the caller's doc partitioning (doc ⊆ (doc, cls)), so the
    * weight join adds NO exchange.
    */
  private def classMargins(feats: DataFrame, wdf: DataFrame,
                           biases: Seq[Double], idCol: String,
                           carry: Seq[String]): DataFrame = {
    val c = biases.size
    val carried = carry.map(n => first(col(n)).as(n))
    val joined = feats.join(broadcast(wdf), Seq("feat"), "left")
      .groupBy(col(idCol), col("cls"))
      .agg((sum(dec9(col("tf") * coalesce(col("__w"), lit(0.0))))
        .cast("double")).as("__m"), carried: _*)
    val bArr = array(biases.map(lit): _*)
    joined.groupBy(col(idCol))
      .agg(map_from_entries(
        expr("filter(collect_list(struct(cls, __m)), e -> e.cls is not null)"))
        .as("__mm"), carried: _*)
      // try_element_at: absent map keys (classes with all-zero weights
      // for this doc — the common case) must read as NULL → 0.0; plain
      // element_at throws MAP_KEY_DOES_NOT_EXIST under ANSI mode
      .withColumn("__z", zip_with(
        expr(s"transform(sequence(0, ${c - 1}), cc -> " +
          "coalesce(try_element_at(__mm, cc), 0.0d))"),
        bArr, (m, b) => m + b))
      .withColumn("__mx", array_max(col("__z")))
      .withColumn("__ex", expr("transform(__z, x -> exp(x - __mx))"))
      .withColumn("__probs", expr(
        "transform(__ex, e -> e / aggregate(__ex, 0.0d, (a, x) -> a + x))"))
      .drop("__mm", "__z", "__mx", "__ex")
  }

  /** Fit a `nClasses`-way softmax on (doc, label ∈ [0, nClasses))
    * weak labels — the learned language-ID gate (fastText langid =
    * exactly this over hashed grams): full-batch descent, per
    * iteration ONE broadcast weight join → doc-side margin/softmax
    * (no exchange past the persisted doc partitioning) → the one
    * (feat, cls)-keyed gradient shuffle, bounded by dim·nClasses.
    * Determinism contract as [[train]]: decimal sums everywhere a
    * float crosses rows, bit-identical on any partitioning
    * (ClassifierSpec's sequential softmax cross-check pins it).
    */
  def trainSoftmax(docs: DataFrame, labels: DataFrame, dim: Int,
                   nClasses: Int, iters: Int = 8, lr: Double = 2.0,
                   l2: Double = 0.0, textCol: String = "text",
                   idCol: String = "doc_id",
                   l1Normalize: Boolean = true,
                   sampleMax: Int = 100000,
                   stopTol: Double = 0.0): SoftmaxModel = {
    require(iters > 0, s"iters must be > 0: $iters")
    require(nClasses >= 2, s"nClasses must be >= 2: $nClasses")
    require(stopTol >= 0.0, s"stopTol must be >= 0: $stopTol")
    val spark = docs.sparkSession
    import spark.implicits._
    val (docsB, labelsB) = boundTraining(docs, labels, sampleMax, idCol)
    val feats = hashedFeatures(docsB, dim, textCol, idCol, l1Normalize)
      .join(labelsB.select(col(idCol), col("label").cast("int").as("__y")),
        idCol :: Nil)
      .repartition(col(idCol))
      .persist()
    try {
      val w = scala.collection.mutable.Map.empty[(Int, Int), Double]
        .withDefaultValue(0.0)
      val bias = new Array[Double](nClasses)
      val losses = Seq.newBuilder[Double]
      var nDocs = 0.0
      // the [[train]] plateau rule verbatim: iters stays the hard
      // budget, stopTol > 0 ends training when the RELATIVE loss
      // improvement falls below it; 0.0 (default) = the fixed schedule
      // the plain-JVM cross-check pins
      var prevLoss = Double.NaN
      var plateaued = false
      var it = 0
      while (it < iters && !plateaued) {
        it += 1
        val nz = w.iterator.filter(_._2 != 0.0)
          .map { case ((f, c), v) => (f, c, v) }.toSeq
        val wdf =
          if (nz.isEmpty) Seq((0, 0, 0.0)).toDF("feat", "cls", "__w").limit(0)
          else nz.toDF("feat", "cls", "__w")
        val probs = classMargins(feats, wdf, bias.toSeq, idCol, Seq("__y"))
          .withColumn("__l",
            -log(greatest(element_at(col("__probs"), col("__y") + 1),
              lit(1e-15))))
          .persist()
        val resid = probs
          .select(col(idCol), col("__y"),
            posexplode(col("__probs")).as(Seq("cls", "__p")))
          .select(col(idCol), col("cls"),
            (col("__p") - (col("cls") === col("__y")).cast("double"))
              .as("__r"))
        // one collect: (feat, cls) gradient rows + feat = -1 bias rows
        // + a feat = -2 row carrying the loss sum and the doc count
        val grad = feats.join(resid, idCol :: Nil)
          .groupBy("feat", "cls")
          .agg(sum(dec9(col("__r") * col("tf"))).cast("double").as("g"),
            lit(Double.NaN).as("loss"), lit(0L).as("nd"))
          .unionByName(resid.groupBy("cls")
            .agg(sum(dec9(col("__r"))).cast("double").as("g"),
              lit(Double.NaN).as("loss"), lit(0L).as("nd"))
            .select(lit(-1).as("feat"), col("cls"), col("g"),
              col("loss"), col("nd")))
          .unionByName(probs.agg(
            lit(-2).as("feat"), lit(-1).as("cls"), lit(0.0).as("g"),
            sum(dec9(col("__l"))).cast("double").as("loss"),
            count(lit(1)).as("nd")))
          .as[(Int, Int, Double, Double, Long)].collect()
        probs.unpersist(blocking = false)
        val (_, _, _, lossSum, nd) = grad.find(_._1 == -2).get
        nDocs = nd.toDouble
        require(nDocs > 0, "no labeled documents to train on")
        for ((f, c, g, _, _) <- grad) {
          if (f >= 0) w((f, c)) = w((f, c)) - lr * (g / nDocs + l2 * w((f, c)))
          else if (f == -1) bias(c) -= lr * g / nDocs
        }
        val loss = lossSum / nDocs
        losses += loss
        if (stopTol > 0.0 && !prevLoss.isNaN &&
          math.abs(prevLoss - loss) <= stopTol * math.max(prevLoss, 1e-12))
          plateaued = true
        prevLoss = loss
      }
      SoftmaxModel(dim, nClasses, bias.toSeq,
        w.iterator.filter(_._2 != 0.0).toMap, losses.result(), l1Normalize)
    } finally { feats.unpersist(blocking = false); () }
  }

  /** Score documents under a softmax model: per doc the argmax class
    * (ties to the lowest class id) and its probability, 6 dp. Same
    * one-exchange accounting as [[score]].
    */
  def scoreSoftmax(docs: DataFrame, model: SoftmaxModel,
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nz = model.weights.iterator.map { case ((f, c), v) => (f, c, v) }.toSeq
    val wdf =
      if (nz.isEmpty) Seq((0, 0, 0.0)).toDF("feat", "cls", "__w").limit(0)
      else nz.toDF("feat", "cls", "__w")
    val feats = hashedFeatures(docs, model.dim, textCol, idCol,
      model.l1Normalize).repartition(col(idCol))
    classMargins(feats, wdf, model.biases, idCol, Seq.empty)
      .withColumn("__best",
        (expr("array_position(__probs, array_max(__probs))") - 1).cast("int"))
      .select(col(idCol), col("__best").as("cls"),
        round(element_at(col("__probs"), col("__best") + 1), 6).as("prob"))
  }

  /** Score documents under a trained model: P(label=1) per doc,
    * rounded to 6 dp. One pass — features build map-side, the weight
    * table joins broadcast, the per-doc margin agg is the only
    * exchange. Docs appear exactly once, including empty-text docs.
    */
  def score(docs: DataFrame, model: Model, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf =
      if (model.weights.isEmpty) Seq((0, 0.0)).toDF("feat", "__w").limit(0)
      else model.weights.toSeq.toDF("feat", "__w")
    hashedFeatures(docs, model.dim, textCol, idCol, model.l1Normalize)
      .join(broadcast(wdf), Seq("feat"), "left")
      .groupBy(idCol)
      .agg(sum(dec9(col("tf") * coalesce(col("__w"), lit(0.0)))).as("__m"))
      .select(col(idCol),
        round(lit(1.0) / (lit(1.0) +
          exp(-(col("__m").cast("double") + lit(model.bias)))), 6).as("prob"))
  }
}
