package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogitSpec extends SparkSpec {
  import spark.implicits._

  test("fit learns a separable boundary and scored ranks positives above negatives") {
    // y = 1 clusters near x = 1, y = 0 near x = 0 — enough iterations
    // must push every positive's score above every negative's.
    val rows = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, 1.0, 0.9 + 0.005 * (i % 5))
      else (i.toLong, 0.0, 0.1 + 0.005 * (i % 5))
    }
    val df = rows.toDF("id", "y", "x")
    val m = Logit.fit(df, "y", Seq("x"), iters = 30, lr = 5.0)
    assert(m.n == 20)
    assert(m.weights(1) > 0.0) // positive slope toward the y=1 cluster
    val sc = Logit.scored(df, m, Seq("x")).collect()
    val pos = sc.filter(_.getAs[Double]("y") == 1.0).map(_.getAs[Double]("score"))
    val neg = sc.filter(_.getAs[Double]("y") == 0.0).map(_.getAs[Double]("score"))
    assert(pos.min > neg.max)
    assert(sc.filter(_.getAs[Double]("y") == 1.0).forall(_.getAs[Int]("pred") == 1))
    assert(sc.filter(_.getAs[Double]("y") == 0.0).forall(_.getAs[Int]("pred") == 0))
  }

  test("fit is exactly partitioning-invariant (DECIMAL gradient sums + round6 weights)") {
    val df = (0 until 200)
      .map(i => (i.toLong, if (i % 3 == 0) 1.0 else 0.0, LogitSpecData.x1(i), LogitSpecData.x2(i)))
      .toDF("id", "y", "x1", "x2")
    val a = Logit.fit(df.repartition(1), "y", Seq("x1", "x2"), iters = 5, lr = 2.0)
    val b = Logit.fit(df.repartition(13), "y", Seq("x1", "x2"), iters = 5, lr = 2.0)
    assert(a.weights == b.weights)
  }

  test("prCurve counts are exact and ratios null out on empty denominators") {
    val scoredDf = Seq(
      (1.0, 0.9), (1.0, 0.7), (0.0, 0.6), (0.0, 0.2)
    ).toDF("y", "score")
    val got = Logit
      .prCurve(scoredDf, "y", "score", Seq(0.5, 0.95))
      .orderBy("threshold")
      .collect()
    // t=0.5: tp=2 fp=1 fn=0 tn=1 -> prec 2/3, rec 1, f1 0.8
    assert(
      (got(0).getAs[Long]("tp"), got(0).getAs[Long]("fp"),
        got(0).getAs[Long]("fn"), got(0).getAs[Long]("tn")) == ((2L, 1L, 0L, 1L))
    )
    assert(got(0).getAs[Double]("prec") == 0.666667)
    assert(got(0).getAs[Double]("rec") == 1.0)
    assert(got(0).getAs[Double]("f1") == 0.8)
    // t=0.95: nothing predicted positive -> precision NULL, recall 0, f1 NULL
    assert((got(1).getAs[Long]("tp"), got(1).getAs[Long]("fp")) == ((0L, 0L)))
    assert(got(1).isNullAt(got(1).fieldIndex("prec")))
    assert(got(1).getAs[Double]("rec") == 0.0)
    assert(got(1).isNullAt(got(1).fieldIndex("f1")))
  }

  test("auc matches the hand-computed tie-aware Mann-Whitney statistic") {
    // scores: 0.9(+), 0.7(+), 0.7(-), 0.4(-) — one tied pair.
    // ranks asc: 0.4->1, 0.7->avg(2,3)=2.5, 0.9->4
    // U = (2.5 + 4) - 2*3/2 = 3.5; auc = 3.5 / (2*2) = 0.875
    val df = Seq((1.0, 0.9), (1.0, 0.7), (0.0, 0.7), (0.0, 0.4))
      .toDF("y", "score")
    val got = Logit.auc(df, "y", "score").collect()(0)
    assert(got.getAs[Long]("n_pos") == 2L)
    assert(got.getAs[Long]("n_neg") == 2L)
    assert(got.getAs[Double]("auc") == 0.875)
    // perfect ranking -> 1.0; inverted -> 0.0; single class -> NULL
    val perfect = Seq((1.0, 0.9), (1.0, 0.8), (0.0, 0.2)).toDF("y", "score")
    assert(Logit.auc(perfect, "y", "score").collect()(0).getAs[Double]("auc") == 1.0)
    val inverted = Seq((0.0, 0.9), (1.0, 0.2)).toDF("y", "score")
    assert(Logit.auc(inverted, "y", "score").collect()(0).getAs[Double]("auc") == 0.0)
    val oneClass = Seq((1.0, 0.9), (1.0, 0.2)).toDF("y", "score")
    val oc = Logit.auc(oneClass, "y", "score").collect()(0)
    assert(oc.isNullAt(oc.fieldIndex("auc")))
    // partitioning invariance: DECIMAL rank sums, bounded window input
    assert(
      Logit.auc(df.repartition(7), "y", "score").collect()(0).getAs[Double]("auc") == 0.875
    )
  }

  test("auc's rank window sorts the aggregated distinct-score table, never the corpus") {
    // the ≤10⁶+1 distinct-round6-score bound is load-bearing: the only
    // sort in auc must run over the groupBy(score) output, partitioned
    // by the constant group — never an un-partitioned window over rows
    val df = (0 until 1000)
      .map(i => ((i % 2).toDouble, (i % 7) / 10.0))
      .toDF("y", "score")
    val result = Logit.auc(df, "y", "score")
    // labels and scores are (nearly) independent -> AUC near chance
    val a = result.collect()(0).getAs[Double]("auc")
    assert(a > 0.45 && a < 0.55, s"expected near-chance AUC, got $a")
    // the AQE wrapper hides typed nodes until executed — assert on the
    // printed final plan (top-down: the window line precedes its input)
    val plan = result.queryExecution.executedPlan.toString
    val winSpec = "windowspecdefinition\\(_g#\\d+, _s#\\d+ ASC".r
    assert(
      winSpec.findFirstIn(plan).isDefined,
      s"rank window must be partitioned by the constant group:\n$plan"
    )
    val aggKeys = "HashAggregate\\(keys=\\[_g#\\d+, (knownfloatingpointnormalized\\()?.*_s#\\d+".r
    val winAt = winSpec.findFirstMatchIn(plan).get.start
    val aggAt = aggKeys.findAllMatchIn(plan).map(_.start).filter(_ > winAt)
    assert(
      aggAt.nonEmpty,
      s"rank window must consume the bounded groupBy(score) table:\n$plan"
    )
    // and no un-partitioned window anywhere in the operator
    assert(
      !plan.contains("windowspecdefinition(_s"),
      s"global un-partitioned window found:\n$plan"
    )
  }

  test("fit fails loudly on NULL labels/features and NULL/negative weights") {
    val ok = Seq((1.0, 0.9, 1.0), (0.0, 0.1, 0.5)).toDF("y", "x", "w")
    val nullLabel = Seq((Some(1.0), 0.9, 1.0), (None, 0.1, 0.5)).toDF("y", "x", "w")
    val nullFeat = Seq((1.0, Some(0.9), 1.0), (0.0, None, 0.5)).toDF("y", "x", "w")
    val negWeight = Seq((1.0, 0.9, 1.0), (0.0, 0.1, -0.5)).toDF("y", "x", "w")
    Logit.fit(ok, "y", Seq("x"), iters = 1) // sane frame still fits
    val e1 = intercept[IllegalArgumentException](
      Logit.fit(nullLabel, "y", Seq("x"), iters = 1))
    assert(e1.getMessage.contains("violate the fit contract"))
    val e2 = intercept[IllegalArgumentException](
      Logit.fit(nullFeat, "y", Seq("x"), iters = 1))
    assert(e2.getMessage.contains("violate the fit contract"))
    val e3 = intercept[IllegalArgumentException](
      Logit.fitWeighted(negWeight, "y", Seq("x"), "w", iters = 1))
    assert(e3.getMessage.contains("violate the fit contract"))
    // unweighted fit does not reject a negative column it never reads
    Logit.fit(negWeight, "y", Seq("x"), iters = 1)
  }

  test("calibration clamps out-of-range scores into the edge bins, never a negative bin id") {
    val df = Seq(
      (1.0, -0.3), (0.0, -0.01), // below range -> bin 0
      (1.0, 0.55), // bin 5
      (0.0, 1.7) // above range -> top bin
    ).toDF("y", "score")
    val got = Logit.calibration(df, "y", "score", bins = 10).orderBy("bin").collect()
    assert(got.map(_.getAs[Int]("bin")).toSeq == Seq(0, 5, 9))
    assert(got(0).getAs[Long]("n") == 2L)
    assert(got(2).getAs[Long]("n") == 1L)
  }

  test("aucByGroup computes each group independently; single-class groups are NULL") {
    val df = Seq(
      ("a", 1.0, 0.9), ("a", 1.0, 0.7), ("a", 0.0, 0.7), ("a", 0.0, 0.4), // 0.875
      ("b", 0.0, 0.9), ("b", 1.0, 0.2), // inverted -> 0.0
      ("c", 1.0, 0.5), ("c", 1.0, 0.6) // no negatives -> NULL
    ).toDF("g", "y", "score")
    val got = Logit.aucByGroup(df, "g", "y", "score").orderBy("g").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(got(0).getAs[Double]("auc") == 0.875)
    assert(got(1).getAs[Double]("auc") == 0.0)
    assert(got(2).isNullAt(got(2).fieldIndex("auc")))
    assert(got(2).getAs[Long]("n_pos") == 2L && got(2).getAs[Long]("n_neg") == 0L)
  }

  test("calibration bins scores with exact counts; 1.0 folds into the top bin") {
    val df = Seq(
      (1.0, 1.0), (1.0, 0.95), (0.0, 0.92), // bin 9: 3 rows, 2 pos
      (0.0, 0.05), (1.0, 0.01) // bin 0: 2 rows, 1 pos
    ).toDF("y", "score")
    val got = Logit
      .calibration(df, "y", "score", bins = 10)
      .orderBy("bin")
      .collect()
    assert(got.map(_.getAs[Int]("bin")).toSeq == Seq(0, 9))
    assert(got(0).getAs[Long]("n") == 2L)
    assert(got(0).getAs[Long]("n_pos") == 1L)
    assert(got(0).getAs[Double]("mean_score") == 0.03)
    assert(got(0).getAs[Double]("pos_rate") == 0.5)
    assert(got(1).getAs[Long]("n") == 3L)
    assert(got(1).getAs[Long]("n_pos") == 2L)
    assert(got(1).getAs[Double]("pos_rate") == 0.666667)
  }

  test("cvAuc holds out each md5-assigned fold exactly once, with held-out-only scoring") {
    val df = (0 until 120)
      .map(i => (i.toLong, if (i % 2 == 0) 1.0 else 0.0,
        if (i % 2 == 0) 0.8 + LogitSpecData.x1(i) / 10 else 0.1 + LogitSpecData.x1(i) / 10))
      .toDF("id", "y", "x")
    val got = Logit
      .cvAuc(df, "y", Seq("x"), "id", folds = 3, iters = 10, lr = 4.0)
      .orderBy("fold")
      .collect()
    assert(got.map(_.getAs[Int]("fold")).toSeq == Seq(0, 1, 2))
    // every row trains on the complement of its test fold
    assert(got.map(r => r.getAs[Long]("n_train") + r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg")).forall(_ == 120L))
    // folds partition the data
    assert(got.map(r => r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg")).sum == 120L)
    // separable planted data -> every held-out AUC is perfect
    assert(got.forall(_.getAs[Double]("auc") == 1.0))
    // fold assignment is the salt-keyed md5, independent of partitioning
    val re = Logit
      .cvAuc(df.repartition(11), "y", Seq("x"), "id", folds = 3, iters = 10, lr = 4.0)
      .orderBy("fold")
      .collect()
    assert(re.map(_.toSeq).toSeq == got.map(_.toSeq).toSeq)
  }

  test("cvAuc's lockstep training is bit-identical to per-fold fit+auc") {
    // The r14 single-aggregation-per-iteration restructure must produce
    // EXACTLY the per-fold formulation's weights, scores and AUCs: the
    // per-fold gradient sums are the same round6'd terms under the same
    // exact DECIMAL arithmetic, just carried in one shared pass. Noisy,
    // non-separable data so the AUCs are non-trivial values.
    import org.apache.spark.sql.functions._
    val folds = 3
    val df = (0 until 150)
      .map { i =>
        val x = graft.functions.round6Jvm(LogitSpecData.x1(i))
        val y = if ((i * 2654435761L % 7) < 3 ^ (x > 0.5)) 1.0 else 0.0
        (i.toLong, y, x)
      }
      .toDF("id", "y", "x")
    val got = Logit
      .cvAuc(df, "y", Seq("x"), "id", folds = folds, iters = 5, lr = 2.0)
      .orderBy("fold")
      .collect()
    // naive reference: md5 fold assignment + an independent fit per fold
    val fold = pmod(
      conv(substring(md5(concat(col("id").cast("string"), lit(":graft"))), 1, 13), 16, 10)
        .cast("long"),
      lit(folds)
    ).cast("int")
    val withFold = df.withColumn("_fold", fold)
    val ref = (0 until folds).map { k =>
      val m = Logit.fit(withFold.filter(col("_fold") =!= k), "y", Seq("x"), iters = 5, lr = 2.0)
      val a = Logit
        .auc(Logit.scored(withFold.filter(col("_fold") === k), m, Seq("x")), "y", "score")
        .collect()
        .head
      (k, m.n, a.getAs[Long]("n_pos"), a.getAs[Long]("n_neg"),
        if (a.isNullAt(a.fieldIndex("auc"))) null else a.getAs[Double]("auc"))
    }
    assert(got.map(_.toSeq).toSeq == ref.map(t => Seq(t._1, t._2, t._3, t._4, t._5)))
  }

  test("hardExamples ranks misclassified rows first per class, ties on smaller id") {
    val df = Seq(
      (1L, 0.0, 0.9), // the most confident wrong negative
      (2L, 0.0, 0.4),
      (3L, 0.0, 0.4), // tie with id 2 -> id 2 ranks above
      (4L, 1.0, 0.1), // the most confident wrong positive
      (5L, 1.0, 0.8)
    ).toDF("id", "y", "score")
    val got = Logit
      .hardExamples(df, "y", "score", "id", k = 2)
      .orderBy("label", "rank")
      .collect()
    assert(
      got.map(r => (r.getAs[Double]("label"), r.getAs[Int]("rank"), r.getAs[Long]("id"))).toSeq ==
        Seq((0.0, 1, 1L), (0.0, 2, 2L), (1.0, 1, 4L), (1.0, 2, 5L))
    )
    // the emitted score is the original, not the internal hardness
    assert(got(0).getAs[Double]("score") == 0.9)
    assert(got(2).getAs[Double]("score") == 0.1)
  }

  test("fitWeighted: integer weight w equals the row duplicated w times; weight 1 equals fit") {
    val base = (0 until 30)
      .map(i => (i.toLong, if (i % 2 == 0) 1.0 else 0.0, LogitSpecData.x1(i)))
    val dfW = base
      .map { case (id, y, x) => (id, y, x, if (id % 5 == 0) 3.0 else 1.0) }
      .toDF("id", "y", "x", "w")
    val duplicated = base
      .flatMap { case (id, y, x) =>
        Seq.fill(if (id % 5 == 0) 3 else 1)((id, y, x, 1.0))
      }
      .toDF("id", "y", "x", "w")
    val a = Logit.fitWeighted(dfW, "y", Seq("x"), "w", iters = 6, lr = 2.0)
    val b = Logit.fitWeighted(duplicated, "y", Seq("x"), "w", iters = 6, lr = 2.0)
    assert(a.weights == b.weights)
    // constant weight 1 reduces to the unweighted fit exactly
    val allOnes = base.map { case (id, y, x) => (id, y, x, 1.0) }.toDF("id", "y", "x", "w")
    val c = Logit.fitWeighted(allOnes, "y", Seq("x"), "w", iters = 6, lr = 2.0)
    val d = Logit.fit(allOnes, "y", Seq("x"), iters = 6, lr = 2.0)
    assert(c.weights == d.weights)
    // weighted fit is partitioning-invariant too
    val e = Logit.fitWeighted(dfW.repartition(7), "y", Seq("x"), "w", iters = 6, lr = 2.0)
    assert(e.weights == a.weights)
    // zero total weight is a loud error
    val zeros = base.map { case (id, y, x) => (id, y, x, 0.0) }.toDF("id", "y", "x", "w")
    intercept[IllegalArgumentException](
      Logit.fitWeighted(zeros, "y", Seq("x"), "w", 1, 1.0)
    )
  }

  test("featureStats: point-biserial is ±1 on perfect (anti-)predictors, NULL on constants") {
    val df = (0 until 40)
      .map { i =>
        val y = if (i % 4 == 0) 1.0 else 0.0
        (i.toLong, y, y, 1.0 - y, 0.5)
      }
      .toDF("id", "y", "same", "anti", "const")
    val got = Logit
      .featureStats(df, "y", Seq("same", "anti", "const"))
      .orderBy("feature")
      .collect()
    assert(got.map(_.getString(0)).toSeq == Seq("anti", "const", "same"))
    assert(got.forall(_.getAs[Long]("n") == 40L))
    assert(got.forall(_.getAs[Long]("n_pos") == 10L))
    assert(got(2).getAs[Double]("corr") == 1.0)
    assert(got(0).getAs[Double]("corr") == -1.0)
    assert(got(1).isNullAt(got(1).fieldIndex("corr"))) // zero variance
    assert(got(1).getAs[Double]("mean_pos") == 0.5)
    assert(got(1).getAs[Double]("mean_neg") == 0.5)
    // single-class frame: means for the absent class and corr are NULL
    val onlyPos = df.filter(col("y") === 1.0)
    val op = Logit.featureStats(onlyPos, "y", Seq("same")).collect()(0)
    assert(op.isNullAt(op.fieldIndex("mean_neg")))
    assert(op.isNullAt(op.fieldIndex("corr")))
  }

  test("fit requires features, iterations, and rows") {
    val df = Seq((1.0, 0.5)).toDF("y", "x")
    intercept[IllegalArgumentException](Logit.fit(df, "y", Seq.empty, 3, 1.0))
    intercept[IllegalArgumentException](Logit.fit(df, "y", Seq("x"), 0, 1.0))
    intercept[IllegalArgumentException](
      Logit.fit(df.filter(lit(false)), "y", Seq("x"), 1, 1.0)
    )
  }
}

/** Deterministic pseudo-features (no RNG in specs — same policy as the
  * workflow scripts): low-discrepancy fractional parts, round6'd as
  * [[Logit.fit]] requires.
  */
object LogitSpecData {
  private def frac(v: Double): Double =
    math.rint((v - math.floor(v)) * 1e6) / 1e6
  def x1(i: Int): Double = frac(i * 0.6180339887)
  def x2(i: Int): Double = frac(i * 0.4142135623)
}
