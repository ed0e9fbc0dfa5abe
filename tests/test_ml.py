"""pyspark.ml conformance: Pipeline / CrossValidator / MLWriter round-trip
for the SparkLM / SparkGLM wrappers (SURVEY §1.5; reference
predict-as-transform LM.scala:29-61)."""

import numpy as np
import pytest
from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import functions as F

from sparkglm_spark import glm, lm
from sparkglm_spark.ml import SparkGLM, SparkGLMModel, SparkLM, SparkLMModel


@pytest.fixture(scope="module")
def li(lineitem):
    return lineitem.select(
        "l_extendedprice", "l_quantity", "l_discount", "l_returnflag"
    ).limit(4000)


def test_pipeline_fit_matches_functional_lm(li):
    est = SparkLM(formula="l_extendedprice ~ l_quantity + l_discount + l_returnflag")
    pipe_model = Pipeline(stages=[est]).fit(li)
    assert isinstance(pipe_model, PipelineModel)
    wrapped = pipe_model.stages[0]
    assert isinstance(wrapped, SparkLMModel)

    bare = lm(li, "l_extendedprice ~ l_quantity + l_discount + l_returnflag")
    assert wrapped.model.xnames == bare.xnames
    np.testing.assert_allclose(wrapped.model.coefs, bare.coefs, rtol=1e-12)

    scored = pipe_model.transform(li)
    assert scored.columns == li.columns + ["prediction"]
    a = [r.prediction for r in scored.limit(50).collect()]
    b = [r.prediction for r in bare.predict(li).limit(50).collect()]
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_transform_is_single_projection(li):
    from sparkglm_spark.plans.inspect import formatted_plan

    model = SparkLM(formula="l_extendedprice ~ l_quantity").fit(li)
    assert "Exchange" not in formatted_plan(model.transform(li))  # no shuffle


def test_estimator_params_and_copy(li):
    est = SparkLM(formula="l_extendedprice ~ l_quantity", l2=0.5, predictionCol="p")
    assert est.getL2() == 0.5
    c = est.copy({est.l2: 1.5})
    assert c.getL2() == 1.5 and est.getL2() == 0.5  # copy doesn't mutate
    m = est.fit(li)
    assert m.getPredictionCol() == "p"  # params flow estimator -> model
    assert "p" in m.transform(li).columns
    with pytest.raises(TypeError):
        SparkLM(nope=1)
    with pytest.raises(ValueError):
        SparkLM().fit(li)  # formula required


def test_cross_validator_over_l2_grid(spark):
    # synthetic y = 3x + eps so the grid has a real signal to rank:
    # an absurd ridge penalty shrinks the slope to ~0 and must lose
    rng = np.random.default_rng(11)
    x = rng.normal(0, 2, 600)
    y = 3.0 * x + rng.normal(0, 0.5, 600)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    est = SparkLM(formula="y ~ x")
    grid = ParamGridBuilder().addGrid(est.l2, [0.0, 1e9]).build()
    ev = RegressionEvaluator(
        labelCol="y", predictionCol="prediction", metricName="rmse"
    )
    cv = CrossValidator(
        estimator=est, estimatorParamMaps=grid, evaluator=ev, numFolds=2, seed=7
    )
    cv_model = cv.fit(df)
    assert isinstance(cv_model.bestModel, SparkLMModel)
    assert cv_model.bestModel.getL2() == 0.0
    assert len(cv_model.avgMetrics) == 2
    assert cv_model.avgMetrics[0] < cv_model.avgMetrics[1]


def test_lm_model_save_load_round_trip(li, tmp_path):
    est = SparkLM(
        formula="l_extendedprice ~ l_quantity + l_returnflag", predictionCol="yhat"
    )
    model = est.fit(li)
    path = str(tmp_path / "lmmodel")
    model.write().save(path)
    loaded = SparkLMModel.load(path)
    assert loaded.getPredictionCol() == "yhat"
    assert loaded.model.xnames == model.model.xnames
    np.testing.assert_allclose(loaded.model.coefs, model.model.coefs, rtol=0)
    assert loaded.model.levels == model.model.levels  # novel-level zero-backfill intact
    a = [r.yhat for r in model.transform(li).limit(20).collect()]
    b = [r.yhat for r in loaded.transform(li).limit(20).collect()]
    np.testing.assert_allclose(a, b, rtol=0)


def test_estimator_save_load_round_trip(tmp_path):
    est = SparkLM(formula="y ~ x", l2=2.0, weightCol="w", sseMode="moments")
    path = str(tmp_path / "lmest")
    est.write().save(path)
    loaded = SparkLM.load(path)
    assert loaded.getFormula() == "y ~ x"
    assert loaded.getL2() == 2.0
    assert loaded.getWeightCol() == "w"


def test_glm_estimator_matches_functional_glm(orders):
    df = orders.select(
        (F.col("o_totalprice") > 150000).cast("double").alias("big"),
        (F.col("o_custkey") % 97).cast("double").alias("ship"),
        "o_orderpriority",
    ).limit(3000)
    est = SparkGLM(formula="big ~ ship + o_orderpriority", family="binomial")
    model = est.fit(df)
    bare = glm(df, "big ~ ship + o_orderpriority", family="binomial")
    np.testing.assert_allclose(model.model.coefs, bare.coefs, rtol=1e-10)
    assert model.model.iter == bare.iter

    mu = model.transform(df).select("prediction").limit(20).collect()
    assert all(0.0 <= r.prediction <= 1.0 for r in mu)
    eta_model = model.copy({model.predictionType: "link"})
    eta = eta_model.transform(df).select("prediction").limit(20).collect()
    lo = [np.log(r.prediction / (1 - r.prediction)) for r in mu]
    np.testing.assert_allclose([r.prediction for r in eta], lo, rtol=1e-9)


def test_glm_model_save_load_round_trip(orders, tmp_path):
    df = orders.select(
        (F.col("o_totalprice") > 150000).cast("double").alias("big"),
        (F.col("o_custkey") % 97).cast("double").alias("ship"),
    ).limit(2000)
    model = SparkGLM(formula="big ~ ship", family="binomial").fit(df)
    path = str(tmp_path / "glmmodel")
    model.write().save(path)
    loaded = SparkGLMModel.load(path)
    np.testing.assert_allclose(loaded.model.coefs, model.model.coefs, rtol=0)
    assert loaded.model.family == "binomial"
    assert loaded.getFamily() == "binomial"
    # kind guard: loading a GLM path as an LM model must fail loudly
    with pytest.raises(ValueError, match="expected LM"):
        SparkLMModel.load(path)


def test_pipeline_model_save_load(li, tmp_path):
    pipe = Pipeline(stages=[SparkLM(formula="l_extendedprice ~ l_quantity")])
    pm = pipe.fit(li)
    path = str(tmp_path / "pipemodel")
    pm.write().save(path)
    loaded = PipelineModel.load(path)
    a = [r.prediction for r in pm.transform(li).limit(10).collect()]
    b = [r.prediction for r in loaded.transform(li).limit(10).collect()]
    np.testing.assert_allclose(a, b, rtol=0)


# ---------------------------------------------------------------------------
# r7: PCA and WordPiece Estimator/Model pairs
# ---------------------------------------------------------------------------


def test_pca_pipeline_composes_with_lm(li):
    """Pipeline(SparkPCA -> SparkLM over pc_ columns): the classic
    reduce-then-regress chain as stock pyspark.ml stages."""
    from sparkglm_spark.ml import SparkPCA, SparkPCAModel
    from sparkglm_spark.operators.pca import pca_fit

    cols = ["l_quantity", "l_discount"]
    pca = SparkPCA(inputCols=cols, k=2)
    lm_stage = SparkLM(formula="l_extendedprice ~ pc_1 + pc_2")
    pm = Pipeline(stages=[pca, lm_stage]).fit(li)
    assert isinstance(pm.stages[0], SparkPCAModel)

    bare = pca_fit(li, cols, 2)
    np.testing.assert_allclose(
        pm.stages[0].model.components, bare.components, rtol=1e-12
    )
    scored = pm.transform(li)
    assert {"pc_1", "pc_2", "prediction"} <= set(scored.columns)
    # projections are expression columns — no shuffle added by transform
    from sparkglm_spark.plans.inspect import formatted_plan

    assert "Exchange" not in formatted_plan(pm.stages[0].transform(li))


def test_pca_model_save_load(li, tmp_path):
    from sparkglm_spark.ml import SparkPCA, SparkPCAModel

    model = SparkPCA(inputCols=["l_quantity", "l_discount", "l_extendedprice"], k=2).fit(li)
    path = str(tmp_path / "pcamodel")
    model.write().save(path)
    loaded = SparkPCAModel.load(path)
    np.testing.assert_allclose(loaded.model.components, model.model.components)
    np.testing.assert_allclose(loaded.model.means, model.model.means)
    np.testing.assert_allclose(
        loaded.model.explained_variance_ratio,
        model.model.explained_variance_ratio,
    )
    a = model.transform(li).select("pc_1").limit(10).collect()
    b = loaded.transform(li).select("pc_1").limit(10).collect()
    np.testing.assert_allclose([r.pc_1 for r in a], [r.pc_1 for r in b], rtol=0)
    with pytest.raises(ValueError, match="inputCols"):
        SparkPCA().fit(li)


def test_wordpiece_estimator_fits_and_tokenizes(documents, tmp_path):
    from sparkglm_spark.ml import SparkWordPiece, SparkWordPieceModel
    from sparkglm_spark.operators.tokenize import (
        build_wordpiece_vocab,
        tokenize_wordpiece,
    )

    docs = documents.select("doc_id", "text").limit(200)
    est = SparkWordPiece(vocabSize=200, minFreq=2)
    model = est.fit(docs)
    assert model.vocab == build_wordpiece_vocab(docs, vocab_size=200, min_freq=2)

    got = model.transform(docs)
    assert {"token_ids", "n_tokens_wp", "n_unk"} <= set(got.columns)
    bare = tokenize_wordpiece(docs, model.vocab)
    a = {r.doc_id: r.token_ids for r in got.collect()}
    b = {r.doc_id: r.token_ids for r in bare.collect()}
    assert a == b
    # self-vocab => zero UNK on the source corpus (char fallback)
    assert all(r.n_unk == 0 for r in bare.collect())

    # save/load round-trip: identical vocab, identical ids
    path = str(tmp_path / "wpmodel")
    model.write().save(path)
    loaded = SparkWordPieceModel.load(path)
    assert loaded.vocab == model.vocab
    c = {r.doc_id: r.token_ids for r in loaded.transform(docs).collect()}
    assert c == b
    # kind guard across model families
    with pytest.raises(ValueError, match="expected pca"):
        from sparkglm_spark.ml import SparkPCAModel

        SparkPCAModel.load(path)


def test_wordpiece_model_accepts_external_vocab(documents):
    """BERT-style externally trained vocab drops straight in — no fit."""
    from sparkglm_spark.ml import SparkWordPieceModel

    docs = documents.select("doc_id", "text").limit(20)
    vocab = ["[PAD]", "[UNK]"] + list("abcdefghijklmnopqrstuvwxyz") + [
        f"##{c}" for c in "abcdefghijklmnopqrstuvwxyz"
    ]
    model = SparkWordPieceModel(vocab)
    out = model.transform(docs).collect()
    assert all(r.n_tokens_wp > 0 for r in out)


def test_corpus_prep_transformer_pipeline(documents):
    """Pipeline([SparkCorpusPrep, SparkWordPiece]): Pipeline.fit runs the
    curation transform FIRST, so the vocab fits on the curated corpus —
    equivalent to the functional chain."""
    from sparkglm_spark.ml import SparkCorpusPrep, SparkWordPiece
    from sparkglm_spark.operators.pipeline import prepare_training_corpus
    from sparkglm_spark.operators.tokenize import build_wordpiece_vocab

    docs = documents.select("doc_id", "text").limit(300)
    prep = SparkCorpusPrep(minQuality=0.3)
    pm = Pipeline(stages=[prep, SparkWordPiece(vocabSize=200, minFreq=2)]).fit(docs)

    bare_prepped = prepare_training_corpus(docs, min_quality=0.3)
    assert pm.stages[1].vocab == build_wordpiece_vocab(
        bare_prepped, vocab_size=200, min_freq=2
    )
    out = pm.transform(docs)
    assert {"token_ids", "quality_score", "detected_lang"} <= set(out.columns)
    got_ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    exp_ids = sorted(r.doc_id for r in bare_prepped.select("doc_id").collect())
    assert got_ids == exp_ids
    # stateless transformer round-trips through DefaultParams
    c = prep.copy({prep.minQuality: 0.9})
    assert c.getOrDefault(c.minQuality) == 0.9
    assert prep.getOrDefault(prep.minQuality) == 0.3


def test_glm_cross_validator_over_tol_grid(orders):
    """CrossValidator drives SparkGLM end-to-end (binomial fit per fold,
    RegressionEvaluator over the response-scale mu as Brier score)."""
    df = orders.select(
        (F.col("o_totalprice") > 150000).cast("double").alias("big"),
        (F.col("o_custkey") % 97).cast("double").alias("ship"),
    ).limit(1500)
    est = SparkGLM(formula="big ~ ship", family="binomial")
    grid = ParamGridBuilder().addGrid(est.maxIter, [1, 25]).build()
    ev = RegressionEvaluator(labelCol="big", predictionCol="prediction",
                             metricName="rmse")
    cv = CrossValidator(estimator=est, estimatorParamMaps=grid,
                        evaluator=ev, numFolds=2, seed=3)
    cv_model = cv.fit(df)
    assert isinstance(cv_model.bestModel, SparkGLMModel)
    assert len(cv_model.avgMetrics) == 2
    # a converged IRLS cannot lose to a single iteration on Brier score
    assert cv_model.bestModel.getMaxIter() == 25


def test_cross_validator_model_save_load(spark, tmp_path):
    """CrossValidatorModel persistence composes with the wrappers' custom
    MLWritable (users persist tuned models, not just bare ones)."""
    from pyspark.ml.tuning import CrossValidatorModel

    rng = np.random.default_rng(5)
    x = rng.normal(0, 2, 400)
    y = 3 * x + rng.normal(0, 0.5, 400)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    est = SparkLM(formula="y ~ x")
    cv = CrossValidator(
        estimator=est,
        estimatorParamMaps=ParamGridBuilder().addGrid(est.l2, [0.0, 1e9]).build(),
        evaluator=RegressionEvaluator(labelCol="y"),
        numFolds=2,
        seed=1,
    )
    cvm = cv.fit(df)
    path = str(tmp_path / "cvm")
    cvm.write().save(path)
    loaded = CrossValidatorModel.load(path)
    assert loaded.bestModel.getL2() == 0.0
    a = [r.prediction for r in cvm.bestModel.transform(df).limit(5).collect()]
    b = [r.prediction for r in loaded.bestModel.transform(df).limit(5).collect()]
    np.testing.assert_allclose(a, b, rtol=0)


def test_spark_binary_evaluator_in_cross_validator(orders):
    """The engine's own Evaluator drives CrossValidator selection by AUC:
    the real predictor must beat the junk predictor; log_loss flips
    isLargerBetter; the standalone evaluate() matches the operator."""
    from sparkglm_spark.ml import SparkBinaryEvaluator
    from sparkglm_spark.operators.evaluate import binary_classification_eval

    # ~9% deterministic label flips — keeps the signal predictive but
    # breaks perfect separation (separable data drives the IRLS binomial
    # variance to exactly 0 → DIVIDE_BY_ZERO under ANSI mode)
    df = orders.select(
        (
            (F.col("o_totalprice") > 150000) != (F.col("o_orderkey") % 11 == 0)
        ).cast("double").alias("big"),
        (F.col("o_totalprice") / 100000.0).alias("signal"),
        (F.col("o_custkey") % 7).cast("double").alias("junk"),
    ).limit(2000)
    ev = SparkBinaryEvaluator(labelCol="big", scoreCol="prediction",
                              metricName="auc")
    assert ev.isLargerBetter()
    est = SparkGLM(formula="big ~ signal", family="binomial")
    grid = (
        ParamGridBuilder()
        .addGrid(est.formula, ["big ~ signal", "big ~ junk"])
        .build()
    )
    cv = CrossValidator(estimator=est, estimatorParamMaps=grid,
                        evaluator=ev, numFolds=2, seed=9)
    cv_model = cv.fit(df)
    assert cv_model.bestModel.getFormula() == "big ~ signal"
    auc_signal, auc_junk = cv_model.avgMetrics
    assert auc_signal > 0.8
    assert auc_junk < 0.6

    # standalone evaluate() ≡ the operator row
    scored = cv_model.bestModel.transform(df)
    want = {
        r.metric: r.value
        for r in binary_classification_eval(scored, "big", "prediction").collect()
    }
    assert ev.evaluate(scored) == pytest.approx(want["auc"], rel=1e-12)
    ll = SparkBinaryEvaluator(labelCol="big", scoreCol="prediction",
                              metricName="log_loss")
    assert not ll.isLargerBetter()
    assert ll.evaluate(scored) == pytest.approx(want["log_loss"], rel=1e-12)
    with pytest.raises(ValueError, match="metricName"):
        SparkBinaryEvaluator(metricName="nope").evaluate(scored)

def test_huber_pipeline_and_save_load(li, tmp_path):
    from sparkglm_spark.ml import SparkHuberLM, SparkHuberLMModel
    from sparkglm_spark.operators.lm import huber_lm

    est = SparkHuberLM(
        formula="l_extendedprice ~ l_quantity", c=1.345, predictionCol="robust"
    )
    pipe_model = Pipeline(stages=[est]).fit(li)
    wrapped = pipe_model.stages[0]
    assert isinstance(wrapped, SparkHuberLMModel)
    bare = huber_lm(li, "l_extendedprice ~ l_quantity", c=1.345)
    np.testing.assert_allclose(wrapped.model.coefs, bare.coefs, rtol=1e-12)
    assert wrapped.model.scale == pytest.approx(bare.scale, rel=1e-12)

    scored = pipe_model.transform(li)
    assert scored.columns == li.columns + ["robust"]

    path = str(tmp_path / "hubermodel")
    wrapped.write().save(path)
    loaded = SparkHuberLMModel.load(path)
    assert loaded.getPredictionCol() == "robust"
    np.testing.assert_allclose(loaded.model.coefs, wrapped.model.coefs, rtol=0)
    assert loaded.model.scale == wrapped.model.scale
    assert loaded.model.converged == wrapped.model.converged
    a = [r.robust for r in wrapped.transform(li).limit(20).collect()]
    b = [r.robust for r in loaded.transform(li).limit(20).collect()]
    np.testing.assert_allclose(a, b, rtol=0)


def test_coxph_pipeline_and_save_load(spark, tmp_path):
    from sparkglm_spark.ml import SparkCoxPH, SparkCoxPHModel
    from sparkglm_spark.operators.survival import coxph

    rng = np.random.default_rng(17)
    n = 300
    x = rng.normal(0, 1, n)
    t = np.round(rng.exponential(1.0 / np.exp(0.6 * x)), 1) + 0.1
    e = (rng.random(n) < 0.7).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(t, e, x)],
        "time double, event double, x double",
    )
    est = SparkCoxPH(featureCols=["x"], predictionCol="hr")
    pipe_model = Pipeline(stages=[est]).fit(df)
    wrapped = pipe_model.stages[0]
    assert isinstance(wrapped, SparkCoxPHModel)
    bare = coxph(df, "time", "event", ["x"])
    np.testing.assert_allclose(wrapped.model.coefs, bare.coefs, rtol=1e-10)

    scored = pipe_model.transform(df)
    assert scored.columns == df.columns + ["hr"]

    path = str(tmp_path / "coxmodel")
    wrapped.write().save(path)
    loaded = SparkCoxPHModel.load(path)
    assert loaded.getOrDefault(loaded.predictionCol) == "hr"
    np.testing.assert_allclose(loaded.model.coefs, wrapped.model.coefs, rtol=0)
    np.testing.assert_allclose(loaded.model.se, wrapped.model.se, rtol=0)
    assert loaded.model.loglik == wrapped.model.loglik
    assert loaded.model.n_events == wrapped.model.n_events
    # cov_params + time settings survive -> baseline/survival work post-load
    base = loaded.model.baseline_hazard(df)
    assert base.count() > 0
    surv = loaded.model.predict_survival(df, [1.0], baseline=base)
    assert any(c.startswith("surv_") for c in surv.columns)
    a = [r.hr for r in wrapped.transform(df).limit(20).collect()]
    b = [r.hr for r in loaded.transform(df).limit(20).collect()]
    np.testing.assert_allclose(a, b, rtol=0)


def test_coxph_estimator_requires_features(spark):
    from sparkglm_spark.ml import SparkCoxPH

    df = spark.createDataFrame([(1.0, 1.0)], "time double, event double")
    with pytest.raises(ValueError, match="featureCols"):
        SparkCoxPH().fit(df)

def test_quantile_pipeline_and_save_load(li, tmp_path):
    from sparkglm_spark.ml import SparkQuantileLM, SparkQuantileLMModel
    from sparkglm_spark.operators.lm import quantile_lm

    est = SparkQuantileLM(
        formula="l_extendedprice ~ l_quantity", q=0.9, predictionCol="p90"
    )
    pipe_model = Pipeline(stages=[est]).fit(li)
    wrapped = pipe_model.stages[0]
    assert isinstance(wrapped, SparkQuantileLMModel)
    bare = quantile_lm(li, "l_extendedprice ~ l_quantity", q=0.9)
    np.testing.assert_allclose(wrapped.model.coefs, bare.coefs, rtol=1e-10)
    assert wrapped.model.q == 0.9

    scored = pipe_model.transform(li)
    assert scored.columns == li.columns + ["p90"]

    path = str(tmp_path / "qmodel")
    wrapped.write().save(path)
    loaded = SparkQuantileLMModel.load(path)
    assert loaded.getPredictionCol() == "p90"
    np.testing.assert_allclose(loaded.model.coefs, wrapped.model.coefs, rtol=0)
    assert loaded.model.q == 0.9 and loaded.model.converged
    a = [r.p90 for r in wrapped.transform(li).limit(10).collect()]
    b = [r.p90 for r in loaded.transform(li).limit(10).collect()]
    np.testing.assert_allclose(a, b, rtol=0)

def test_weibull_aft_pipeline_and_save_load(spark, tmp_path):
    from sparkglm_spark.ml import SparkWeibullAFT, SparkWeibullAFTModel
    from sparkglm_spark.operators.survival import weibull_aft

    rng = np.random.default_rng(59)
    n = 250
    x = rng.normal(0, 1, n)
    w = np.log(-np.log(rng.random(n)))
    t = np.exp(0.5 + 0.6 * x + 0.5 * w)
    e = (rng.random(n) < 0.8).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(t, e, x)],
        "time double, event double, x double",
    )
    est = SparkWeibullAFT(featureCols=["x"], predictionCol="med_t")
    pipe_model = Pipeline(stages=[est]).fit(df)
    wrapped = pipe_model.stages[0]
    assert isinstance(wrapped, SparkWeibullAFTModel)
    bare = weibull_aft(df, "time", "event", ["x"])
    np.testing.assert_allclose(wrapped.model.coefs, bare.coefs, rtol=1e-10)
    assert wrapped.model.scale == pytest.approx(bare.scale, rel=1e-10)

    scored = pipe_model.transform(df)
    assert scored.columns == df.columns + ["med_t"]

    path = str(tmp_path / "aftmodel")
    wrapped.write().save(path)
    loaded = SparkWeibullAFTModel.load(path)
    np.testing.assert_allclose(loaded.model.coefs, wrapped.model.coefs, rtol=0)
    assert loaded.model.scale == wrapped.model.scale
    assert loaded.model.loglik == wrapped.model.loglik
    # closed-form survival works after the round-trip
    sv = loaded.model.predict_survival(df.limit(3), [2.0]).collect()
    assert all(0.0 <= r.surv_2 <= 1.0 for r in sv)
    a = [r.med_t for r in wrapped.transform(df).limit(10).collect()]
    b = [r.med_t for r in loaded.transform(df).limit(10).collect()]
    np.testing.assert_allclose(a, b, rtol=0)


def test_isotonic_calibrator_pipeline_and_save_load(li, tmp_path):
    """SparkIsotonicCalibrator as a Pipeline recalibration stage after
    SparkGLM: the calibrated column appears, the model round-trips
    through the shared JSON MLWriter, and the loaded knots/scores are
    bit-identical."""
    from sparkglm_spark.ml import (
        SparkGLM,
        SparkIsotonicCalibrationModel,
        SparkIsotonicCalibrator,
    )

    df = li.withColumn(
        "y",
        ((F.col("l_quantity") > 25) != (F.abs(F.hash("l_extendedprice")) % 7 == 0))
        .cast("double"),
    )
    pipe = Pipeline(
        stages=[
            SparkGLM(formula="y ~ l_quantity", family="binomial"),
            SparkIsotonicCalibrator(labelCol="y", scoreCol="prediction"),
        ]
    )
    model = pipe.fit(df)
    cal = model.stages[1]
    assert isinstance(cal, SparkIsotonicCalibrationModel)
    scored = model.transform(df)
    assert "calibrated" in scored.columns
    row = scored.agg(
        F.min("calibrated"), F.max("calibrated"),
        F.sum(F.col("calibrated").isNull().cast("int")),
    ).collect()[0]
    assert 0.0 <= row[0] <= row[1] <= 1.0 and row[2] == 0

    path = str(tmp_path / "isomodel")
    cal.write().save(path)
    loaded = SparkIsotonicCalibrationModel.load(path)
    np.testing.assert_array_equal(loaded.model.boundaries, cal.model.boundaries)
    np.testing.assert_array_equal(loaded.model.predictions, cal.model.predictions)
    a = [r.calibrated for r in cal.transform(
        df.withColumn("prediction", F.col("l_quantity") / 50.0)
    ).limit(20).collect()]
    b = [r.calibrated for r in loaded.transform(
        df.withColumn("prediction", F.col("l_quantity") / 50.0)
    ).limit(20).collect()]
    np.testing.assert_allclose(a, b, rtol=0)


def test_huber_quantile_estimators_weightcol(spark):
    """r12: SparkHuberLM/SparkQuantileLM weightCol forwards to the
    function surface — estimator fit equals the direct call."""
    import numpy as np

    from sparkglm_spark.ml import SparkHuberLM, SparkQuantileLM
    from sparkglm_spark.operators.lm import huber_lm, quantile_lm

    rng = np.random.default_rng(7)
    rows = [
        (
            float(2.0 + 1.5 * x + rng.normal(0, 0.4))
            + (20.0 if i % 17 == 0 else 0.0),
            float(x),
            float(1 + (i % 2)),
        )
        for i, x in enumerate(rng.normal(0, 1, 120))
    ]
    df = spark.createDataFrame(rows, "y double, x double, w double")
    hm = SparkHuberLM(formula="y ~ x", weightCol="w", maxIter=3).fit(df)
    hf = huber_lm(df, "y ~ x", max_iter=3, weight_col="w")
    assert float(hm.model.coefs[1]) == float(hf.coefs[1])
    qm = SparkQuantileLM(formula="y ~ x", weightCol="w", maxIter=4).fit(df)
    qf = quantile_lm(df, "y ~ x", max_iter=4, weight_col="w")
    assert float(qm.model.coefs[1]) == float(qf.coefs[1])


def test_glm_estimator_negbinomial_nb_alpha_forwarding(li):
    # r14: nbAlpha must reach glm() — before this Param a negbinomial
    # SparkGLM silently fit at the default alpha = 1.0
    from sparkglm_spark import glm as bare_glm

    est = SparkGLM(formula="l_quantity ~ l_discount", family="negbinomial",
                   nbAlpha=0.4)
    model = est.fit(li)
    bare = bare_glm(li, "l_quantity ~ l_discount", family="negbinomial",
                    nb_alpha=0.4)
    np.testing.assert_allclose(model.model.coefs, bare.coefs, rtol=1e-12)
    other = bare_glm(li, "l_quantity ~ l_discount", family="negbinomial",
                     nb_alpha=1.0)
    assert abs(model.model.coefs[1] - other.coefs[1]) > 0  # alpha matters


def test_glm_estimator_estimate_dispersion(li, tmp_path):
    # estimateDispersion routes through glm_nb; theta/se_theta survive
    # the MLWriter round-trip (persist.py extras, r14)
    from sparkglm_spark import glm_nb

    est = SparkGLM(formula="l_quantity ~ l_discount", family="negbinomial",
                   estimateDispersion=True)
    model = est.fit(li)
    bare = glm_nb(li, "l_quantity ~ l_discount")
    np.testing.assert_allclose(model.model.coefs, bare.coefs, rtol=1e-10)
    assert abs(model.model.theta - bare.theta) < 1e-8 * (1 + bare.theta)
    path = str(tmp_path / "glmnbmodel")
    model.write().save(path)
    loaded = SparkGLMModel.load(path)
    assert abs(loaded.model.theta - bare.theta) < 1e-12 * (1 + bare.theta)
    assert abs(loaded.model.se_theta - bare.se_theta) < 1e-12
    assert loaded.model.nb_alpha == pytest.approx(1.0 / bare.theta)
    # transform still scores (a GLM like any other)
    mu = loaded.transform(li).select("prediction").limit(5).collect()
    assert all(r.prediction > 0 for r in mu)


def test_glm_estimator_estimate_dispersion_guards(li):
    with pytest.raises(ValueError, match="negbinomial-only"):
        SparkGLM(formula="l_quantity ~ l_discount", family="poisson",
                 estimateDispersion=True).fit(li)
    with pytest.raises(ValueError, match="unpenalized"):
        SparkGLM(formula="l_quantity ~ l_discount", family="negbinomial",
                 estimateDispersion=True, regParam=0.1).fit(li)


def test_glm_nb_functional_save_load_round_trip(li, tmp_path):
    # save_model/load_model (persist.py) carries the glm_nb extras
    from sparkglm_spark import glm_nb
    from sparkglm_spark.persist import load_model, save_model

    m = glm_nb(li, "l_quantity ~ l_discount", max_iter=4)
    p = str(tmp_path / "glmnb.json")
    save_model(m, p)
    back = load_model(p)
    np.testing.assert_allclose(back.coefs, m.coefs, rtol=0)
    assert back.theta == m.theta
    assert back.se_theta == m.se_theta
    assert back.nb_alpha == m.nb_alpha
    assert back.outer_iter == m.outer_iter
    assert back.aic == m.aic


def test_aft_estimator_dist_and_interval(li, tmp_path):
    # r14: SparkWeibullAFT(dist=, time2Col=) forwards to survreg's new
    # surfaces; dist survives the MLWriter round-trip (persist.py)
    import pandas as pd

    from sparkglm_spark import SparkWeibullAFT, SparkWeibullAFTModel, survreg

    spark = li.sparkSession
    rng = np.random.default_rng(17)
    n = 800
    x = rng.uniform(0, 1, n)
    u = rng.uniform(size=n)
    T = np.exp(3.0 + 0.8 * x + 0.5 * np.log(u / (1 - u)))
    ev = (rng.uniform(size=n) < 0.8).astype(float)
    df = spark.createDataFrame(
        pd.DataFrame({"time": T, "event": ev, "x": x}))
    est = SparkWeibullAFT(featureCols=["x"], dist="loglogistic")
    model = est.fit(df)
    bare = survreg(df, "time", "event", ["x"], dist="loglogistic")
    np.testing.assert_allclose(model.model.coefs, bare.coefs, rtol=1e-10)
    assert model.model.dist == "loglogistic"
    path = str(tmp_path / "llaftmodel")
    model.write().save(path)
    loaded = SparkWeibullAFTModel.load(path)
    assert loaded.model.dist == "loglogistic"
    np.testing.assert_allclose(loaded.model.coefs, bare.coefs, rtol=0)
    # interval forwarding: a code-3 frame fits through time2Col
    code = np.where(rng.uniform(size=n) < 0.4, 3.0, 1.0)
    t2 = np.where(code == 3.0, T * 1.5, np.nan)
    t1 = np.where(code == 3.0, T * 0.8, T)
    dfi = spark.createDataFrame(
        pd.DataFrame({"time": t1, "event": code, "t2": t2, "x": x}))
    mi = SparkWeibullAFT(featureCols=["x"], time2Col="t2").fit(dfi)
    bi = survreg(dfi, "time", "event", ["x"], time2_col="t2")
    np.testing.assert_allclose(mi.model.coefs, bi.coefs, rtol=1e-10)
