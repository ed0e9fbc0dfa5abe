"""pyspark.ml conformance layer: Estimator/Model wrappers for lm/glm.

SURVEY §1.5 maps the reference's model objects onto "MLlib
`Estimator/Model` params; persist via MLWriter-style JSON", and the
reference exposes predict-as-transform (LM.scala:29-61 `predict(df)`
returns a scored frame). This module makes that mapping literal:

- `SparkLM` / `SparkGLM` are `pyspark.ml.Estimator` subclasses with
  declared `Param`s (formula-flavored — no VectorAssembler required:
  the formula front-end already owns encoding), so they compose with
  `pyspark.ml.Pipeline`, `CrossValidator`, and `ParamGridBuilder`
  exactly like built-in estimators.
- `SparkLMModel` / `SparkGLMModel` are `pyspark.ml.Model`s whose
  `transform()` is the existing keyed predict (append `predictionCol`,
  input rows untouched) — the same single-projection scoring plan as
  `LM.predict` / `GLM.predict`, nothing re-implemented.
- Persistence is `MLWriter`/`MLReader` over the `persist.py` JSON
  document: `model.write().save(path)` writes MLlib-style
  `metadata/` plus a single-partition `model/` text dir holding the
  JSON, both via the SparkContext so HDFS/S3 paths work on a cluster
  (fitted state is O(k) — coefficients + stats — so one JSON line is
  the right weight at any data scale).

Estimators hold no fitted state, so they use the stock
`DefaultParamsWritable` round-trip.

The same protocol extends beyond the reference surface (r7):
`SparkPCA`/`SparkPCAModel` (one-Gram-pass covariance, codegen
projections) and `SparkWordPiece`/`SparkWordPieceModel` (corpus vocab
fit, zero-shuffle Arrow tokenize) — so reduce-then-regress and
text→token_ids chains compose as stock Pipeline stages — and (r8)
`SparkHuberLM` / `SparkCoxPH`, completing the rule that every fitted
model family in the engine is Pipeline-composable and MLWritable. Each
model implements `_payload_dict()` / `_from_payload()` for the shared
JSON writer.

Scale: `fit()` is the existing one-pass Gram / fused-IRLS plan (all
reduction happens in Catalyst partial aggregation; the driver touches
k×k matrices only), and `transform()` is one whole-stage-codegen
projection — the wrapper adds zero per-row work and zero extra jobs.
"""

from __future__ import annotations

import json

from pyspark.ml import Estimator, Model, Transformer
from pyspark.ml.evaluation import Evaluator
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import (
    DefaultParamsReadable,
    DefaultParamsReader,
    DefaultParamsWritable,
    DefaultParamsWriter,
    MLReadable,
    MLReader,
    MLWritable,
    MLWriter,
)
from pyspark.sql import DataFrame

from sparkglm_spark.operators.enet import (
    ElasticNetLM,
    GLMElasticNet,
    elastic_net,
    glm_elastic_net,
)
from sparkglm_spark.operators.glm import GLM, glm, glm_nb
from sparkglm_spark.operators.lm import LM, lm
from sparkglm_spark.persist import model_from_dict, model_to_dict


# ---------------------------------------------------------------------------
# Shared params
# ---------------------------------------------------------------------------


class _FormulaParams(Params):
    """Params shared by both estimators and their models. String params
    that are optional in the functional API use '' for "unset" (the
    MLlib convention for optional column params)."""

    formula = Param(
        Params._dummy(),
        "formula",
        "R-style model formula, e.g. 'y ~ x1 + x2' or 'y ~ .'",
        typeConverter=TypeConverters.toString,
    )
    predictionCol = Param(
        Params._dummy(),
        "predictionCol",
        "output column appended by transform()",
        typeConverter=TypeConverters.toString,
    )
    naAction = Param(
        Params._dummy(),
        "naAction",
        "NA handling before fitting: 'omit' or 'keep'",
        typeConverter=TypeConverters.toString,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(predictionCol="prediction", naAction="omit")

    def getFormula(self) -> str:
        return self.getOrDefault(self.formula)

    def getPredictionCol(self) -> str:
        return self.getOrDefault(self.predictionCol)

    def getNaAction(self) -> str:
        return self.getOrDefault(self.naAction)


class _SparkLMParams(_FormulaParams):
    weightCol = Param(
        Params._dummy(),
        "weightCol",
        "weight column for WLS ('' = unweighted OLS)",
        typeConverter=TypeConverters.toString,
    )
    l2 = Param(
        Params._dummy(),
        "l2",
        "ridge penalty lambda (0.0 = OLS); intercept unpenalized",
        typeConverter=TypeConverters.toFloat,
    )
    sseMode = Param(
        Params._dummy(),
        "sseMode",
        "residual-stat strategy: 'moments' (fused single pass) or 'residual'",
        typeConverter=TypeConverters.toString,
    )
    regParam = Param(
        Params._dummy(),
        "regParam",
        "MLlib-convention elastic-net penalty lambda (> 0 routes the fit "
        "through coordinate descent; composes with weightCol as in MLlib "
        "LinearRegression; mutually exclusive with l2)",
        typeConverter=TypeConverters.toFloat,
    )
    elasticNetParam = Param(
        Params._dummy(),
        "elasticNetParam",
        "L1 mixing alpha in [0, 1]: 1 = lasso, 0 = ridge (MLlib "
        "LinearRegression convention; only used when regParam > 0)",
        typeConverter=TypeConverters.toFloat,
    )
    standardization = Param(
        Params._dummy(),
        "standardization",
        "penalize standardized coefficients (MLlib default True); only "
        "used when regParam > 0",
        typeConverter=TypeConverters.toBoolean,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(
            weightCol="", l2=0.0, sseMode="moments",
            regParam=0.0, elasticNetParam=0.0, standardization=True,
        )

    def getWeightCol(self) -> str:
        return self.getOrDefault(self.weightCol)

    def getL2(self) -> float:
        return self.getOrDefault(self.l2)

    def getSseMode(self) -> str:
        return self.getOrDefault(self.sseMode)

    def getRegParam(self) -> float:
        return self.getOrDefault(self.regParam)

    def getElasticNetParam(self) -> float:
        return self.getOrDefault(self.elasticNetParam)

    def getStandardization(self) -> bool:
        return self.getOrDefault(self.standardization)


class _SparkGLMParams(_FormulaParams):
    family = Param(
        Params._dummy(),
        "family",
        "GLM family: binomial, gaussian, poisson, gamma, tweedie, "
        "negbinomial",
        typeConverter=TypeConverters.toString,
    )
    link = Param(
        Params._dummy(),
        "link",
        "link function ('' = family's canonical link)",
        typeConverter=TypeConverters.toString,
    )
    mCol = Param(
        Params._dummy(),
        "mCol",
        "binomial trials column ('' = Bernoulli)",
        typeConverter=TypeConverters.toString,
    )
    offsetCol = Param(
        Params._dummy(),
        "offsetCol",
        "offset column added to the linear predictor ('' = none)",
        typeConverter=TypeConverters.toString,
    )
    tol = Param(
        Params._dummy(),
        "tol",
        "stopping tolerance: absolute deviance change (unpenalized "
        "IRLS) / max coefficient change (regParam > 0 path, default "
        "1e-10 unless set)",
        typeConverter=TypeConverters.toFloat,
    )
    maxIter = Param(
        Params._dummy(),
        "maxIter",
        "maximum IRLS iterations",
        typeConverter=TypeConverters.toInt,
    )
    predictionType = Param(
        Params._dummy(),
        "predictionType",
        "transform() scale: 'response' (mu) or 'link' (eta)",
        typeConverter=TypeConverters.toString,
    )
    varPower = Param(
        Params._dummy(),
        "varPower",
        "tweedie variance exponent p in (1, 2); other families ignore it",
        typeConverter=TypeConverters.toFloat,
    )
    nbAlpha = Param(
        Params._dummy(),
        "nbAlpha",
        "negbinomial dispersion alpha > 0 (variance mu + alpha*mu^2); "
        "other families ignore it; ignored when estimateDispersion",
        typeConverter=TypeConverters.toFloat,
    )
    estimateDispersion = Param(
        Params._dummy(),
        "estimateDispersion",
        "negbinomial only: estimate the dispersion by profile ML "
        "(glm_nb — the MASS::glm.nb surface) instead of fixing nbAlpha; "
        "unpenalized default-link fits only",
        typeConverter=TypeConverters.toBoolean,
    )
    regParam = Param(
        Params._dummy(),
        "regParam",
        "elastic-net penalty lambda (> 0 routes binomial/poisson/gamma/"
        "tweedie fits through glm_elastic_net — MLlib LogisticRegression "
        "convention; mutually exclusive with mCol/offsetCol/link "
        "overrides)",
        typeConverter=TypeConverters.toFloat,
    )
    elasticNetParam = Param(
        Params._dummy(),
        "elasticNetParam",
        "L1 mixing alpha in [0, 1]; only used when regParam > 0",
        typeConverter=TypeConverters.toFloat,
    )
    standardization = Param(
        Params._dummy(),
        "standardization",
        "penalize standardized coefficients; only used when regParam > 0",
        typeConverter=TypeConverters.toBoolean,
    )
    weightCol = Param(
        Params._dummy(),
        "weightCol",
        "per-row prior weight column ('' = unweighted); forwards to "
        "glm_elastic_net(weight_col=) when regParam > 0 (the MLlib "
        "LogisticRegression convention) and to glm(weight_col=) "
        "otherwise (the R glm(weights=) / MLlib "
        "GeneralizedLinearRegression convention)",
        typeConverter=TypeConverters.toString,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(
            family="binomial",
            link="",
            mCol="",
            offsetCol="",
            tol=1e-6,
            maxIter=50,
            predictionType="response",
            varPower=1.5,
            nbAlpha=1.0,
            estimateDispersion=False,
            regParam=0.0,
            elasticNetParam=0.0,
            standardization=True,
            weightCol="",
        )

    def getFamily(self) -> str:
        return self.getOrDefault(self.family)

    def getLink(self) -> str:
        return self.getOrDefault(self.link)

    def getMCol(self) -> str:
        return self.getOrDefault(self.mCol)

    def getOffsetCol(self) -> str:
        return self.getOrDefault(self.offsetCol)

    def getTol(self) -> float:
        return self.getOrDefault(self.tol)

    def getMaxIter(self) -> int:
        return self.getOrDefault(self.maxIter)

    def getPredictionType(self) -> str:
        return self.getOrDefault(self.predictionType)

    def getVarPower(self) -> float:
        return self.getOrDefault(self.varPower)

    def getNbAlpha(self) -> float:
        return self.getOrDefault(self.nbAlpha)

    def getEstimateDispersion(self) -> bool:
        return self.getOrDefault(self.estimateDispersion)

    def getRegParam(self) -> float:
        return self.getOrDefault(self.regParam)

    def getElasticNetParam(self) -> float:
        return self.getOrDefault(self.elasticNetParam)

    def getStandardization(self) -> bool:
        return self.getOrDefault(self.standardization)

    def getWeightCol(self) -> str:
        return self.getOrDefault(self.weightCol)


def _kwargs_setter(obj, kwargs):
    """setParams-style keyword init: only declared params accepted.
    Routes through `_set` so each Param's typeConverter applies (the
    MLlib setParams idiom — `Params.set` would store raw values and a
    `SparkLM(l2=1)` int would skip the float coercion)."""
    for name, value in kwargs.items():
        if not obj.hasParam(name):
            raise TypeError(f"{type(obj).__name__} has no param {name!r}")
        obj._set(**{name: value})
    return obj


# ---------------------------------------------------------------------------
# Fitted-model persistence (MLWriter/MLReader over the persist.py JSON)
# ---------------------------------------------------------------------------


class _ModelJSONWriter(MLWriter):
    """MLlib-layout save: DefaultParamsWriter metadata/ + a model/ text
    dir holding the model's `_payload_dict()` JSON document as one line.
    Both writes go through the SparkContext so any Hadoop-supported
    filesystem works."""

    def __init__(self, instance):
        super().__init__()
        self.instance = instance

    def saveImpl(self, path: str) -> None:
        DefaultParamsWriter.saveMetadata(self.instance, path, self.sparkSession)
        doc = json.dumps(self.instance._payload_dict())
        sc = self.sparkSession.sparkContext
        sc.parallelize([doc], 1).saveAsTextFile(path + "/model")


class _ModelJSONReader(MLReader):
    def __init__(self, cls):
        super().__init__()
        self._cls = cls

    def load(self, path: str):
        metadata = DefaultParamsReader.loadMetadata(path, self.sparkSession)
        lines = self.sparkSession.sparkContext.textFile(path + "/model").collect()
        instance = self._cls._from_payload(json.loads("\n".join(lines)), path)
        DefaultParamsReader.getAndSetParams(instance, metadata)
        return instance


# ---------------------------------------------------------------------------
# LM
# ---------------------------------------------------------------------------


class SparkLM(Estimator, _SparkLMParams, DefaultParamsReadable, DefaultParamsWritable):
    """`pyspark.ml.Estimator` wrapper over `lm()` (reference sparkLM,
    R/pkg/R/LM.R:24-72 + LM.scala:29-61 predict-as-transform).

    >>> est = SparkLM(formula="y ~ x1 + x2", l2=0.1)
    >>> model = Pipeline(stages=[est]).fit(df).stages[0]
    >>> scored = model.transform(df)   # appends 'prediction'

    Grid-searchable params: formula, weightCol, l2, sseMode, naAction,
    predictionCol — plus the MLlib `LinearRegression` penalty pair
    (regParam, elasticNetParam, standardization): `regParam > 0` routes
    the fit through the elastic-net coordinate-descent path (same
    one-job Gram plan; see operators/enet.py), so a CrossValidator grid
    over regParam/elasticNetParam works exactly as it does for
    LinearRegression."""

    def __init__(self, **kwargs):
        super().__init__()
        _kwargs_setter(self, kwargs)

    def setParams(self, **kwargs) -> "SparkLM":
        return _kwargs_setter(self, kwargs)

    def _fit(self, dataset: DataFrame) -> "SparkLMModel":
        if not self.isDefined(self.formula):
            raise ValueError("SparkLM requires the 'formula' param")
        if self.getRegParam() > 0.0:
            if self.getL2() > 0.0:
                raise ValueError(
                    "regParam (MLlib elastic-net convention) is mutually "
                    "exclusive with l2 (raw-Gram ridge)"
                )
            # weightCol composes with regParam exactly as in MLlib
            # LinearRegression (elastic_net's Σw conventions are
            # golden-matched) — so CrossValidator grids over weighted
            # penalized fits work here too
            inner = elastic_net(
                dataset,
                self.getFormula(),
                reg_param=self.getRegParam(),
                elastic_net_param=self.getElasticNetParam(),
                standardize=self.getStandardization(),
                na_action=self.getNaAction(),
                weight_col=self.getWeightCol() or None,
            )
        else:
            inner = lm(
                dataset,
                self.getFormula(),
                na_action=self.getNaAction(),
                sse_mode=self.getSseMode(),
                weight_col=self.getWeightCol() or None,
                l2=self.getL2(),
            )
        return self._copyValues(SparkLMModel(inner))


class SparkLMModel(Model, _SparkLMParams, MLWritable, MLReadable):
    """Fitted LM as a `pyspark.ml.Model`: `transform()` appends the
    prediction as ONE codegen projection over raw columns (training-time
    dummy encoding / intercept / zero-backfill folded into expressions —
    same plan as `LM.predict`). `.model` exposes the underlying fitted
    dataclass — an `LM`, or an `ElasticNetLM` when the estimator ran the
    regParam > 0 path (both score through the same raw-column
    projection; `summary()` is OLS/WLS-only)."""

    def __init__(self, model: "LM | ElasticNetLM | None" = None):
        super().__init__()
        self._model_obj = model

    @property
    def model(self) -> "LM | ElasticNetLM":
        return self._model_obj

    def summary(self):
        if isinstance(self._model_obj, ElasticNetLM):
            raise ValueError(
                "summary() needs the OLS inference stats — the elastic-net "
                "path does not produce std errors (penalized estimator); "
                "read coefs / n_nonzero / sse off .model instead"
            )
        return self._model_obj.summary()

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return self._model_obj.predict(dataset, output_col=self.getPredictionCol())

    def _payload_dict(self) -> dict:
        return model_to_dict(self._model_obj)

    @classmethod
    def _from_payload(cls, payload: dict, path: str) -> "SparkLMModel":
        inner = model_from_dict(payload)
        if not isinstance(inner, (LM, ElasticNetLM)):
            raise ValueError(
                f"{path} holds a {type(inner).__name__}, expected LM/ElasticNetLM"
            )
        return cls(inner)

    def write(self) -> MLWriter:
        return _ModelJSONWriter(self)

    @classmethod
    def read(cls) -> MLReader:
        return _ModelJSONReader(cls)


# ---------------------------------------------------------------------------
# GLM
# ---------------------------------------------------------------------------


class SparkGLM(Estimator, _SparkGLMParams, DefaultParamsReadable, DefaultParamsWritable):
    """`pyspark.ml.Estimator` wrapper over `glm()` (reference GLM.scala
    fit overloads, SURVEY §2.11 M7-M9, collapsed to Params).

    >>> est = SparkGLM(formula="won ~ bid", family="binomial")
    >>> model = est.fit(df)
    >>> model.transform(df)            # appends response-scale mu
    """

    def __init__(self, **kwargs):
        super().__init__()
        _kwargs_setter(self, kwargs)

    def setParams(self, **kwargs) -> "SparkGLM":
        return _kwargs_setter(self, kwargs)

    def _fit(self, dataset: DataFrame) -> "SparkGLMModel":
        if not self.isDefined(self.formula):
            raise ValueError("SparkGLM requires the 'formula' param")
        if self.getEstimateDispersion():
            # glm_nb route (r14): theta by profile ML — negbinomial's
            # canonical-log, unpenalized surface only
            if self.getFamily() != "negbinomial":
                raise ValueError(
                    "estimateDispersion is negbinomial-only "
                    f"(family={self.getFamily()!r})"
                )
            if self.getRegParam() > 0.0 or self.getMCol() or self.getLink():
                raise ValueError(
                    "estimateDispersion supports only the unpenalized "
                    "default-link fit (no regParam/mCol/link overrides)"
                )
            inner = glm_nb(
                dataset,
                self.getFormula(),
                offset_col=self.getOffsetCol() or None,
                weight_col=self.getWeightCol() or None,
                na_action=self.getNaAction(),
                max_iter=self.getMaxIter(),
                **({"tol": self.getTol()} if self.isSet(self.tol) else {}),
            )
        elif self.getRegParam() > 0.0:
            if self.getMCol() or self.getLink():
                raise ValueError(
                    "regParam (penalized fit) supports only the default "
                    "link and no mCol — use an unpenalized SparkGLM for "
                    "those"
                )
            inner = glm_elastic_net(
                dataset,
                self.getFormula(),
                reg_param=self.getRegParam(),
                elastic_net_param=self.getElasticNetParam(),
                family=self.getFamily(),
                standardize=self.getStandardization(),
                na_action=self.getNaAction(),
                max_iter=self.getMaxIter(),
                offset_col=self.getOffsetCol() or None,
                weight_col=self.getWeightCol() or None,
                var_power=self.getVarPower(),
                nb_alpha=self.getNbAlpha(),
                # the penalized path's tol is max-coefficient-change
                # (tighter default 1e-10); forward the Param only when
                # the USER set it — inheriting the unpenalized default
                # 1e-6 would silently loosen convergence
                **({"tol": self.getTol()} if self.isSet(self.tol) else {}),
            )
        else:
            inner = glm(
                dataset,
                self.getFormula(),
                family=self.getFamily(),
                link=self.getLink() or None,
                m_col=self.getMCol() or None,
                offset_col=self.getOffsetCol() or None,
                tol=self.getTol(),
                max_iter=self.getMaxIter(),
                na_action=self.getNaAction(),
                var_power=self.getVarPower(),
                nb_alpha=self.getNbAlpha(),
                weight_col=self.getWeightCol() or None,
            )
        return self._copyValues(SparkGLMModel(inner))


class SparkGLMModel(Model, _SparkGLMParams, MLWritable, MLReadable):
    """Fitted GLM as a `pyspark.ml.Model`; `transform()` appends mu
    (or eta when predictionType='link') as one codegen projection —
    same plan as `GLM.predict`. `.model` is a `GLM`, or a
    `GLMElasticNet` when the estimator ran the regParam > 0 path (same
    response/link predict contract; `summary()` is unpenalized-only)."""

    def __init__(self, model: "GLM | GLMElasticNet | None" = None):
        super().__init__()
        self._model_obj = model

    @property
    def model(self) -> "GLM | GLMElasticNet":
        return self._model_obj

    def summary(self):
        if isinstance(self._model_obj, GLMElasticNet):
            raise ValueError(
                "summary() needs the unpenalized inference stats — read "
                "coefs / n_nonzero / deviance off .model instead"
            )
        return self._model_obj.summary()

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return self._model_obj.predict(
            dataset,
            output_col=self.getPredictionCol(),
            type=self.getPredictionType(),
        )

    def _payload_dict(self) -> dict:
        return model_to_dict(self._model_obj)

    @classmethod
    def _from_payload(cls, payload: dict, path: str) -> "SparkGLMModel":
        inner = model_from_dict(payload)
        if not isinstance(inner, (GLM, GLMElasticNet)):
            raise ValueError(
                f"{path} holds a {type(inner).__name__}, expected "
                "GLM/GLMElasticNet"
            )
        return cls(inner)

    def write(self) -> MLWriter:
        return _ModelJSONWriter(self)

    @classmethod
    def read(cls) -> MLReader:
        return _ModelJSONReader(cls)


# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------


class _SparkPCAParams(Params):
    inputCols = Param(
        Params._dummy(),
        "inputCols",
        "numeric columns to decompose",
        typeConverter=TypeConverters.toListString,
    )
    k = Param(
        Params._dummy(),
        "k",
        "number of principal components",
        typeConverter=TypeConverters.toInt,
    )
    outputPrefix = Param(
        Params._dummy(),
        "outputPrefix",
        "prefix of the appended projection columns (pc_1, pc_2, ...)",
        typeConverter=TypeConverters.toString,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(k=2, outputPrefix="pc_")

    def getInputCols(self) -> list:
        return self.getOrDefault(self.inputCols)

    def getK(self) -> int:
        return self.getOrDefault(self.k)

    def getOutputPrefix(self) -> str:
        return self.getOrDefault(self.outputPrefix)


class SparkPCA(Estimator, _SparkPCAParams, DefaultParamsReadable, DefaultParamsWritable):
    """`pyspark.ml.Estimator` wrapper over `pca_fit` (operators/pca.py):
    covariance from ONE Gram aggregation pass, k×k `eigh` on the driver,
    deterministic component signs. Composes with Pipeline stages before a
    SparkLM (dimensionality-reduce then regress on pc_ columns)."""

    def __init__(self, **kwargs):
        super().__init__()
        _kwargs_setter(self, kwargs)

    def setParams(self, **kwargs) -> "SparkPCA":
        return _kwargs_setter(self, kwargs)

    def _fit(self, dataset: DataFrame) -> "SparkPCAModel":
        if not self.isDefined(self.inputCols):
            raise ValueError("SparkPCA requires the 'inputCols' param")
        from sparkglm_spark.operators.pca import pca_fit

        inner = pca_fit(dataset, list(self.getInputCols()), self.getK())
        return self._copyValues(SparkPCAModel(inner))


class SparkPCAModel(Model, _SparkPCAParams, MLWritable, MLReadable):
    """Fitted PCA as a `pyspark.ml.Model`: `transform()` appends the
    centered projections as codegen expression columns (no UDF, no
    shuffle — one projection). `.model` exposes the PCAModel dataclass
    (components, explained_variance[_ratio], means)."""

    def __init__(self, model=None):
        super().__init__()
        self._model_obj = model

    @property
    def model(self):
        return self._model_obj

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return self._model_obj.transform(dataset, prefix=self.getOutputPrefix())

    def _payload_dict(self) -> dict:
        m = self._model_obj
        return {
            "kind": "pca",
            "cols": list(m.cols),
            "means": [float(v) for v in m.means],
            "components": [[float(v) for v in row] for row in m.components],
            "explained_variance": [float(v) for v in m.explained_variance],
            "explained_variance_ratio": [
                float(v) for v in m.explained_variance_ratio
            ],
        }

    @classmethod
    def _from_payload(cls, payload: dict, path: str) -> "SparkPCAModel":
        if payload.get("kind") != "pca":
            raise ValueError(f"{path} holds {payload.get('kind')!r}, expected pca")
        import numpy as np

        from sparkglm_spark.operators.pca import PCAModel

        return cls(
            PCAModel(
                cols=list(payload["cols"]),
                means=np.asarray(payload["means"], dtype=float),
                components=np.asarray(payload["components"], dtype=float),
                explained_variance=np.asarray(
                    payload["explained_variance"], dtype=float
                ),
                explained_variance_ratio=np.asarray(
                    payload["explained_variance_ratio"], dtype=float
                ),
            )
        )

    def write(self) -> MLWriter:
        return _ModelJSONWriter(self)

    @classmethod
    def read(cls) -> MLReader:
        return _ModelJSONReader(cls)


# ---------------------------------------------------------------------------
# Corpus prep (stateless Transformer: curate + dedup as a Pipeline stage)
# ---------------------------------------------------------------------------


class SparkCorpusPrep(
    Transformer, Params, DefaultParamsReadable, DefaultParamsWritable
):
    """`pyspark.ml.Transformer` over `prepare_training_corpus`
    (operators/pipeline.py): quality/language gating + exact and MinHash
    near-dup dedup as a stateless Pipeline stage, so the full
    curate → vocab-fit → tokenize chain is one `Pipeline`:

        Pipeline(stages=[SparkCorpusPrep(), SparkWordPiece(vocabSize=...)])

    `Pipeline.fit` runs the prep transform FIRST and fits the vocab on
    the CURATED corpus — the composition order the functional chain
    documents. Params mirror the functional keywords; `useGopher=True`
    prepends the published Gopher gate (per-rule threshold overrides stay
    in the functional API — dicts are not a Param type). Stateless, so
    persistence is the stock DefaultParams round-trip."""

    textCol = Param(
        Params._dummy(), "textCol", "input text column",
        typeConverter=TypeConverters.toString,
    )
    idCol = Param(
        Params._dummy(), "idCol", "document id column",
        typeConverter=TypeConverters.toString,
    )
    minQuality = Param(
        Params._dummy(), "minQuality", "quality_score gate threshold",
        typeConverter=TypeConverters.toFloat,
    )
    languages = Param(
        Params._dummy(), "languages",
        "detected_lang allowlist ([] = keep all languages)",
        typeConverter=TypeConverters.toListString,
    )
    neardupThreshold = Param(
        Params._dummy(), "neardupThreshold", "MinHash near-dup Jaccard gate",
        typeConverter=TypeConverters.toFloat,
    )
    useGopher = Param(
        Params._dummy(), "useGopher",
        "prepend the published Gopher quality gate",
        typeConverter=TypeConverters.toBoolean,
    )

    def __init__(self, **kwargs):
        super().__init__()
        self._setDefault(
            textCol="text", idCol="doc_id", minQuality=0.5,
            languages=["en"], neardupThreshold=0.8, useGopher=False,
        )
        _kwargs_setter(self, kwargs)

    def setParams(self, **kwargs) -> "SparkCorpusPrep":
        return _kwargs_setter(self, kwargs)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        from sparkglm_spark.operators.pipeline import prepare_training_corpus

        langs = self.getOrDefault(self.languages)
        return prepare_training_corpus(
            dataset,
            text_col=self.getOrDefault(self.textCol),
            id_col=self.getOrDefault(self.idCol),
            min_quality=self.getOrDefault(self.minQuality),
            languages=tuple(langs) if langs else None,
            neardup_threshold=self.getOrDefault(self.neardupThreshold),
            gopher_rules={} if self.getOrDefault(self.useGopher) else None,
        )


# ---------------------------------------------------------------------------
# WordPiece (vocab fit -> tokenizer transform)
# ---------------------------------------------------------------------------


class _SparkWordPieceParams(Params):
    textCol = Param(
        Params._dummy(), "textCol", "input text column",
        typeConverter=TypeConverters.toString,
    )
    idCol = Param(
        Params._dummy(), "idCol", "document id column",
        typeConverter=TypeConverters.toString,
    )
    vocabSize = Param(
        Params._dummy(), "vocabSize", "total vocab entries incl. specials + chars",
        typeConverter=TypeConverters.toInt,
    )
    minFreq = Param(
        Params._dummy(), "minFreq", "minimum corpus frequency for a whole word",
        typeConverter=TypeConverters.toInt,
    )
    lowercase = Param(
        Params._dummy(), "lowercase", "lowercase before matching",
        typeConverter=TypeConverters.toBoolean,
    )
    maxWordChars = Param(
        Params._dummy(), "maxWordChars", "words longer than this become [UNK]",
        typeConverter=TypeConverters.toInt,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(
            textCol="text", idCol="doc_id", vocabSize=8000, minFreq=2,
            lowercase=True, maxWordChars=64,
        )

    def getTextCol(self) -> str:
        return self.getOrDefault(self.textCol)

    def getIdCol(self) -> str:
        return self.getOrDefault(self.idCol)

    def getVocabSize(self) -> int:
        return self.getOrDefault(self.vocabSize)

    def getMinFreq(self) -> int:
        return self.getOrDefault(self.minFreq)

    def getLowercase(self) -> bool:
        return self.getOrDefault(self.lowercase)

    def getMaxWordChars(self) -> int:
        return self.getOrDefault(self.maxWordChars)


class SparkWordPiece(
    Estimator, _SparkWordPieceParams, DefaultParamsReadable, DefaultParamsWritable
):
    """`pyspark.ml.Estimator` over `build_wordpiece_vocab`: fitting derives
    the deterministic corpus vocabulary (bounded aggregations, driver
    holds O(vocabSize) strings); the model tokenizes via the zero-shuffle
    Arrow scan of `tokenize_wordpiece`. Lets the text→token_ids step sit
    inside a `pyspark.ml.Pipeline` next to the modeling stages."""

    def __init__(self, **kwargs):
        super().__init__()
        _kwargs_setter(self, kwargs)

    def setParams(self, **kwargs) -> "SparkWordPiece":
        return _kwargs_setter(self, kwargs)

    def _fit(self, dataset: DataFrame) -> "SparkWordPieceModel":
        from sparkglm_spark.operators.tokenize import build_wordpiece_vocab

        vocab = build_wordpiece_vocab(
            dataset,
            text_col=self.getTextCol(),
            id_col=self.getIdCol(),
            vocab_size=self.getVocabSize(),
            min_freq=self.getMinFreq(),
        )
        return self._copyValues(SparkWordPieceModel(vocab))


class SparkWordPieceModel(Model, _SparkWordPieceParams, MLWritable, MLReadable):
    """Fitted WordPiece vocabulary as a `pyspark.ml.Model`: `transform()`
    appends (token_ids, n_tokens_wp, n_unk) in one Arrow-batched
    mapInPandas scan — zero shuffle, broadcast vocab. `.vocab` exposes
    the id-ordered piece list (BERT vocab-file convention); construct
    directly from any externally trained vocab via
    `SparkWordPieceModel(vocab_list)`."""

    def __init__(self, vocab: list | None = None):
        super().__init__()
        self._vocab = list(vocab) if vocab is not None else None

    @property
    def vocab(self) -> list:
        return self._vocab

    def _transform(self, dataset: DataFrame) -> DataFrame:
        from sparkglm_spark.operators.tokenize import tokenize_wordpiece

        return tokenize_wordpiece(
            dataset,
            self._vocab,
            text_col=self.getTextCol(),
            id_col=self.getIdCol(),
            lowercase=self.getLowercase(),
            max_word_chars=self.getMaxWordChars(),
        )

    def _payload_dict(self) -> dict:
        return {"kind": "wordpiece", "vocab": self._vocab}

    @classmethod
    def _from_payload(cls, payload: dict, path: str) -> "SparkWordPieceModel":
        if payload.get("kind") != "wordpiece":
            raise ValueError(
                f"{path} holds {payload.get('kind')!r}, expected wordpiece"
            )
        return cls(list(payload["vocab"]))

    def write(self) -> MLWriter:
        return _ModelJSONWriter(self)

    @classmethod
    def read(cls) -> MLReader:
        return _ModelJSONReader(cls)


# ---------------------------------------------------------------------------
# Huber robust regression
# ---------------------------------------------------------------------------


class _SparkHuberLMParams(_FormulaParams):
    weightCol = Param(
        Params._dummy(),
        "weightCol",
        "positive-INTEGER frequency-weight column ('' = unweighted) — "
        "forwards to huber_lm(weight_col=); the robust scale becomes "
        "the frequency-weighted median (integer ω = exact replication)",
        typeConverter=TypeConverters.toString,
    )
    c = Param(
        Params._dummy(),
        "c",
        "Huber tuning constant (1.345 = 95% efficiency at the normal)",
        typeConverter=TypeConverters.toFloat,
    )
    maxIter = Param(
        Params._dummy(),
        "maxIter",
        "maximum IRLS iterations",
        typeConverter=TypeConverters.toInt,
    )
    tol = Param(
        Params._dummy(),
        "tol",
        "relative max|delta beta| stopping tolerance",
        typeConverter=TypeConverters.toFloat,
    )
    medianMode = Param(
        Params._dummy(),
        "medianMode",
        "per-iteration median of |e|: 'auto', 'exact' or 'approx'",
        typeConverter=TypeConverters.toString,
    )
    accuracy = Param(
        Params._dummy(),
        "accuracy",
        "approx_percentile accuracy for medianMode approx/auto",
        typeConverter=TypeConverters.toInt,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(
            c=1.345, maxIter=30, tol=1e-8, medianMode="auto", accuracy=10000,
            weightCol="",
        )


class SparkHuberLM(
    Estimator, _SparkHuberLMParams, DefaultParamsReadable, DefaultParamsWritable
):
    """`pyspark.ml.Estimator` over `huber_lm` (robust M-estimated
    regression): same formula front-end and Params protocol as SparkLM,
    so outlier-robust fits drop into Pipeline/CrossValidator chains
    unchanged. Grid-searchable: formula, c, maxIter, tol, medianMode."""

    def __init__(self, **kwargs):
        super().__init__()
        _kwargs_setter(self, kwargs)

    def setParams(self, **kwargs) -> "SparkHuberLM":
        return _kwargs_setter(self, kwargs)

    def _fit(self, dataset: DataFrame) -> "SparkHuberLMModel":
        if not self.isDefined(self.formula):
            raise ValueError("SparkHuberLM requires the 'formula' param")
        from sparkglm_spark.operators.lm import huber_lm

        wc = self.getOrDefault(self.weightCol)
        inner = huber_lm(
            dataset,
            self.getFormula(),
            c=self.getOrDefault(self.c),
            max_iter=self.getOrDefault(self.maxIter),
            tol=self.getOrDefault(self.tol),
            na_action=self.getNaAction(),
            median_mode=self.getOrDefault(self.medianMode),
            accuracy=self.getOrDefault(self.accuracy),
            weight_col=wc or None,
        )
        return self._copyValues(SparkHuberLMModel(inner))


class SparkHuberLMModel(Model, _SparkHuberLMParams, MLWritable, MLReadable):
    """Fitted Huber regression as a `pyspark.ml.Model`: `transform()` is
    the same keyed one-projection scoring as SparkLMModel. `.model`
    exposes the HuberLM dataclass (coefs, robust scale, iteration
    trace)."""

    def __init__(self, model=None):
        super().__init__()
        self._model_obj = model

    @property
    def model(self):
        return self._model_obj

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return self._model_obj.predict(dataset, output_col=self.getPredictionCol())

    def _payload_dict(self) -> dict:
        return model_to_dict(self._model_obj)

    @classmethod
    def _from_payload(cls, payload: dict, path: str) -> "SparkHuberLMModel":
        from sparkglm_spark.operators.lm import HuberLM

        inner = model_from_dict(payload)
        if not isinstance(inner, HuberLM):
            raise ValueError(
                f"{path} holds a {type(inner).__name__}, expected HuberLM"
            )
        return cls(inner)

    def write(self) -> MLWriter:
        return _ModelJSONWriter(self)

    @classmethod
    def read(cls) -> MLReader:
        return _ModelJSONReader(cls)


class _SparkQuantileLMParams(_FormulaParams):
    weightCol = Param(
        Params._dummy(),
        "weightCol",
        "case-weight column, omega >= 0 ('' = unweighted) — forwards to "
        "quantile_lm(weight_col=): omega-weighted check loss",
        typeConverter=TypeConverters.toString,
    )
    q = Param(
        Params._dummy(),
        "q",
        "quantile level in (0, 1); 0.5 = median (LAD) regression",
        typeConverter=TypeConverters.toFloat,
    )
    maxIter = Param(
        Params._dummy(),
        "maxIter",
        "maximum IRLS iterations",
        typeConverter=TypeConverters.toInt,
    )
    tol = Param(
        Params._dummy(),
        "tol",
        "relative max|delta beta| stopping tolerance",
        typeConverter=TypeConverters.toFloat,
    )
    delta = Param(
        Params._dummy(),
        "delta",
        "check-loss smoothing floor (0.0 = auto scale probe)",
        typeConverter=TypeConverters.toFloat,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(q=0.5, maxIter=100, tol=1e-6, delta=0.0, weightCol="")


class SparkQuantileLM(
    Estimator, _SparkQuantileLMParams, DefaultParamsReadable, DefaultParamsWritable
):
    """`pyspark.ml.Estimator` over `quantile_lm` (IRLS quantile
    regression) — grid-search q over a ParamGridBuilder to fit a family
    of conditional-quantile models in one CrossValidator sweep."""

    def __init__(self, **kwargs):
        super().__init__()
        _kwargs_setter(self, kwargs)

    def setParams(self, **kwargs) -> "SparkQuantileLM":
        return _kwargs_setter(self, kwargs)

    def _fit(self, dataset: DataFrame) -> "SparkQuantileLMModel":
        if not self.isDefined(self.formula):
            raise ValueError("SparkQuantileLM requires the 'formula' param")
        from sparkglm_spark.operators.lm import quantile_lm

        d = self.getOrDefault(self.delta)
        wc = self.getOrDefault(self.weightCol)
        inner = quantile_lm(
            dataset,
            self.getFormula(),
            q=self.getOrDefault(self.q),
            max_iter=self.getOrDefault(self.maxIter),
            tol=self.getOrDefault(self.tol),
            delta=d if d > 0.0 else None,
            na_action=self.getNaAction(),
            weight_col=wc or None,
        )
        return self._copyValues(SparkQuantileLMModel(inner))


class SparkQuantileLMModel(Model, _SparkQuantileLMParams, MLWritable, MLReadable):
    """Fitted quantile regression as a `pyspark.ml.Model`: `transform()`
    appends the conditional-quantile prediction as one codegen
    projection. `.model` exposes the QuantileLM dataclass."""

    def __init__(self, model=None):
        super().__init__()
        self._model_obj = model

    @property
    def model(self):
        return self._model_obj

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return self._model_obj.predict(dataset, output_col=self.getPredictionCol())

    def _payload_dict(self) -> dict:
        return model_to_dict(self._model_obj)

    @classmethod
    def _from_payload(cls, payload: dict, path: str) -> "SparkQuantileLMModel":
        from sparkglm_spark.operators.lm import QuantileLM

        inner = model_from_dict(payload)
        if not isinstance(inner, QuantileLM):
            raise ValueError(
                f"{path} holds a {type(inner).__name__}, expected QuantileLM"
            )
        return cls(inner)

    def write(self) -> MLWriter:
        return _ModelJSONWriter(self)

    @classmethod
    def read(cls) -> MLReader:
        return _ModelJSONReader(cls)


class _SparkWeibullAFTParams(Params):
    timeCol = Param(
        Params._dummy(), "timeCol", "survival/censoring time column (> 0)",
        typeConverter=TypeConverters.toString,
    )
    eventCol = Param(
        Params._dummy(), "eventCol", "0/1 event indicator column",
        typeConverter=TypeConverters.toString,
    )
    featureCols = Param(
        Params._dummy(), "featureCols", "numeric covariate columns",
        typeConverter=TypeConverters.toListString,
    )
    fitIntercept = Param(
        Params._dummy(), "fitIntercept", "include an intercept in x'beta",
        typeConverter=TypeConverters.toBoolean,
    )
    maxIter = Param(
        Params._dummy(), "maxIter", "maximum Newton iterations",
        typeConverter=TypeConverters.toInt,
    )
    tol = Param(
        Params._dummy(), "tol", "relative log-likelihood stopping tolerance",
        typeConverter=TypeConverters.toFloat,
    )
    predictionCol = Param(
        Params._dummy(), "predictionCol",
        "median-survival-time column appended by transform()",
        typeConverter=TypeConverters.toString,
    )
    weightCol = Param(
        Params._dummy(), "weightCol",
        "per-row case-weight column ('' = unweighted) — the R "
        "survreg(weights=) convention (weibull_aft weight_col)",
        typeConverter=TypeConverters.toString,
    )
    dist = Param(
        Params._dummy(), "dist",
        "error distribution: weibull (default), loglogistic, lognormal "
        "— the R survreg(dist=) switch (survreg/weibull_aft dist)",
        typeConverter=TypeConverters.toString,
    )
    time2Col = Param(
        Params._dummy(), "time2Col",
        "interval upper-bound column ('' = none): eventCol then carries "
        "the R Surv codes 0/1/2/3 (weibull dist only)",
        typeConverter=TypeConverters.toString,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(
            timeCol="time", eventCol="event", fitIntercept=True,
            maxIter=50, tol=1e-9, predictionCol="median_survival_time",
            weightCol="", dist="weibull", time2Col="",
        )


class SparkWeibullAFT(
    Estimator, _SparkWeibullAFTParams, DefaultParamsReadable, DefaultParamsWritable
):
    """`pyspark.ml.Estimator` over `weibull_aft` (the parametric AFT
    survival model; cross-checked against MLlib's own
    AFTSurvivalRegression in tests — this one takes plain numeric
    columns, no VectorAssembler, and exposes closed-form
    `predict_survival` on `.model`)."""

    def __init__(self, **kwargs):
        super().__init__()
        _kwargs_setter(self, kwargs)

    def setParams(self, **kwargs) -> "SparkWeibullAFT":
        return _kwargs_setter(self, kwargs)

    def _fit(self, dataset: DataFrame) -> "SparkWeibullAFTModel":
        if not self.isDefined(self.featureCols):
            raise ValueError("SparkWeibullAFT requires the 'featureCols' param")
        from sparkglm_spark.operators.survival import weibull_aft

        inner = weibull_aft(
            dataset,
            time_col=self.getOrDefault(self.timeCol),
            event_col=self.getOrDefault(self.eventCol),
            x_cols=list(self.getOrDefault(self.featureCols)),
            fit_intercept=self.getOrDefault(self.fitIntercept),
            max_iter=self.getOrDefault(self.maxIter),
            tol=self.getOrDefault(self.tol),
            weight_col=self.getOrDefault(self.weightCol) or None,
            dist=self.getOrDefault(self.dist),
            time2_col=self.getOrDefault(self.time2Col) or None,
        )
        return self._copyValues(SparkWeibullAFTModel(inner))


class SparkWeibullAFTModel(Model, _SparkWeibullAFTParams, MLWritable, MLReadable):
    """Fitted Weibull AFT as a `pyspark.ml.Model`: `transform()` appends
    the median survival time as one codegen projection; `.model` exposes
    the WeibullAFT dataclass (predict_survival, summary_rows)."""

    def __init__(self, model=None):
        super().__init__()
        self._model_obj = model

    @property
    def model(self):
        return self._model_obj

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return self._model_obj.predict(
            dataset, output_col=self.getOrDefault(self.predictionCol)
        )

    def _payload_dict(self) -> dict:
        return model_to_dict(self._model_obj)

    @classmethod
    def _from_payload(cls, payload: dict, path: str) -> "SparkWeibullAFTModel":
        from sparkglm_spark.operators.survival import WeibullAFT

        inner = model_from_dict(payload)
        if not isinstance(inner, WeibullAFT):
            raise ValueError(
                f"{path} holds a {type(inner).__name__}, expected WeibullAFT"
            )
        return cls(inner)

    def write(self) -> MLWriter:
        return _ModelJSONWriter(self)

    @classmethod
    def read(cls) -> MLReader:
        return _ModelJSONReader(cls)


# ---------------------------------------------------------------------------
# Cox proportional hazards
# ---------------------------------------------------------------------------


class _SparkCoxPHParams(Params):
    timeCol = Param(
        Params._dummy(), "timeCol", "survival/censoring time column",
        typeConverter=TypeConverters.toString,
    )
    eventCol = Param(
        Params._dummy(), "eventCol", "0/1 event indicator column",
        typeConverter=TypeConverters.toString,
    )
    featureCols = Param(
        Params._dummy(), "featureCols", "numeric covariate columns",
        typeConverter=TypeConverters.toListString,
    )
    maxIter = Param(
        Params._dummy(), "maxIter", "maximum Newton iterations",
        typeConverter=TypeConverters.toInt,
    )
    tol = Param(
        Params._dummy(), "tol", "relative log-likelihood stopping tolerance",
        typeConverter=TypeConverters.toFloat,
    )
    timeBucket = Param(
        Params._dummy(), "timeBucket",
        "floor the time axis to this bucket width (0.0 = off) — the "
        "distinct-time cardinality knob for micro-timestamped data",
        typeConverter=TypeConverters.toFloat,
    )
    strataCol = Param(
        Params._dummy(), "strataCol",
        "stratification column ('' = unstratified): shared beta, one "
        "baseline hazard per stratum",
        typeConverter=TypeConverters.toString,
    )
    predictionCol = Param(
        Params._dummy(), "predictionCol",
        "relative-risk column appended by transform()",
        typeConverter=TypeConverters.toString,
    )
    weightCol = Param(
        Params._dummy(), "weightCol",
        "per-row case-weight column ('' = unweighted) — the R "
        "coxph(weights=) convention (coxph weight_col)",
        typeConverter=TypeConverters.toString,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(
            timeCol="time", eventCol="event", maxIter=20, tol=1e-9,
            timeBucket=0.0, strataCol="", predictionCol="risk_score",
            weightCol="",
        )


class SparkCoxPH(
    Estimator, _SparkCoxPHParams, DefaultParamsReadable, DefaultParamsWritable
):
    """`pyspark.ml.Estimator` over `coxph` (Breslow-tie Cox proportional
    hazards; the survival-family analogue of SparkGLM). `transform()` of
    the fitted model appends exp(x'β) relative risk; the underlying
    `.model` exposes `baseline_hazard` / `predict_survival` for the
    survfit-style surfaces (they need a data frame argument, so they stay
    methods rather than transform flavors)."""

    def __init__(self, **kwargs):
        super().__init__()
        _kwargs_setter(self, kwargs)

    def setParams(self, **kwargs) -> "SparkCoxPH":
        return _kwargs_setter(self, kwargs)

    def _fit(self, dataset: DataFrame) -> "SparkCoxPHModel":
        if not self.isDefined(self.featureCols):
            raise ValueError("SparkCoxPH requires the 'featureCols' param")
        from sparkglm_spark.operators.survival import coxph

        bucket = self.getOrDefault(self.timeBucket)
        inner = coxph(
            dataset,
            time_col=self.getOrDefault(self.timeCol),
            event_col=self.getOrDefault(self.eventCol),
            x_cols=list(self.getOrDefault(self.featureCols)),
            max_iter=self.getOrDefault(self.maxIter),
            tol=self.getOrDefault(self.tol),
            time_bucket=bucket if bucket > 0.0 else None,
            strata_col=self.getOrDefault(self.strataCol) or None,
            weight_col=self.getOrDefault(self.weightCol) or None,
        )
        return self._copyValues(SparkCoxPHModel(inner))


class SparkCoxPHModel(Model, _SparkCoxPHParams, MLWritable, MLReadable):
    """Fitted Cox model as a `pyspark.ml.Model`: `transform()` appends
    the exp(x'β) relative risk as one codegen projection. `.model`
    exposes the CoxPH dataclass (summary_rows, baseline_hazard,
    predict_survival)."""

    def __init__(self, model=None):
        super().__init__()
        self._model_obj = model

    @property
    def model(self):
        return self._model_obj

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return self._model_obj.predict(
            dataset, output_col=self.getOrDefault(self.predictionCol)
        )

    def _payload_dict(self) -> dict:
        return model_to_dict(self._model_obj)

    @classmethod
    def _from_payload(cls, payload: dict, path: str) -> "SparkCoxPHModel":
        from sparkglm_spark.operators.survival import CoxPH

        inner = model_from_dict(payload)
        if not isinstance(inner, CoxPH):
            raise ValueError(
                f"{path} holds a {type(inner).__name__}, expected CoxPH"
            )
        return cls(inner)

    def write(self) -> MLWriter:
        return _ModelJSONWriter(self)

    @classmethod
    def read(cls) -> MLReader:
        return _ModelJSONReader(cls)


class SparkBinaryEvaluator(Evaluator):
    """Real `pyspark.ml.evaluation.Evaluator` subclass over the engine's
    `binary_classification_eval` metrics — plugs the distributed
    tie-aware AUC / log-loss / Brier / F1 into `CrossValidator` /
    `TrainValidationSplit` model selection (MLlib's own
    BinaryClassificationEvaluator wants an ML-Vector rawPrediction
    column; this one reads the plain double probability column the
    SparkGLMModel.transform projection emits).

    >>> ev = SparkBinaryEvaluator(labelCol="won", scoreCol="prediction",
    ...                           metricName="auc")
    >>> CrossValidator(estimator=SparkGLM(formula="won ~ bid",
    ...                                   family="binomial"),
    ...                estimatorParamMaps=grid, evaluator=ev).fit(df)
    """

    labelCol = Param(
        Params._dummy(), "labelCol", "0/1 label column",
        typeConverter=TypeConverters.toString,
    )
    scoreCol = Param(
        Params._dummy(), "scoreCol",
        "probability column (plain double in [0, 1])",
        typeConverter=TypeConverters.toString,
    )
    metricName = Param(
        Params._dummy(), "metricName",
        "auc | avg_precision | log_loss | brier | accuracy | precision "
        "| recall | f1",
        typeConverter=TypeConverters.toString,
    )
    threshold = Param(
        Params._dummy(), "threshold",
        "decision threshold for the confusion metrics",
        typeConverter=TypeConverters.toFloat,
    )

    _LOWER_IS_BETTER = {"log_loss", "brier"}
    _METRICS = {
        "auc", "avg_precision", "log_loss", "brier", "accuracy",
        "precision", "recall", "f1",
    }

    def __init__(self, **kwargs):
        super().__init__()
        self._setDefault(
            labelCol="label", scoreCol="prediction", metricName="auc",
            threshold=0.5,
        )
        _kwargs_setter(self, kwargs)

    def setParams(self, **kwargs) -> "SparkBinaryEvaluator":
        return _kwargs_setter(self, kwargs)

    def _evaluate(self, dataset: DataFrame) -> float:
        name = self.getOrDefault(self.metricName)
        if name not in self._METRICS:
            raise ValueError(
                f"metricName must be one of {sorted(self._METRICS)}, got {name!r}"
            )
        from sparkglm_spark.operators.evaluate import binary_classification_eval

        rows = binary_classification_eval(
            dataset,
            self.getOrDefault(self.labelCol),
            self.getOrDefault(self.scoreCol),
            threshold=self.getOrDefault(self.threshold),
        ).collect()
        return float({r["metric"]: r["value"] for r in rows}[name])

    def isLargerBetter(self) -> bool:
        return self.getOrDefault(self.metricName) not in self._LOWER_IS_BETTER


class _SparkIsotonicParams(Params):
    labelCol = Param(
        Params._dummy(), "labelCol", "0/1 label column",
        typeConverter=TypeConverters.toString,
    )
    scoreCol = Param(
        Params._dummy(), "scoreCol", "raw score column to calibrate",
        typeConverter=TypeConverters.toString,
    )
    outputCol = Param(
        Params._dummy(), "outputCol", "calibrated probability column",
        typeConverter=TypeConverters.toString,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(
            labelCol="label", scoreCol="prediction", outputCol="calibrated"
        )


class SparkIsotonicCalibrator(
    Estimator, _SparkIsotonicParams, DefaultParamsReadable, DefaultParamsWritable
):
    """`pyspark.ml.Estimator` over `fit_isotonic_calibration` — drop a
    recalibration stage after any probability-emitting model in a
    Pipeline: `Pipeline([SparkGLM("y ~ ..."), SparkIsotonicCalibrator(
    labelCol="y")])` fits the PAV score→probability map on the upstream
    stage's `prediction` column and scores through it at transform
    time."""

    def __init__(self, **kwargs):
        super().__init__()
        _kwargs_setter(self, kwargs)

    def setParams(self, **kwargs) -> "SparkIsotonicCalibrator":
        return _kwargs_setter(self, kwargs)

    def _fit(self, dataset: DataFrame) -> "SparkIsotonicCalibrationModel":
        from sparkglm_spark.operators.evaluate import fit_isotonic_calibration

        inner = fit_isotonic_calibration(
            dataset,
            self.getOrDefault(self.labelCol),
            self.getOrDefault(self.scoreCol),
        )
        return self._copyValues(SparkIsotonicCalibrationModel(inner))


class SparkIsotonicCalibrationModel(
    Model, _SparkIsotonicParams, MLWritable, MLReadable
):
    """Fitted isotonic calibration as a `pyspark.ml.Model`: `transform()`
    appends the calibrated probability (null/NaN scores calibrate to
    NULL). `.model` exposes the `IsotonicCalibration` (pooled knots)."""

    def __init__(self, model=None):
        super().__init__()
        self._model_obj = model

    @property
    def model(self):
        return self._model_obj

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return self._model_obj.transform(
            dataset, output_col=self.getOrDefault(self.outputCol)
        )

    def _payload_dict(self) -> dict:
        return model_to_dict(self._model_obj)

    @classmethod
    def _from_payload(cls, payload: dict, path: str) -> "SparkIsotonicCalibrationModel":
        from sparkglm_spark.operators.evaluate import IsotonicCalibration

        inner = model_from_dict(payload)
        if not isinstance(inner, IsotonicCalibration):
            raise ValueError(
                f"{path} holds a {type(inner).__name__}, expected "
                "IsotonicCalibration"
            )
        return cls(inner)

    def write(self) -> MLWriter:
        return _ModelJSONWriter(self)

    @classmethod
    def read(cls) -> MLReader:
        return _ModelJSONReader(cls)
