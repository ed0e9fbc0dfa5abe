"""sparkglm_spark — a PySpark-native analytics engine with the modeling
surface of alteryx/sparkGLM (reference: /root/reference) plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Design principles (100 TB first):
- All row-wise work is declarative DataFrame API → Catalyst/Tungsten pick the
  physical plan (whole-stage codegen, partial aggregation, AQE).
- Model fitting reduces data to O(k^2) driver state via single-pass SQL
  aggregation (Gram matrix), never materializing partitions as dense blocks
  (unlike the reference's RowPartitionedMatrix — utils.scala:36-49).
- Python touches only k×k matrices on the driver (numpy); per-row Python is
  avoided; where unavoidable it is Arrow-batched (pandas UDF).
"""

from sparkglm_spark.formula import ParsedFormula, parse_formula
from sparkglm_spark.functions.encoding import (
    cast_all,
    match_cols,
    model_matrix,
    omit_na,
)
from sparkglm_spark.operators.evaluate import (
    binary_classification_eval,
    calibration_bins,
    grouped_auc,
    lift_table,
    regression_eval,
    roc_points,
)
from sparkglm_spark.operators.lm import (
    LM,
    LMSummary,
    anova_lm,
    huber_lm,
    influence_diagnostics,
    lm,
    lm_cross_validate,
    grouped_predict,
    huber_lm_grouped,
    lm_grouped,
    quantile_lm,
    quantile_lm_grouped,
    ridge,
    robust_standard_errors,
    wls,
)
from sparkglm_spark.operators.glm import (
    GLM,
    GLMSummary,
    glm,
    glm_grouped,
    likelihood_ratio_test,
)
from sparkglm_spark.operators.stats import (
    chi2_independence,
    corr_matrix,
    distribution_drift,
    distribution_drift_grouped,
    ks_test_2samp,
    mannwhitney_utest,
    numeric_profile,
    proportions_ztest,
    welch_ttest,
)
from sparkglm_spark.operators.survival import (
    aft_fit_diagnostic,
    aft_residuals,
    concordance_index,
    coxph,
    coxph_grouped,
    kaplan_meier,
    logrank_test,
    ph_assumption_test,
    restricted_mean_survival,
    schoenfeld_residuals,
    weibull_aft,
    weibull_aft_grouped,
)
from sparkglm_spark.operators.timeseries import (
    ewma_latest,
    ewma_series,
    holt_forecast,
    holt_series,
)
from sparkglm_spark.ml import (
    SparkBinaryEvaluator,
    SparkCorpusPrep,
    SparkCoxPH,
    SparkCoxPHModel,
    SparkGLM,
    SparkGLMModel,
    SparkHuberLM,
    SparkHuberLMModel,
    SparkLM,
    SparkLMModel,
    SparkPCA,
    SparkPCAModel,
    SparkQuantileLM,
    SparkQuantileLMModel,
    SparkWeibullAFT,
    SparkWeibullAFTModel,
    SparkWordPiece,
    SparkWordPieceModel,
)
from sparkglm_spark.persist import load_model, save_model

__all__ = [
    "parse_formula",
    "ParsedFormula",
    "model_matrix",
    "match_cols",
    "cast_all",
    "omit_na",
    "LM",
    "LMSummary",
    "lm",
    "lm_grouped",
    "lm_cross_validate",
    "wls",
    "ridge",
    "huber_lm",
    "huber_lm_grouped",
    "quantile_lm",
    "quantile_lm_grouped",
    "grouped_predict",
    "anova_lm",
    "influence_diagnostics",
    "robust_standard_errors",
    "likelihood_ratio_test",
    "coxph",
    "coxph_grouped",
    "kaplan_meier",
    "logrank_test",
    "restricted_mean_survival",
    "schoenfeld_residuals",
    "ph_assumption_test",
    "concordance_index",
    "weibull_aft",
    "weibull_aft_grouped",
    "aft_residuals",
    "aft_fit_diagnostic",
    "welch_ttest",
    "chi2_independence",
    "proportions_ztest",
    "ks_test_2samp",
    "mannwhitney_utest",
    "distribution_drift",
    "distribution_drift_grouped",
    "corr_matrix",
    "numeric_profile",
    "binary_classification_eval",
    "regression_eval",
    "calibration_bins",
    "grouped_auc",
    "lift_table",
    "roc_points",
    "ewma_latest",
    "ewma_series",
    "holt_series",
    "holt_forecast",
    "SparkBinaryEvaluator",
    "GLM",
    "GLMSummary",
    "glm",
    "glm_grouped",
    "save_model",
    "load_model",
    "SparkLM",
    "SparkLMModel",
    "SparkGLM",
    "SparkGLMModel",
    "SparkPCA",
    "SparkPCAModel",
    "SparkWordPiece",
    "SparkWordPieceModel",
    "SparkCorpusPrep",
    "SparkHuberLM",
    "SparkHuberLMModel",
    "SparkCoxPH",
    "SparkCoxPHModel",
    "SparkQuantileLM",
    "SparkQuantileLMModel",
    "SparkWeibullAFT",
    "SparkWeibullAFTModel",
]

__version__ = "0.1.0"
