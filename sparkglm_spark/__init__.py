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
from sparkglm_spark.operators.lm import (
    LM,
    LMSummary,
    lm,
    lm_cross_validate,
    lm_grouped,
    wls,
)
from sparkglm_spark.operators.glm import GLM, GLMSummary, glm, glm_grouped
from sparkglm_spark.ml import (
    SparkCorpusPrep,
    SparkGLM,
    SparkGLMModel,
    SparkLM,
    SparkLMModel,
    SparkPCA,
    SparkPCAModel,
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
]

__version__ = "0.1.0"
