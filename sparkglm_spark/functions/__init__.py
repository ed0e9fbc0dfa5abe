from sparkglm_spark.functions.encoding import (
    cast_all,
    get_levels,
    match_cols,
    model_matrix,
    omit_na,
)

__all__ = ["model_matrix", "match_cols", "cast_all", "omit_na", "get_levels"]
