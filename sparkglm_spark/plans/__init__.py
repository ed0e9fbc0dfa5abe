from sparkglm_spark.plans.gram import GramResult, gram_aggregate, gram_query

__all__ = ["gram_aggregate", "gram_query", "GramResult"]
