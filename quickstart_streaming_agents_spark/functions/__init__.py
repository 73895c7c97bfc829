from quickstart_streaming_agents_spark.functions.ml import ml_predict
from quickstart_streaming_agents_spark.functions.vector import vector_search, vector_search_flat

__all__ = ["ml_predict", "vector_search", "vector_search_flat"]
