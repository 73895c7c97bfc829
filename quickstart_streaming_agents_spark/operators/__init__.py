from quickstart_streaming_agents_spark.operators.windows import tumble

__all__ = ["tumble"]
