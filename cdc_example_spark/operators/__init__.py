from cdc_example_spark.operators.keyed_state import KeyedStateSink

__all__ = ["KeyedStateSink"]
