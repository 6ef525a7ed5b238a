from cdc_example_spark.streaming.envelope import decode_envelope, route_changes

__all__ = ["decode_envelope", "route_changes"]
