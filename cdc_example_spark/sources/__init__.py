from cdc_example_spark.sources.catalog import load_table, register_views

__all__ = ["load_table", "register_views"]
