from platypus_ingestion_plugins_spark.functions.converters import (  # noqa: F401
    sink_stringify,
    flatten_structs,
)
