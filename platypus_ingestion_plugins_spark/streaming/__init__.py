from platypus_ingestion_plugins_spark.streaming.pipeline import (  # noqa: F401
    CdcStreamingPipeline,
    RetryPolicy,
    ThroughputListener,
)
