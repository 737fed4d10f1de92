from platypus_ingestion_plugins_spark.streaming.pipeline import (  # noqa: F401
    CdcStreamingPipeline,
    RetryPolicy,
    ThroughputListener,
)
from platypus_ingestion_plugins_spark.streaming.windows import (  # noqa: F401
    session_counts,
    windowed_counts,
    with_event_time,
)
