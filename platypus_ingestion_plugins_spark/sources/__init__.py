from platypus_ingestion_plugins_spark.sources.cdc_table import (  # noqa: F401
    read_cdc_snapshot,
    read_cdc_incremental,
    write_cdc_snapshot,
)
from platypus_ingestion_plugins_spark.sources.avro_ocf import (  # noqa: F401
    read_avro_ocf,
    stream_avro_ocf,
)
