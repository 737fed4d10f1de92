from platypus_ingestion_plugins_spark.functions.converters import (  # noqa: F401
    sink_stringify,
    flatten_structs,
)
from platypus_ingestion_plugins_spark.functions.lm import (  # noqa: F401
    unigram_model,
    doc_logprob,
    logprob_filter,
)
from platypus_ingestion_plugins_spark.functions.sampling import (  # noqa: F401
    deterministic_sample,
    stratified_sample,
    hash_split,
    temperature_mix,
)
