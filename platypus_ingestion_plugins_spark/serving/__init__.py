from platypus_ingestion_plugins_spark.serving.query import (  # noqa: F401
    match_all,
    term,
    term_in_set,
    match_text,
    top_hits,
    retrieve_fields,
    search,
)
from platypus_ingestion_plugins_spark.serving.table import ServingTable  # noqa: F401
