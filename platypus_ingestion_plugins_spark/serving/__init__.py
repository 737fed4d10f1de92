from platypus_ingestion_plugins_spark.serving.query import (  # noqa: F401
    match_all,
    term,
    term_in_set,
    match_text,
    range_query,
    bool_query,
    top_hits,
    retrieve_fields,
    search,
)
from platypus_ingestion_plugins_spark.serving.table import ServingTable  # noqa: F401
from platypus_ingestion_plugins_spark.serving.text_index import (  # noqa: F401
    build_term_index,
    search_terms_indexed,
    search_phrase_indexed,
    bm25_indexed,
    suggest_terms,
    delete_docs,
    compact_term_index,
)
