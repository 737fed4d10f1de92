from platypus_ingestion_plugins_spark.serving.query import (  # noqa: F401
    match_all,
    term,
    term_in_set,
    match_text,
    match_wildcard,
    multi_match,
    more_like_this,
    range_query,
    bool_query,
    date_histogram_facet,
    top_hits,
    retrieve_fields,
    search,
    search_after,
)
from platypus_ingestion_plugins_spark.serving.table import ServingTable  # noqa: F401
from platypus_ingestion_plugins_spark.serving.text_index import (  # noqa: F401
    build_term_index,
    search_terms_indexed,
    search_phrase_indexed,
    bm25_indexed,
    suggest_terms,
    search_wildcard_indexed,
    search_bool_indexed,
    term_index_stats,
    more_like_this_indexed,
    delete_docs,
    compact_term_index,
)
from platypus_ingestion_plugins_spark.serving.aggs import run_aggs  # noqa: F401
