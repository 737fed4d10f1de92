from platypus_ingestion_plugins_spark.functions.converters import (  # noqa: F401
    sink_stringify,
    flatten_structs,
)
from platypus_ingestion_plugins_spark.functions.lm import (  # noqa: F401
    unigram_model,
    doc_logprob,
    logprob_filter,
    bigram_model,
    doc_bigram_logprob,
)
from platypus_ingestion_plugins_spark.functions.sampling import (  # noqa: F401
    deterministic_sample,
    stratified_sample,
    hash_split,
    temperature_mix,
    weighted_sample_wor,
    select_token_budget,
    stratified_interleave,
    solve_mixture,
)
from platypus_ingestion_plugins_spark.functions.classifier import (  # noqa: F401
    doc_features,
    train_logreg,
    score_logreg,
)
from platypus_ingestion_plugins_spark.functions.bpe import (  # noqa: F401
    learn_bpe,
    load_merges_txt,
    bpe_encode,
)
from platypus_ingestion_plugins_spark.functions.evals import (  # noqa: F401
    classification_report,
    calibration_report,
    knn_classify,
    unigram_kl_divergence,
    match_synonyms,
)
