from platypus_ingestion_plugins_spark.operators.projection import (  # noqa: F401
    rename_fields,
    drop_by_prefix,
)
from platypus_ingestion_plugins_spark.operators.cdc import (  # noqa: F401
    last_wins,
    apply_changelog,
    split_upserts_deletes,
)
from platypus_ingestion_plugins_spark.operators.sharding import (  # noqa: F401
    ShardingStrategy,
    NoShardingStrategy,
    ModuloShardingStrategy,
    sharding_strategy,
    shard_id_from_service_name,
)
from platypus_ingestion_plugins_spark.operators.export import (  # noqa: F401
    shuffle_positions,
    export_shuffled,
    pack_bins,
    materialize_packs,
    export_tar_shards,
    read_tar_shards,
    scrub_tar_shards,
    export_jsonl_shards,
    read_jsonl_shards,
)
from platypus_ingestion_plugins_spark.operators.profile import (  # noqa: F401
    corpus_profile,
    profile_merge_into,
    profile_read,
)
from platypus_ingestion_plugins_spark.operators.resample import (  # noqa: F401
    resample_last_ffill,
)
from platypus_ingestion_plugins_spark.operators.validate import (  # noqa: F401
    Check,
    check_constraints,
    not_null,
    in_range,
    accepted_values,
    unique,
    references,
)
from platypus_ingestion_plugins_spark.operators.chat import (  # noqa: F401
    render_chat,
    chat_turn_stats,
    with_chat_stats,
    sft_gate,
    assistant_transcript_key,
    assistant_dedup,
)
from platypus_ingestion_plugins_spark.operators.graph import (  # noqa: F401
    pagerank,
)
from platypus_ingestion_plugins_spark.operators.geo import (  # noqa: F401
    haversine_km,
    bounding_box,
    box_for_radius,
    geo_distance,
    geo_cell,
    geo_grid_counts,
    write_geo_partitioned,
    read_geo_pruned,
)
