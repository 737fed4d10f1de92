"""Projection operators: field rename mapping and drop-by-prefix.

Reference: field mapping config paimonName->indexName applied per field
(PaimonToAddDocumentConverter.java:80-88, PaimonConfig.java:80-82);
drop-by-prefix for internal columns like __internal_partition_id
(PaimonToAddDocumentConverter.java:317-328, applied :75-78).

Both are pure projections — Catalyst's ColumnPruning pushes the
narrowed schema into the parquet scan, so a dropped column is never
read off disk at any scale.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame


def rename_fields(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Rename columns per ``{source_name: target_name}``; others pass through."""
    missing = set(mapping) - set(df.columns)
    if missing:
        raise ValueError(f"rename sources not in schema: {sorted(missing)}")
    return df.withColumnsRenamed(dict(mapping))


def drop_by_prefix(df: DataFrame, prefixes: Sequence[str]) -> DataFrame:
    """Drop every column whose name starts with any prefix.

    Prefix matching is exact-prefix (``temp_file`` is kept for prefix
    ``tmp_``, dropped for ``tmp`` — boundary semantics per reference
    tests PaimonToAddDocumentConverterTest.java:447-688).
    """
    doomed = [c for c in df.columns if any(c.startswith(p) for p in prefixes)]
    return df.drop(*doomed) if doomed else df
