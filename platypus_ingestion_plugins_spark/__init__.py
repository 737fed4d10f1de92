"""PySpark-native analytics/ingestion engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference NRTSearch ingestion plugins (Kafka Avro source + Paimon CDC
source -> search-index sink), extended with LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis), designed
for 100 TB scale: declarative DataFrame plans, Catalyst pushdown/pruning,
broadcast joins for small dims, no driver-side collects in any operator.
"""

__version__ = "0.1.0"

from platypus_ingestion_plugins_spark.config import (  # noqa: F401,E402
    KafkaIngestionConfig,
    PaimonIngestionConfig,
)
