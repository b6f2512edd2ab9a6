"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of uk-gov-mirror/dwp.hbase-to-mongo-export (HTME), rebuilt
Spark-first.

The reference (see /root/reference and SURVEY.md) is a Kotlin/Spring-Batch
snapshot exporter: scan HBase latest-version rows -> parse Kafka-style JSON
envelope -> decrypt AES-CTR payload -> normalise to Mongo extended JSON ->
size-rolled compressed snapshot files + pipe-delimited manifests.

Here that dataflow is a declarative DataFrame DAG (Catalyst optimises
pushdown/pruning/partitioning), plus 100 TB-scale extension operators
(dedup, similarity search, multimodal columns, text analysis).
"""

__version__ = "0.1.0"
