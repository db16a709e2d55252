"""Connectors: the Cypher source/sink (the reference's implemented surface,
SURVEY.md §2.A A1-A19) re-expressed over Spark partitions with a pluggable
transport, plus parquet-backed graph storage helpers."""

from flink_neo4j_spark.sources.cypher import (
    CypherSinkBuilder,
    CypherSourceBuilder,
    extract_parameter_name,
    read_cypher,
    unwind_create_template,
    unwind_merge_template,
    write_cypher,
)
from flink_neo4j_spark.sources.transport import (
    BoltTransport,
    FileTransport,
    Transport,
)

__all__ = [
    "BoltTransport",
    "CypherSinkBuilder",
    "CypherSourceBuilder",
    "FileTransport",
    "Transport",
    "extract_parameter_name",
    "read_cypher",
    "unwind_create_template",
    "unwind_merge_template",
    "write_cypher",
]
