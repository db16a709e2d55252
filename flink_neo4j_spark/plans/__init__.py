"""Physical-plan introspection: assertions that the plans the engine
declares are the plans Catalyst should pick (pushdown, pruning, broadcast,
top-k). Used by tests and the perf harness."""

from flink_neo4j_spark.plans.explain import (
    formatted_plan,
    has_broadcast_join,
    has_take_ordered,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "has_take_ordered",
    "pushed_filters",
    "read_schema_columns",
]
