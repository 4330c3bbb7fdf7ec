from archetype_spark.plans.audit import (
    formatted_plan,
    join_impls,
    n_exchanges,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schemas",
    "n_exchanges",
    "join_impls",
]
