from amazon_climate_data_etl_spark.plans.inspect import (
    broadcast_join_count,
    exchange_count,
    plan_string,
    pushed_filters,
    read_schemas,
    scanned_columns,
    shuffle_count,
    sort_merge_join_count,
    wholestage_codegen_count,
)

__all__ = [
    "plan_string",
    "shuffle_count",
    "exchange_count",
    "broadcast_join_count",
    "sort_merge_join_count",
    "pushed_filters",
    "read_schemas",
    "scanned_columns",
    "wholestage_codegen_count",
]
