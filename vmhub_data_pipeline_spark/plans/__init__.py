from .introspect import (  # noqa: F401
    explain_str,
    count_exchanges,
    has_broadcast_join,
    has_pushed_filters,
    has_window_group_limit,
    single_partition_window_count,
    codegen_coverage,
)
