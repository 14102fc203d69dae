from .lineage import enrich_lineage  # noqa: F401
from .lake import LakeLayout, write_lake, read_lake, refresh_table  # noqa: F401
from .watermark import (  # noqa: F401
    daily_ranges,
    lake_watermark,
    refresh_incremental,
    resume_start,
)
from .orchestrate import EndpointResult, run_endpoints  # noqa: F401
from .compact import compact_partition, partition_stats  # noqa: F401
