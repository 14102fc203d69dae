from .lineage import enrich_lineage  # noqa: F401
from .lake import LakeLayout, write_lake, read_lake, refresh_table  # noqa: F401
from .watermark import daily_ranges, lake_watermark, resume_start  # noqa: F401
from .orchestrate import EndpointResult, run_endpoints  # noqa: F401
