"""Iterate on one catalog query: run the Spark fn vs its DuckDB oracle at
sf0.001 (or $SPARK_GRAFT_SF_DIR) and print the mirror verdict.

Usage: python scripts/check_query.py name [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vmhub_data_pipeline_spark import queries as catalog
from vmhub_data_pipeline_spark.session import build_session
from vmhub_data_pipeline_spark.testing import compare


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    catalog._load_all()
    spark = build_session("check-query")
    failed = 0
    for name in sys.argv[1:]:
        q = catalog.REGISTRY[name]
        if q.oracle is None:
            n = q.fn(spark, sf_dir).count()
            print(f"{name}: rows-only, {n} rows")
            continue
        ok, detail = compare(spark, q.fn, q.oracle, sf_dir)
        print(f"{name}: {'OK' if ok else 'FAIL'} {detail}")
        failed += 0 if ok else 1
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
