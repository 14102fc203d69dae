"""The paginated-REST scan as a first-class Spark data source (SURVEY §4's
"DataSourceV2 formalization" of S1, via the Spark 4 Python Data Source API).

Usage:
    spark.dataSource.register(VMHubDataSource)
    df = (spark.read.format("vmhub")
          .option("endpoint", "vendas")
          .option("page_size", "100")
          .option("dates", "2024-01-01,2024-01-02")
          .option("records_json", json.dumps(rows))   # mock backend
          .load())

Planning: one InputPartition per date slice — Spark schedules the fetch
tasks, retries them (spark.task.maxFailures) and runs them wherever there
are free executors; the reference's 2-thread fan-out becomes real cluster
parallelism. ``pushFilters`` accepts date-equality predicates so
``WHERE date = '...'`` prunes fetch partitions before any network call —
pushdown-by-construction, matching how the reference pushes
dataInicio/dataTermino into the HTTP query string
(reference src/api/vmhub_client.py:126-131).

The page loop inside each task is RestIngestor — the same retry/EOF/bisect
taxonomy as the mapInPandas path (rest.py); this class only adds the
catalog-integrated planning shell. A live HTTP backend replaces
``_transport`` without touching the planning logic.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .rest import EndpointConfig, MockVMHubAPI, RestIngestor


class _DatePartition(InputPartition):
    def __init__(self, date: str) -> None:
        self.date = date


class VMHubDataSource(DataSource):
    """format name: ``vmhub``"""

    @classmethod
    def name(cls) -> str:
        return "vmhub"

    def schema(self) -> str:
        return "date string, page bigint, record string"

    def reader(self, schema) -> "VMHubReader":
        return VMHubReader(self.options)


class VMHubReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.endpoint = options.get("endpoint", "clientes")
        self.page_size = int(options.get("page_size", "10"))
        self.dates = [d for d in options.get("dates", "").split(",") if d] or ["__nodate__"]
        self.records = json.loads(options.get("records_json", "[]"))
        self.max_retries = int(options.get("max_retries", "3"))

    def pushFilters(self, filters: Sequence) -> Iterator:
        """Accept date-equality filters (prune fetch partitions); everything
        else is returned for Spark to evaluate post-scan."""
        for f in filters:
            name = type(f).__name__
            attr = getattr(f, "attribute", None)
            col = attr[0] if isinstance(attr, (list, tuple)) else attr
            if name == "EqualTo" and col == "date":
                value = getattr(f, "value", None)
                self.dates = [d for d in self.dates if d == value]
                continue  # consumed — not yielded back
            yield f

    def partitions(self) -> list[_DatePartition]:
        return [_DatePartition(d) for d in self.dates]

    def read(self, partition: _DatePartition) -> Iterator[tuple]:
        cfg = EndpointConfig(
            self.endpoint, page_size=self.page_size, max_retries=self.max_retries
        )
        api = MockVMHubAPI({self.endpoint: self.records})
        ing = RestIngestor(cfg, api.get)
        for page_no, rows in enumerate(ing.fetch_all()):
            for rec in rows:
                yield (partition.date, page_no, json.dumps(rec, sort_keys=True))
