"""A Python Data Source (Spark 4 API) modeling the reference's
paginated REST scans — SURVEY S1/S2: Companies House advanced search
with server-side filters (`sic_codes`/`company_status` passed "directly
in the API call for efficiency", api_clients.py:231-280) and
size/start_index pagination.

This is the Spark-native form of that source:
- **partition = page range**: the paginated scan parallelizes across
  executors (the reference loops pages serially on one thread),
- **pushFilters**: equality filters on status/sic_code are accepted and
  applied "server-side" (by the mock API), exactly like the
  reference's query-string filters; everything else stays a residual
  Spark filter — Catalyst splits automatically,
- **rate limiting**: per-partition min-interval, the reference's
  client-side throttle (api_clients.py:118).

The HTTP layer is a deterministic in-process mock (`MockCompaniesAPI`)
because external APIs are unreachable here; a live implementation
swaps `_fetch_page` for a requests call and keeps everything else.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = ("company_number string, company_name string, "
              "company_status string, sic_code string, page int")

STATUSES = ["active", "active", "active", "dissolved", "liquidation"]
SIC_CODES = ["41100", "41200", "68100", "62012"]


class MockCompaniesAPI:
    """Deterministic stand-in for the paged REST endpoint."""

    @staticmethod
    def fetch_page(page: int, page_size: int,
                   status: str | None, sic_code: str | None) -> list[tuple]:
        rows = []
        for i in range(page * page_size, (page + 1) * page_size):
            h = int.from_bytes(
                hashlib.md5(str(i).encode()).digest()[:4], "big")
            row_status = STATUSES[h % len(STATUSES)]
            row_sic = SIC_CODES[(h >> 8) % len(SIC_CODES)]
            if status is not None and row_status != status:
                continue  # "server-side" filter
            if sic_code is not None and row_sic != sic_code:
                continue
            rows.append((f"{i:08d}", f"COMPANY {i} LIMITED",
                         row_status, row_sic, page))
        return rows


class _PageRange(InputPartition):
    def __init__(self, start_page: int, end_page: int):
        self.start_page = start_page
        self.end_page = end_page


class CompaniesAPIReader(DataSourceReader):
    def __init__(self, options: dict):
        self.total = int(options.get("total", "1000"))
        self.page_size = int(options.get("pagesize", "100"))
        self.pages_per_partition = int(options.get("pages_per_partition", "2"))
        self.rate_per_sec = float(options.get("rate_per_sec", "0"))
        self.status: str | None = None
        self.sic_code: str | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept equality filters the 'API' supports; everything else
        is returned to Spark as a residual."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("company_status",):
                self.status = f.value
            elif isinstance(f, EqualTo) and f.attribute == ("sic_code",):
                self.sic_code = f.value
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        n_pages = (self.total + self.page_size - 1) // self.page_size
        step = self.pages_per_partition
        return [_PageRange(p, min(p + step, n_pages))
                for p in range(0, n_pages, step)]

    def read(self, partition: _PageRange) -> Iterator[tuple]:
        min_interval = 1.0 / self.rate_per_sec if self.rate_per_sec else 0.0
        last = 0.0
        for page in range(partition.start_page, partition.end_page):
            if min_interval:
                now = time.monotonic()
                if now - last < min_interval:
                    time.sleep(min_interval - (now - last))
                last = time.monotonic()
            yield from MockCompaniesAPI.fetch_page(
                page, self.page_size, self.status, self.sic_code)


class CompaniesAPISource(DataSource):
    """spark.read.format("companies_api").option("total", ...)"""

    @classmethod
    def name(cls) -> str:
        return "companies_api"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> CompaniesAPIReader:
        return CompaniesAPIReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CompaniesAPISource)
