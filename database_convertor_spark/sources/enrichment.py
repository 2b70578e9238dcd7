"""Per-row API enrichment as a distributed map stage — SURVEY S3/S4/S10.

The reference enriches rows by calling external APIs (Companies House
officer/charge lookups api_clients.py:174-203, Hunter/Apollo/Clearbit/
BrightData api_clients.py:1685-2520) in driver-side loops throttled to
2 req/s with Retry-After handling (api_clients.py:110-159).

Spark-first shape: `df.repartition(n).mapInPandas(fetch)` — each
partition runs a rate-limited fetch loop with its own resolver
instance (constructed inside the task via a factory, so no live HTTP
client is ever pickled). Cluster-wide throughput = partitions x
per-partition rate, so `partitions = ceil(target_rps / per_task_rps)`
is the sizing rule; the reference's ThreadPoolExecutor(3) becomes the
task scheduler.

External APIs are unreachable in this environment, so the shipped
resolvers are deterministic mocks; a live resolver only needs to
implement `resolve(keys) -> list[dict|None]`.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame


class Resolver:
    """Batch key resolver interface. Implementations may call external
    services; construct them inside the factory (per task), never on
    the driver."""

    def resolve(self, keys: list) -> list[dict | None]:
        raise NotImplementedError


class MockCompanyResolver(Resolver):
    """Deterministic fake of the Companies House per-entity lookup
    (S3): stable pseudo-data derived from the key, no I/O."""

    def resolve(self, keys: list) -> list[dict | None]:
        import hashlib
        out = []
        for k in keys:
            # hashlib, not hash(): PYTHONHASHSEED randomizes str hashes
            # per process, which would differ across executors/runs
            h = int.from_bytes(
                hashlib.md5(str(k).encode()).digest()[:4], "big") & 0x7FFFFFFF
            out.append({
                "status": "active" if h % 4 else "dissolved",
                "n_officers": (h >> 4) % 7,
                "has_charges": bool((h >> 8) % 3 == 0),
            })
        return out


class FlakyResolver(Resolver):
    """Test double for the retry path: fails the first `fail_times`
    batches with a retryable error (the reference's 429)."""

    def __init__(self, inner: Resolver, fail_times: int = 1):
        self.inner = inner
        self.remaining_failures = fail_times

    def resolve(self, keys: list) -> list[dict | None]:
        if self.remaining_failures > 0:
            self.remaining_failures -= 1
            raise TimeoutError("simulated 429")
        return self.inner.resolve(keys)


class RateLimiter:
    """Min-interval limiter: at most `rate` calls/sec within one task
    (the reference's 0.5 s sleep per request, api_clients.py:118)."""

    def __init__(self, rate_per_sec: float):
        self.min_interval = 1.0 / rate_per_sec if rate_per_sec > 0 else 0.0
        self._last = 0.0

    def wait(self) -> None:
        if self.min_interval <= 0:
            return
        now = time.monotonic()
        delta = now - self._last
        if delta < self.min_interval:
            time.sleep(self.min_interval - delta)
        self._last = time.monotonic()


def _resolve_with_retry(resolver: Resolver, keys: list,
                        max_retries: int, backoff: float) -> list[dict | None]:
    """Progressive-backoff retry (reference: Retry-After capped 10 s,
    else 3 s / 5 s, max 2 retries — api_clients.py:132-146)."""
    for attempt in range(max_retries + 1):
        try:
            return resolver.resolve(keys)
        except Exception:
            if attempt == max_retries:
                return [None] * len(keys)
            time.sleep(min(backoff * (attempt + 1), 10.0))
    return [None] * len(keys)


def enrich(df: DataFrame, key_col: str,
           resolver_factory: Callable[[], Resolver],
           result_fields: dict[str, str],
           rate_per_sec: float = 0.0,
           batch_size: int = 50,
           max_retries: int = 2,
           backoff_seconds: float = 0.0,
           num_partitions: int | None = None) -> DataFrame:
    """Attach resolver output columns to every row of ``df``.

    result_fields maps output column -> Spark DDL type (nullable); a
    failed batch after retries yields nulls for its rows (the
    reference's error side-output, never a job failure).
    """
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    out_schema = in_schema + ", " + ", ".join(
        f"{name} {ddl}" for name, ddl in result_fields.items())
    field_names = list(result_fields)

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resolver = resolver_factory()
        limiter = RateLimiter(rate_per_sec)
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start:start + batch_size]
                limiter.wait()
                results = _resolve_with_retry(
                    resolver, chunk[key_col].tolist(), max_retries,
                    backoff_seconds)
                enriched = chunk.copy()
                for name in field_names:
                    enriched[name] = [
                        (r or {}).get(name) for r in results]
                yield enriched

    source = df.repartition(num_partitions) if num_partitions else df
    return source.mapInPandas(fetch, schema=out_schema)


class MockUrlResolver(Resolver):
    """Deterministic fake of the planning-URL batch resolver (S9):
    stable URL per ref, no I/O."""

    def resolve(self, keys: list) -> list[dict | None]:
        return [{"url": f"https://planning.example/{k}"} for k in keys]


def resolve_grouped(df: DataFrame, group_col: str, key_col: str,
                    resolver_factory: Callable[[], Resolver],
                    supported_groups: list[str],
                    result_col: str = "url",
                    max_retries: int = 2,
                    backoff_seconds: float = 0.0) -> DataFrame:
    """SURVEY S9 — the reference's resolve_batch_items
    (api_clients.py:23-92): the resolver service accepts ONE group
    (borough) per request, so rows are filtered to supported groups,
    grouped, and resolved one service call per group; results align to
    input rows and a failed group degrades to 'N/A' per item instead
    of failing the job.

    Spark-first shape: the reference's driver-side dict-of-lists
    grouping IS ``groupBy(group_col).applyInPandas`` — each group
    arrives as one pandas frame, exactly the one-request batch, and
    groups resolve in parallel across the cluster (the reference
    resolves boroughs serially). Unsupported groups are dropped before
    the shuffle (the reference returns [] for them)."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.schema.fields) + f", {result_col} string"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        resolver = resolver_factory()
        results = _resolve_with_retry(
            resolver, pdf[key_col].tolist(), max_retries, backoff_seconds)
        out = pdf.copy()
        out[result_col] = [(r or {}).get(result_col, "N/A") or "N/A"
                           for r in results]
        return out

    from pyspark.sql import functions as F

    return (df.filter(F.col(group_col).isin(supported_groups))
            .groupBy(group_col)
            .applyInPandas(per_group, schema=out_schema))
