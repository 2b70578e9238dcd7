"""Cross-session result cache keyed by the canonical logical plan —
SURVEY §4 "result caching" (the reference's PersistentCache: gzip-JSON
files keyed by SHA-256 of normalized criteria with TTL + size
eviction, persistent_cache.py:67-182; key canonicalization C29).

Spark-native: the cache key is the SHA-256 of the analyzed logical
plan string (the plan IS the normalized query criteria); the payload
is parquet. `df.persist()` covers intra-session reuse already — this
layer exists for the reference's cross-run cache semantics."""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


def plan_cache_key(df: DataFrame) -> str:
    """C29: canonical-form SHA-256. The analyzed (pre-optimization)
    plan is stable for a given query + inputs."""
    plan = df._jdf.queryExecution().analyzed().toString()
    # strip per-invocation expression ids (#123) and plan ids so two
    # constructions of the same query canonicalize identically
    plan = re.sub(r"#\d+", "#", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=", plan)
    return hashlib.sha256(plan.encode()).hexdigest()


class ResultCache:
    def __init__(self, root: str, ttl_seconds: float = 7 * 24 * 3600,
                 max_bytes: int = 500 * 1024 * 1024):
        self.root = root
        self.ttl = ttl_seconds
        self.max_bytes = max_bytes
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.root, key)

    def get_or_compute(self, spark: SparkSession, df: DataFrame) -> DataFrame:
        key = plan_cache_key(df)
        path = self._path(key)
        meta = os.path.join(path, "_cache_meta.json")
        if os.path.exists(meta):
            with open(meta) as fh:
                created = json.load(fh)["created"]
            if time.time() - created <= self.ttl:
                return spark.read.parquet(path)
            shutil.rmtree(path)
        df.write.mode("overwrite").parquet(path)
        with open(meta, "w") as fh:
            json.dump({"created": time.time(), "key": key}, fh)
        self._evict()
        return spark.read.parquet(path)

    def _evict(self) -> None:
        """LRU-by-oldest eviction over the size budget (the reference's
        500 MB policy, persistent_cache.py:77-93)."""
        entries = []
        total = 0
        for name in os.listdir(self.root):
            path = self._path(name)
            meta = os.path.join(path, "_cache_meta.json")
            if not os.path.isfile(meta):
                continue
            size = sum(os.path.getsize(os.path.join(dp, f))
                       for dp, _, fs in os.walk(path) for f in fs)
            with open(meta) as fh:
                created = json.load(fh)["created"]
            entries.append((created, path, size))
            total += size
        entries.sort()
        while total > self.max_bytes and entries:
            created, path, size = entries.pop(0)
            shutil.rmtree(path)
            total -= size
