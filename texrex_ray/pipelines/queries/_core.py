"""Driver-facing query registry: Ray pipelines + DuckDB oracle SQL.

Each entry is one operator/pipeline from SURVEY.md §2 (or a training-data
op from the build brief), implemented Ray-Data-first, with — where the
semantics are ANSI-SQL-expressible — an equivalent DuckDB SQL string over
the same parquet tables.  Column names match exactly between both sides;
float aggregates are emitted as scaled BIGINT cents so value-hash
comparison is precision-safe.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(x) -> int:
    return int(round(float(x) * 100))
