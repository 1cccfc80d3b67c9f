from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_streaming_postgres_lab2_spark.config import SparkConfig
from spark_streaming_postgres_lab2_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    cfg = SparkConfig(master="local[4]", shuffle_partitions=4, app_name="tests")
    s = build_session(cfg)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def round_half_up(x: float, ndigits: int) -> float:
    """HALF_UP rounding, matching Spark ``F.round`` and DuckDB ``round``.

    Python's built-in ``round()`` is banker's (HALF_EVEN): at an exact
    tie like 13/32 = 0.40625 it yields 0.4062 while both engines yield
    0.4063, so every pure-Python mirror that replays an engine-side
    ``round(x, n)`` must use this instead (same recipe as
    queries/core.money_sum: identical double math on both sides).
    """
    import math

    p = 10.0 ** ndigits
    return math.copysign(math.floor(abs(x) * p + 0.5), x) / p


# explicit schema for hand-built v2 event rows (None-valued fields defeat
# type inference on tiny frames)
EVENT_V2_DDL = (
    "event_id string, user_id int, session_id string, event_type string, "
    "product_id int, category string, price double, quantity int, "
    "user_segment string, search_query string, event_time string, "
    "source_system string"
)
