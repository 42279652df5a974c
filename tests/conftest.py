from __future__ import annotations

import importlib.util

import pytest

from big_data_toolkit_spark.session import build_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# transformWithStateInPandas EXECUTION needs the protobuf package (the TWS
# Python worker speaks a protobuf state-server protocol to the JVM); plan
# construction does not. This probe self-heals: the moment the environment
# (or a vendored copy on sys.path) provides google.protobuf, the gated
# replay test runs with no code change — until then its skip line in the
# pytest output IS the documentation of the boundary
# (streaming/trending.py:134-140).
try:
    # find_spec raises ModuleNotFoundError when even the parent `google`
    # namespace package is absent (this container), returns None when only
    # the child is missing — both mean "no protobuf".
    HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    HAS_PROTOBUF = False
TWS_SKIP_REASON = (
    "transformWithStateInPandas execution needs the protobuf package "
    "(TWS python worker <-> JVM state-server protocol); not in this container"
)
requires_protobuf = pytest.mark.skipif(not HAS_PROTOBUF, reason=TWS_SKIP_REASON)


@pytest.fixture(scope="session")
def spark():
    spark = build_spark(app_name="bdts-tests", master="local[4]")
    yield spark
    spark.stop()
