from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _activate_proto_shim() -> None:
    """Make ``google.protobuf`` importable when site-packages lacks it,
    via the vendored pure-python copy bridged by tests/_proto_shim —
    see that package's docstrings. Must run BEFORE the Spark session
    starts: the JVM inherits this process's PYTHONPATH and passes it to
    the Python workers it forks, which is where the
    transformWithStateInPandas state-server protocol deserializes
    protobuf. No-op when protobuf is genuinely installed."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return
    except Exception:
        pass
    shim = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_proto_shim")
    sys.path.insert(0, shim)
    try:
        import google.protobuf.descriptor  # noqa: F401
    except Exception:
        sys.path.remove(shim)  # vendor dir absent on this box: stay skipped
        return
    os.environ["PYTHONPATH"] = shim + os.pathsep + os.environ.get("PYTHONPATH", "")
    # apply the shim's gencode/runtime-gate relaxation in THIS process
    # too (workers get it via sitecustomize at interpreter start; the
    # pytest interpreter already started, so load it by path — a plain
    # `import sitecustomize` could collide with a host-level one)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_proto_shim_sitecustomize", os.path.join(shim, "sitecustomize.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)


_activate_proto_shim()

from projet5_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="projet5-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_CORRECT
