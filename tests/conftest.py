"""Shared fixtures: a local SparkSession and the reference modules loaded
as behavioral oracles (runtime import from /root/reference, never copied)."""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path
from types import SimpleNamespace

import pytest

REFERENCE = Path("/root/reference")


@pytest.fixture(scope="session")
def spark():
    from datamatcher_spark.session import get_spark

    s = get_spark("datamatcher-tests", master="local[4]", shuffle_partitions=8)
    yield s


def _load(name: str, relpath: str):
    spec = importlib.util.spec_from_file_location(name, REFERENCE / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def ref():
    """Reference modules as oracles. Skips if the reference isn't mounted."""
    if not REFERENCE.exists():
        pytest.skip("reference repo not available")
    kn = _load("ref_key_normalizer", "utils/key_normalizer.py")
    fm = _load("ref_fuzzy_matcher", "utils/fuzzy_matcher.py")
    tr = _load("ref_transformer", "core/transformer.py")
    mp = _load("ref_mapping", "core/mapping.py")
    # data_source.py does `from utils.key_normalizer import normalize_key`;
    # satisfy it without importing the reference's utils package (which
    # pulls optional desktop deps like chardet).
    pkg = sys.modules.setdefault("utils", types.ModuleType("utils"))
    pkg.key_normalizer = kn
    pkg.fuzzy_matcher = fm
    sys.modules.setdefault("utils.key_normalizer", kn)
    sys.modules.setdefault("utils.fuzzy_matcher", fm)
    ds = _load("ref_data_source", "core/data_source.py")
    return SimpleNamespace(kn=kn, fm=fm, tr=tr, mp=mp, ds=ds)


def spark_one_col(spark, values, expr, in_type="string"):
    """Run a single-column expression over a list of values, return results."""
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql.types import StructField, StructType

    from pyspark.sql import types as T

    t = {"string": T.StringType(), "double": T.DoubleType(), "binary": T.BinaryType()}[in_type]
    df = spark.createDataFrame(
        [(v,) for v in values], StructType([StructField("v", t, True)])
    )
    from pyspark.sql import functions as F

    out = df.select(expr(F.col("v")).alias("r")).collect()
    return [r.r for r in out]
