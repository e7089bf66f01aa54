"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01).
"""

from __future__ import annotations

import pytest

from data_ingestion_auto_spark import plans
from tools.parity import compare


def _all_names():
    return sorted(plans.REGISTRY)


@pytest.mark.parametrize("name", _all_names())
def test_query_parity(name, spark, duck, sf_dir):
    q = plans.REGISTRY[name]
    sdf = q.spark(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only check: must execute
        return
    ddf = duck.execute(q.oracle).fetchdf()
    errs = compare(name, sdf, ddf)
    assert not errs, f"{name}: " + "\n".join(errs)
    assert len(sdf) > 0, f"{name}: empty result proves nothing"
