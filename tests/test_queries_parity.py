"""Oracle-differential tests: every registered query with an oracle must
hash-match DuckDB at sf0.001 (the driver runs the same check at sf0.01).

This is the reference's own correctness methodology — SQL audits over the
sink (/root/reference/README.md:86-113) — as a full differential harness.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tools.parity import compare, oracle_for


def _specs():
    from kafka_map_reduce_spark.registry import all_queries

    return sorted(all_queries().items())


@pytest.mark.parametrize("name,spec", _specs(), ids=[n for n, _ in _specs()])
def test_query(name, spec, spark, duck):
    df = spec.fn(spark, SF_SMOKE)
    # Harness canonicalizer contract: pandas sort_values over every column,
    # so array/map/struct cells (unhashable ndarray/dict) crash the external
    # check — recurred three times (q_agg_collect, q_array_funcs,
    # q_multimodal_decode r2). Every query must scalarize complex outputs.
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: top-level complex-typed columns {complex_cols} would crash "
        "the external harness canonicalizer — scalarize (concat_ws/to_json)"
    )
    sdf = df.toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only contract: executes, stable schema
        return
    ddf = duck.execute(oracle_for(spec, SF_SMOKE)).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: {problems}"
    assert len(sdf) > 0 or len(ddf) == 0
