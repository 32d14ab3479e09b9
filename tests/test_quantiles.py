"""Exact distributed quantiles: numpy oracle + partition-count invariance."""

import numpy as np
import pandas as pd

from image_feature_extraction_spark.operators.quantiles import exact_quantile_values


def _oracle(vals: np.ndarray, n_bins: int):
    v = np.sort(vals)
    n = len(v)
    return {j - 1: v[(j * n) // n_bins] for j in range(1, n_bins)}


def test_exact_quantiles_match_numpy(spark):
    rng = np.random.default_rng(31)
    pdf = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 5000),
            "v": np.round(rng.normal(size=5000), 3),  # rounded -> duplicates
        }
    )
    out = (
        exact_quantile_values(spark.createDataFrame(pdf), value="v", keys="k", n_bins=4)
        .toPandas()
    )
    for k, grp in pdf.groupby("k"):
        want = _oracle(grp["v"].to_numpy(), 4)
        got = out[out.k == k].set_index("edge_idx")["edge_value"].to_dict()
        assert got == want, k


def test_exact_quantiles_partition_invariant(spark):
    rng = np.random.default_rng(12)
    pdf = pd.DataFrame({"k": ["x"] * 2000, "v": rng.integers(0, 50, 2000).astype(float)})
    outs = []
    for parts in (1, 7):
        df = spark.createDataFrame(pdf).repartition(parts)
        outs.append(
            exact_quantile_values(df, value="v", keys="k", n_bins=5)
            .toPandas()
            .sort_values("edge_idx")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_global_interpolated_quantiles_partition_boundaries(spark):
    """The floor/ceil order statistics of a wanted quantile can live in
    DIFFERENT range partitions; force tiny partitions so boundary
    straddling occurs and verify bit-parity with Spark percentile."""
    import numpy as np
    import pandas as pd

    from image_feature_extraction_spark.operators.quantiles import (
        global_interpolated_quantiles,
    )

    rng = np.random.default_rng(2)
    vals = np.round(rng.normal(0, 100, 997), 3)  # odd count, duplicates
    vals[::7] = vals[0]  # heavy duplicates across partitions
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    ps = [0.0, 0.01, 0.25, 0.5, 0.513, 0.75, 0.99, 1.0]
    # 64 partitions of ~15 rows each: quantile neighbors straddle often
    got = global_interpolated_quantiles(df, "v", ps, num_partitions=64)
    want = [float(x) for x in df.selectExpr(
        f"percentile(v, array({', '.join(repr(p) + 'D' for p in ps)})) q"
    ).collect()[0]["q"]]
    assert got == want  # bit-exact


def test_global_interpolated_quantiles_validates_ps_and_skips_nan(spark):
    """ps outside [0,1] raises a clear ValueError up front (not a late
    KeyError from a rank no partition owns), and NaN values are excluded
    like NULLs instead of silently occupying the top ranks (ADVICE r4)."""
    import pytest as _pytest

    from image_feature_extraction_spark.operators.quantiles import (
        global_interpolated_quantiles,
    )

    vals = [1.0, 2.0, 3.0, 4.0, float("nan"), None]
    df = spark.createDataFrame(pd.DataFrame({"v": pd.array(vals, dtype="float64")}))

    with _pytest.raises(ValueError, match=r"outside \[0, 1\]"):
        global_interpolated_quantiles(df, "v", [0.5, 1.5])
    with _pytest.raises(ValueError, match=r"outside \[0, 1\]"):
        global_interpolated_quantiles(df, "v", [-0.1])

    # NaN + NULL excluded: population is {1,2,3,4}
    got = global_interpolated_quantiles(df, "v", [0.0, 0.5, 1.0])
    assert got == [1.0, 2.5, 4.0]
