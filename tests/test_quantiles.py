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
