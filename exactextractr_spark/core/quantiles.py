"""Coverage-weighted quantiles, exact reproduction of the reference.

Algorithm from ``/root/reference/src/exactextract/src/weighted_quantiles.cpp:
20-70`` (itself after stats.stackexchange.com/a/13223): elements are the
DISTINCT cell values with weight = sum of coverage fractions for that value
(the value-frequency map, ``raster_stats.h:214-230``), sorted ascending;

    s_0 = 0
    s_k = k * w_k + (n - 1) * cumsum_{k-1}        (k >= 1)
    quantile(q): linear interpolation of x on s at q * sum_w * (n - 1).
"""

from __future__ import annotations

import numpy as np


def weighted_quantile(
    values: np.ndarray, weights: np.ndarray, qs: "np.ndarray | list[float] | float"
) -> np.ndarray:
    """Exact weighted quantile(s).

    ``values`` need not be pre-deduplicated or sorted; duplicates are merged
    (summing weights) to match the reference's frequency-map input.
    """
    q_arr = np.atleast_1d(np.asarray(qs, dtype=np.float64))
    if np.any(~np.isfinite(q_arr)) or np.any(q_arr < 0) or np.any(q_arr > 1):
        raise ValueError("Quantile must be between 0 and 1.")
    v = np.asarray(values, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    ok = ~np.isnan(v)
    v, w = v[ok], w[ok]
    if len(v) == 0:
        return np.full(len(q_arr), np.nan)
    # merge duplicates (frequency map semantics)
    uv, inv = np.unique(v, return_inverse=True)
    uw = np.bincount(inv, weights=w)
    n = len(uv)
    if n == 1:
        return np.full(len(q_arr), uv[0])
    cumsum = np.cumsum(uw)
    k = np.arange(n, dtype=np.float64)
    s = np.empty(n)
    s[0] = 0.0
    s[1:] = k[1:] * uw[1:] + (n - 1) * cumsum[:-1]
    sn = cumsum[-1] * (n - 1)
    target = q_arr * sn
    # first element with s > target  (std::upper_bound)
    right = np.searchsorted(s, target, side="right")
    left = right - 1
    out = np.empty(len(q_arr))
    at_end = right >= n
    out[at_end] = uv[-1]
    ne = ~at_end
    lr, rr = left[ne], right[ne]
    denom = s[rr] - s[lr]
    out[ne] = uv[lr] + (target[ne] - s[lr]) * (uv[rr] - uv[lr]) / denom
    return out
