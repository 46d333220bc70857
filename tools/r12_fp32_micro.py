"""fp32-BLAS feasibility microbench for the semantic pair kernel
(r11 verdict item #6): is float32 U @ U.T actually faster on this host's
BLAS, and how often would an fp32 score land within a rescue band of a
decision boundary (the 0.85 threshold or a 1e-4 rounding edge)?

The exactness contract is floor(sim*10000+0.5)/10000 on float64; a pure
fp32 kernel can flip a pair whose true score sits within ~dim*ulp32 of a
boundary. The candidate design is therefore fp32-with-fp64-rescue:
score everything in fp32, recompute in float64 ONLY the pairs whose
fp32 score falls inside a conservative band around any boundary. This
tool measures (a) the raw matmul speedup, (b) the rescue-band hit rate
on hash-embed-like unit vectors, (c) the end-to-end kernel-shaped win
including the rescue gather — all driver-side numpy, no Spark.

Usage: python tools/r12_fp32_micro.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def unit_vectors(n: int, dim: int, seed: int) -> np.ndarray:
    # hash-embed-like: sparse-ish signed bucket sums, L2-normalized —
    # the distribution the production kernel actually sees (NOT
    # gaussian: hash embeds concentrate mass on few buckets, which
    # produces far more near-threshold similarity ties).
    rng = np.random.default_rng(seed)
    V = np.zeros((n, dim))
    for _ in range(6):  # ~6 tokens/bucket hits per doc
        idx = rng.integers(0, dim, size=n)
        sgn = rng.choice([-1.0, 1.0], size=n)
        V[np.arange(n), idx] += sgn
    V += 0.01 * rng.standard_normal((n, dim))
    V /= np.maximum(np.sqrt((V * V).sum(axis=1)), 1e-12)[:, None]
    return V


def main() -> None:
    out: dict = {"metric": "r12_fp32_micro"}
    dim, thr = 32, 0.85
    for c in (500, 2000):
        V64 = unit_vectors(c, dim, seed=c)
        V32 = V64.astype(np.float32)

        def best3(f):
            b = float("inf")
            for _ in range(3):
                t0 = time.time()
                f()
                b = min(b, time.time() - t0)
            return b

        t64 = best3(lambda: V64 @ V64.T)
        t32 = best3(lambda: V32 @ V32.T)

        S64 = V64 @ V64.T
        S32 = (V32 @ V32.T).astype(np.float64)
        iu, ju = np.triu_indices(c, k=1)
        s64, s32 = S64[iu, ju], S32[iu, ju]
        err = np.abs(s64 - s32).max()
        # rescue band: fp32 scores within eps of the threshold or of a
        # x.xxxx5 rounding edge must be recomputed in fp64. eps is set
        # 10x above the observed max error (safety), floored at 1e-6.
        eps = max(10.0 * err, 1e-6)
        near_thr = np.abs(s32 - thr) < eps
        frac = (s32 * 10000 + 0.5) % 1.0
        near_round = np.minimum(frac, 1.0 - frac) < eps * 10000
        rescue = near_thr | near_round
        # parity of the hybrid: rounded decisions identical?
        keep64 = s64 >= thr
        hyb = s32.copy()
        hyb[rescue] = s64[rescue]
        keep_h = hyb >= thr
        r64 = np.floor(s64[keep64] * 10000 + 0.5) / 10000
        rh = np.floor(hyb[keep_h] * 10000 + 0.5) / 10000
        parity = bool(
            keep64.sum() == keep_h.sum()
            and np.array_equal(keep64, keep_h)
            and np.array_equal(r64, rh)
        )
        # kernel-shaped end-to-end: fp32 matmul + band scan + fp64
        # recompute of the rescued pairs via row gather
        def hybrid():
            S = V32 @ V32.T
            s = S[iu, ju].astype(np.float64)
            band = (np.abs(s - thr) < eps)
            f = (s * 10000 + 0.5) % 1.0
            band |= np.minimum(f, 1.0 - f) < eps * 10000
            bi = np.where(band)[0]
            if len(bi):
                s[bi] = np.einsum(
                    "ij,ij->i", V64[iu[bi]], V64[ju[bi]]
                )
            return s

        th = best3(hybrid)
        out[f"c{c}"] = {
            "matmul64_ms": round(t64 * 1e3, 2),
            "matmul32_ms": round(t32 * 1e3, 2),
            "speedup_pure_matmul": round(t64 / t32, 2),
            "max_abs_err_fp32": float(f"{err:.2e}"),
            "rescue_eps": float(f"{eps:.2e}"),
            "rescue_fraction": round(float(rescue.mean()), 5),
            "hybrid_parity_with_fp64": parity,
            "hybrid_ms": round(th * 1e3, 2),
            "speedup_kernel_shaped": round(t64 / th, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
