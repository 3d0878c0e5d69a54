"""Benchmark sweeps — methodology parity with the reference's
`/root/reference/benchmarks/benchtests.jl:9-133` (size sweeps
``2^(2:1.5:20)`` over sum / permutedims / mul / tensor contraction), adapted
to TPU: each workload is timed through the strided engine and through plain
jnp/XLA as the in-framework baseline, on whatever backend is active.

Usage:  timeout 590 python benchmarks/sweeps.py [--quick]
Writes `benchmarks/results_<backend>.json`.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import strided_tpu as st
from strided_tpu.utils.timing import time_chained, time_fn


def _sizes(quick):
    # 2^(2:1.5:20) like benchtests.jl:9, capped for wall-clock sanity
    exps = [2, 3.5, 5, 6.5, 8, 9.5, 11] if quick else [2, 3.5, 5, 6.5, 8, 9.5, 11, 12.5]
    return [int(2 ** e) for e in exps]


def bench_sum(results, quick):
    for n in _sizes(quick):
        d = max(4, int(math.sqrt(n * n)))
        a = jnp.asarray(np.random.default_rng(0).standard_normal((d, d)), jnp.float32)
        f_str = jax.jit(lambda x: st.sreduce(lambda v: v, jnp.add, st.transpose(st.strided(x))))
        f_jnp = jax.jit(lambda x: jnp.sum(x.T))
        results.append(
            {
                "bench": "sum_transposed",
                "size": d,
                "strided_s": time_fn(f_str, a, inner=5, repeats=2),
                "jnp_s": time_fn(f_jnp, a, inner=5, repeats=2),
            }
        )


def bench_permute(results, quick):
    for d in ([8, 16, 32] if quick else [8, 16, 24, 32]):
        a = jnp.asarray(
            np.random.default_rng(1).standard_normal((d, d, d, d)), jnp.float32
        )
        perm = (3, 2, 1, 0)

        @jax.jit
        def f_str(x):
            out = st.strided(jnp.zeros_like(x).reshape(tuple(x.shape[p] for p in perm)))
            return st.permutedims_into(out, st.strided(x), perm).parent

        f_jnp = jax.jit(lambda x: jnp.transpose(x, perm).copy())
        results.append(
            {
                "bench": "permutedims_4d",
                "size": d,
                "strided_s": time_fn(f_str, a, inner=5, repeats=2),
                "jnp_s": time_fn(f_jnp, a, inner=5, repeats=2),
            }
        )


def bench_mul(results, quick):
    for d in ([64, 256, 1024] if quick else [64, 256, 1024, 2048]):
        a = jnp.asarray(np.random.default_rng(2).standard_normal((d, d)), jnp.float32)
        b = jnp.asarray(np.random.default_rng(3).standard_normal((d, d)), jnp.float32)

        @jax.jit
        def f_str(x, y):
            C = st.strided(jnp.zeros((d, d), jnp.float32))
            return st.mul(C, st.transpose(st.strided(x)), st.strided(y)).parent

        f_jnp = jax.jit(lambda x, y: x.T @ y)
        results.append(
            {
                "bench": "mul_At_B",
                "size": d,
                "strided_s": time_fn(f_str, a, b, inner=5, repeats=2),
                "jnp_s": time_fn(f_jnp, a, b, inner=5, repeats=2),
            }
        )


def bench_contraction(results, quick):
    """MERA-style ternary tensor contraction (benchtests.jl's tensor
    workload family): C[a,d] = sum_{b,c} A[a,b,c] * W[b,c,d]."""
    for d in ([8, 16] if quick else [8, 16, 32]):
        A = jnp.asarray(
            np.random.default_rng(4).standard_normal((d * 4, d, d)), jnp.float32
        )
        W = jnp.asarray(
            np.random.default_rng(5).standard_normal((d, d, d * 4)), jnp.float32
        )

        @jax.jit
        def f_str(x, w):
            xv = st.sreshape(st.strided(x), (d * 4, d * d))
            wv = st.sreshape(st.strided(w), (d * d, d * 4))
            C = st.strided(jnp.zeros((d * 4, d * 4), jnp.float32))
            return st.mul(C, xv, wv).parent

        f_jnp = jax.jit(lambda x, w: jnp.einsum("abc,bcd->ad", x, w))
        results.append(
            {
                "bench": "contraction_mera",
                "size": d,
                "strided_s": time_fn(f_str, A, W, inner=5, repeats=2),
                "jnp_s": time_fn(f_jnp, A, W, inner=5, repeats=2),
            }
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    results = []
    for fn in (bench_sum, bench_permute, bench_mul, bench_contraction):
        fn(results, args.quick)
        print(f"[sweeps] {fn.__name__} done", file=sys.stderr, flush=True)
    backend = jax.default_backend()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), f"results_{backend}.json")
    with open(out, "w") as f:
        json.dump({"backend": backend, "results": results}, f, indent=1)
    for r in results:
        ratio = r["jnp_s"] / r["strided_s"] if r["strided_s"] else float("nan")
        print(
            f"{r['bench']:18s} size={r['size']:5d} strided={r['strided_s']*1e6:9.1f}us "
            f"jnp={r['jnp_s']*1e6:9.1f}us ratio={ratio:5.2f}x"
        )


if __name__ == "__main__":
    main()
