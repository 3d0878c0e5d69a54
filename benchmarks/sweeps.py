"""Benchmark sweeps — methodology parity with the reference's
`/root/reference/benchmarks/benchtests.jl:9-133` (size sweeps over sum /
permutedims / mul / tensor contraction), adapted to TPU: each workload is
timed through the strided engine and through plain jnp/XLA as the
in-framework baseline, on whatever backend is active.

Timing: every workload is wrapped shape-preserving (result feeds back into
the input with an epsilon weight so nothing can be dead-code-eliminated) and
measured with ``time_slope`` — k chained applications inside one jitted
``fori_loop`` at two loop lengths; the slope cancels the ~25 ms/dispatch
tunnel overhead (see `strided_tpu/utils/timing.py`).

Usage:  timeout 590 python benchmarks/sweeps.py [--quick]
Writes `benchmarks/results_<backend>.json`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import strided_tpu as st
from strided_tpu.utils.timing import time_slope

EPS = 1e-30  # keeps a data dependency without perturbing values


def _slope(fn, x):
    return time_slope(fn, x, k1=8, k2=56)


def bench_sum(results, quick):
    """sum over a lazy transposed view — benchtests.jl's sum family."""
    for d in ([2048, 8192] if quick else [1024, 2048, 4096, 8192]):
        a = jnp.asarray(np.random.default_rng(0).standard_normal((d, d)), jnp.float32)
        f_str = lambda x: x + st.sreduce(lambda v: v, jnp.add, st.transpose(st.strided(x))) * EPS
        f_jnp = lambda x: x + jnp.sum(x.T) * EPS
        s_str, s_jnp = _slope(f_str, a), _slope(f_jnp, a)
        results.append(
            {
                "bench": "sum_transposed",
                "size": d,
                "strided_s": s_str,
                "jnp_s": s_jnp,
                "strided_gbs": d * d * 4 / s_str / 1e9,
            }
        )


def bench_permute(results, quick):
    """4-D reversal permute copy — benchtests.jl's permutedims family."""
    for d in ([32, 64] if quick else [16, 32, 48, 64]):
        a = jnp.asarray(
            np.random.default_rng(1).standard_normal((d, d, d, d)), jnp.float32
        )
        perm = (3, 2, 1, 0)

        def f_str(x):
            out = st.strided(jnp.zeros_like(x))
            return st.permutedims_into(out, st.strided(x), perm).parent.reshape(x.shape)

        f_jnp = lambda x: jnp.transpose(x, perm).copy()
        s_str, s_jnp = _slope(f_str, a), _slope(f_jnp, a)
        results.append(
            {
                "bench": "permutedims_4d",
                "size": d,
                "strided_s": s_str,
                "jnp_s": s_jnp,
                "strided_gbs": a.size * 4 * 2 / s_str / 1e9,
            }
        )


def bench_mul(results, quick):
    """alpha/beta matmul with a lazy-transposed operand."""
    for d in ([1024, 4096] if quick else [512, 1024, 2048, 4096]):
        a = jnp.asarray(np.random.default_rng(2).standard_normal((d, d)), jnp.float32)

        def f_str(x):
            C = st.strided(jnp.zeros((d, d), jnp.float32))
            return st.to_array(st.mul(C, st.transpose(st.strided(x)), st.strided(x)))

        # same precision policy as the engine (exact-f32 mode) so the
        # comparison is apples-to-apples; the engine's speed/accuracy knob is
        # STRIDED_TPU_MATMUL_PRECISION.
        from jax import lax

        f_jnp = lambda x: jnp.matmul(x.T, x, precision=lax.Precision.HIGHEST)
        s_str, s_jnp = _slope(f_str, a), _slope(f_jnp, a)
        results.append(
            {
                "bench": "mul_At_B",
                "size": d,
                "strided_s": s_str,
                "jnp_s": s_jnp,
                "strided_tflops": 2 * d**3 / s_str / 1e12,
            }
        )


def bench_contraction(results, quick):
    """MERA-style ternary contraction C[a,d] = sum_bc A[a,b,c] W[b,c,d]
    (benchtests.jl's tensor workload family), via lazy sreshape + mul."""
    for d in ([32, 64] if quick else [16, 32, 64]):
        A = jnp.asarray(
            np.random.default_rng(4).standard_normal((d * 4, d, d)), jnp.float32
        )
        W = jnp.asarray(
            np.random.default_rng(5).standard_normal((d, d, d * 4)), jnp.float32
        )

        def f_str(x):
            xv = st.sreshape(st.strided(x), (d * 4, d * d))
            wv = st.sreshape(st.strided(W), (d * d, d * 4))
            C = st.strided(jnp.zeros((d * 4, d * 4), jnp.float32))
            r = st.to_array(st.mul(C, xv, wv))
            return x + r.sum() * EPS

        f_jnp = lambda x: x + jnp.einsum("abc,bcd->ad", x, W).sum() * EPS
        s_str, s_jnp = _slope(f_str, A), _slope(f_jnp, A)
        results.append(
            {
                "bench": "contraction_mera",
                "size": d,
                "strided_s": s_str,
                "jnp_s": s_jnp,
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
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"results_{backend}.json"
    )
    with open(out, "w") as f:
        json.dump({"backend": backend, "results": results}, f, indent=1)
    for r in results:
        ratio = r["jnp_s"] / r["strided_s"] if r["strided_s"] > 0 else float("nan")
        # the tunnel's measurement noise floor is ~±50 us/step even after
        # slope timing; flag entries where the workload is below it
        if r["strided_s"] < 6e-5 or r["jnp_s"] < 6e-5:
            r["note"] = "below tunnel noise floor (~50us) - not meaningful"
        extra = " [sub-noise]" if "note" in r else ""
        if "strided_gbs" in r:
            extra += f" {r['strided_gbs']:7.1f} GB/s"
        if "strided_tflops" in r:
            extra += f" {r['strided_tflops']:6.1f} TFLOP/s"
        print(
            f"{r['bench']:18s} size={r['size']:5d} strided={r['strided_s']*1e6:9.1f}us "
            f"jnp={r['jnp_s']*1e6:9.1f}us ratio={ratio:5.2f}x{extra}"
        )


if __name__ == "__main__":
    main()
