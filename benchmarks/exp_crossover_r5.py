"""Round-5 pair-kernel crossover experiment (VERDICT r4 item 1).

Question: at the flagship sizes 4000^2-5120^2, does the tile-pair kernel or
XLA's fused transpose expression win — measured WITHOUT the on-chip
residency confound? The r4 chained harness let XLA collapse sub-~200 MB
working sets across loop steps (chained x+1 measured 7.9 TB/s, 10x HBM
spec; xla_sym_4000 read 668.7 GB/s vs its honest 268-class transpose rate),
while the opaque kernel streamed HBM — an apples-to-oranges comparison the
dispatch gate was set from.

Harness: **m interleaved chains**. The fori_loop carries a tuple of m
arrays; each ITERATION advances every chain independently in place:

    (x0, ..., x_{m-1})  ->  (barrier(op(barrier(x0))), ..., barrier(op(...)))

No cross-slot movement (a first draft ROTATED the tuple, which made XLA
shuffle-copy the carries every iteration and capped every variant at a
~220 GB/s copy floor — slot-stable updates alias buffers instead), and the
per-iteration live set is 2m buffers — m is chosen so that exceeds
~400 MB, far past the residency cliff, so no chain's tiles survive in any
cache between iterations. Per-iteration traffic = m workloads, so
seconds/workload = iteration_slope / m and GB/s = 2 * n^2 * 4 / t.

Honesty litmus (per size): chained ``x + 1.0`` under the SAME rotation must
measure at the ~650 GB/s stream rate, NOT the 7.9 TB/s residency artifact;
and the 8192^2 rows must reproduce the known standalone rates
(xla ~268, kernel ~324-331, results_tpu_r4.json crossover_k16_80).

Variants per size:
- ``stream``      — x + 1.0 (litmus: must be ~650, else harness is broken)
- ``xla_sym``     — jit (x + x.T) / 2
- ``kernel_sym``  — pair_axpby(x, scale_mode='div', scale=2) via the gate's
                    tile choice (512 for core >= 512)
- ``xla_scaleT``  — jit 0.999 * x.T      (README row 2 family)
- ``kernel_scaleT`` — pair_axpby(x, alpha=0, beta=0.999) (single-term kernel)
- ``xla/kernel_distinct`` — (x + y.T)/2 with BOTH operands evolving
                    (rot_slope2; 3-pass GB/s model)
- ``xla/kernel_sym_bf16`` — the symmetrize pair in bfloat16 (2-byte model)

Run:  timeout 3000 python benchmarks/exp_crossover_r5.py [--sizes 4000,5120]
Merges into benchmarks/results_tpu_r5.json under "pair_crossover_rotation".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_tpu_r5.json")
KEY = "pair_crossover_rotation"

# live set target: comfortably past the ~200-300 MB residency cliff
TARGET_BYTES = 420e6


def _drain(state):
    leaf = jax.tree_util.tree_leaves(state)[0]
    _ = float(jnp.sum(jnp.ravel(leaf)[:1]))


def rot_slope(fn, arrs, k1=32, k2=160, repeats=3):
    """Slope-timed seconds/WORKLOAD of ``fn`` under m interleaved chains
    (each fori_loop iteration advances every chain once, slot-stable)."""
    m = len(arrs)

    def step(state):
        return tuple(
            lax.optimization_barrier(fn(lax.optimization_barrier(x)))
            for x in state
        )

    def total(k):
        @jax.jit
        def loop(state):
            return lax.fori_loop(0, k, lambda i, s: step(s), state)

        st_ = loop(tuple(arrs))
        _drain(st_)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            st_ = loop(tuple(arrs))
            _drain(st_)
            best = min(best, time.perf_counter() - t0)
        return best

    return (total(k2) - total(k1)) / (k2 - k1) / m


def rot_slope2(fn2, arrs, k1=32, k2=160, repeats=3):
    """Two-operand variant for the distinct-buffer family: chain j advances
    as ``fn2(x_j, x_{j+1 mod m})`` so BOTH operands evolve — a fixed second
    operand would let XLA hoist its transpose out of the loop and measure
    nothing."""
    m = len(arrs)

    def step(state):
        return tuple(
            lax.optimization_barrier(
                fn2(
                    lax.optimization_barrier(state[j]),
                    lax.optimization_barrier(state[(j + 1) % m]),
                )
            )
            for j in range(m)
        )

    def total(k):
        @jax.jit
        def loop(state):
            return lax.fori_loop(0, k, lambda i, s: step(s), state)

        st_ = loop(tuple(arrs))
        _drain(st_)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            st_ = loop(tuple(arrs))
            _drain(st_)
            best = min(best, time.perf_counter() - t0)
        return best

    return (total(k2) - total(k1)) / (k2 - k1) / m


def run_size(n: int, out: dict, only=None):
    from strided_tpu.core.kernels_special import pair_axpby, pair_kernel_tile

    m = max(2, int(np.ceil(TARGET_BYTES / (2 * n * n * 4))))
    rng = np.random.default_rng(n)
    # values near 1 so chained symmetrize stays finite; scaleT uses
    # alpha=1.0000001-ish growth-free coeffs below
    arrs = [jnp.asarray(rng.standard_normal((n, n)), jnp.float32) * 0.01
            for _ in range(m)]
    nbytes = n * n * 4 * 2
    tile = pair_kernel_tile(n, n, np.dtype("float32"))
    rows = {"m_chains": m, "live_set_MB": round(2 * m * n * n * 4 / 1e6),
            "tile": tile}

    btile = pair_kernel_tile(n, n, np.dtype("bfloat16"))
    dtile = pair_kernel_tile(n, n, np.dtype("float32"), distinct=True)
    other = arrs[-1]
    variants = [
        ("stream", lambda x: x + 1.0),
        ("xla_sym", lambda x: (x + x.T) / 2.0),
        ("kernel_sym", lambda x: pair_axpby(x, scale_mode="div", scale=2.0,
                                            tile=tile)),
        ("xla_scaleT", lambda x: x.T * 0.999),
        ("kernel_scaleT", lambda x: pair_axpby(x, alpha=0.0, beta=0.999,
                                               tile=tile)),
    ]
    # distinct-buffer family (A + B.T): 3 passes both ways (2 reads + 1
    # write; GB/s below uses the 3-pass model); the kernel's pitch is
    # streaming-only reads vs XLA's transposed read of B. Both operands
    # evolve (rot_slope2) so nothing is loop-invariant.
    distinct_variants = [
        ("xla_distinct", lambda x, y: (x + y.T) * 0.5),
        ("kernel_distinct", lambda x, y: pair_axpby(
            x, y, alpha=1.0, beta=1.0, scale_mode="mul", scale=0.5,
            tile=dtile)),
    ]
    bf16_variants = [
        ("xla_sym_bf16", lambda x: (x + x.T) * jnp.bfloat16(0.5)),
        ("kernel_sym_bf16", lambda x: pair_axpby(x, scale_mode="mul",
                                                 scale=0.5, tile=btile)),
    ]
    for name, fn in variants:
        if only and name not in only:
            continue
        try:
            sec = rot_slope(fn, arrs)
            rows[name] = round(nbytes / sec / 1e9, 1)
        except Exception as e:
            rows[name] = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
        print(f"n={n} {name}: {rows[name]}", flush=True)
    for name, fn2 in distinct_variants:
        if only and name not in only:
            continue
        try:
            sec = rot_slope2(fn2, arrs)
            rows[name] = round(3 * n * n * 4 / sec / 1e9, 1)
        except Exception as e:
            rows[name] = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
        print(f"n={n} {name}: {rows[name]}", flush=True)
    barrs = [a.astype(jnp.bfloat16) for a in arrs]
    bbytes = n * n * 2 * 2
    for name, fn in bf16_variants:
        if only and name not in only:
            continue
        try:
            sec = rot_slope(fn, barrs)
            rows[name] = round(bbytes / sec / 1e9, 1)
        except Exception as e:
            rows[name] = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
        print(f"n={n} {name}: {rows[name]}", flush=True)
    out.setdefault(str(n), {}).update(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="8192,4000,4096,5120,6144")
    ap.add_argument("--variants", type=str, default=None,
                    help="comma-separated subset, e.g. stream,xla_sym,kernel_sym")
    args = ap.parse_args()
    only = set(args.variants.split(",")) if args.variants else None
    existing = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            existing = json.load(f)
    out = existing.setdefault(KEY, {})
    out.setdefault("comment", (
        "m-buffer rotation harness (live set > 400 MB defeats cross-step "
        "residency); slope k 32->160; GB/s = 2-pass model. 'stream' is the "
        "honesty litmus: ~650 GB/s means the harness measures HBM, "
        "7900 means it collapsed."
    ))
    for s in args.sizes.split(","):
        run_size(int(s), out, only=only)
        with open(RESULTS, "w") as f:
            json.dump(existing, f, indent=1)
        print(f"[saved after n={s}]", flush=True)


if __name__ == "__main__":
    main()
