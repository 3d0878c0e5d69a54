"""Round-5 mul-overhead diagnosis (VERDICT r4 weak #1).

Apples-to-apples r4 sweep showed ``st.mul`` at 112.3 us vs jnp's 36.7 us at
d=1024 (both HIGHEST precision), parity at 2048/4096 — a fixed ~75 us
overhead the record never explained. Candidates, isolated here:

- ``jnp``            — x.T @ x, HIGHEST (the oracle)
- ``flat_reshape``   — same matmul but operands round-tripped through the
                       engine's flat-parent representation
                       (``x.reshape(-1).reshape(d, d)``): is the 1-D<->2-D
                       reshape a hidden relayout copy on TPU?
- ``engine``         — the full ``st.mul`` path (zeros alloc + materialize
                       + dot_general + scatter_into + to_array)
- ``engine_noalloc`` — st.mul with C allocated ONCE outside the timed loop
                       (is the per-call ``jnp.zeros`` the cost?)

All slope-timed (k 32->160 — d=1024 steps are ~40-110 us, the small-size
rule applies). Chained via ``y = f(x); x' = y * s`` with s sized to keep
iterates stationary.

Run: timeout 1500 python benchmarks/exp_mul_r5.py
Merges into benchmarks/results_tpu_r5.json under "mul_overhead".
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import strided_tpu as st  # noqa: E402
from strided_tpu.utils.timing import time_slope  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_tpu_r5.json")


def main():
    existing = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            existing = json.load(f)
    out = existing.setdefault("mul_overhead", {})
    out.setdefault("comment", (
        "x.T@x HIGHEST f32, slope k 32->160, us/step; iterates rescaled "
        "by 1/sqrt(d) to stay stationary"
    ))

    for d in (1024, 2048):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((d, d)), jnp.float32)
        s = 1.0 / np.sqrt(d)

        def chain(mm):
            return lambda x: mm(x) * s

        variants = {}
        variants["jnp"] = chain(
            lambda x: jnp.matmul(x.T, x, precision=lax.Precision.HIGHEST)
        )
        variants["flat_reshape"] = chain(
            lambda x: jnp.matmul(
                x.reshape(-1).reshape(d, d).T,
                x.reshape(-1).reshape(d, d),
                precision=lax.Precision.HIGHEST,
            )
        )

        def eng(x):
            C = st.strided(jnp.zeros((d, d), jnp.float32))
            return st.to_array(
                st.mul(C, st.transpose(st.strided(x)), st.strided(x))
            )

        variants["engine"] = chain(eng)

        C_pre = st.strided(jnp.zeros((d, d), jnp.float32))

        def eng_noalloc(x):
            return st.to_array(
                st.mul(C_pre, st.transpose(st.strided(x)), st.strided(x))
            )

        variants["engine_noalloc"] = chain(eng_noalloc)

        for name, fn in variants.items():
            try:
                sec = time_slope(fn, a, k1=32, k2=160)
                out[f"{name}_{d}"] = round(sec * 1e6, 1)
            except Exception as e:
                out[f"{name}_{d}"] = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
            print(f"d={d} {name}: {out[f'{name}_{d}']} us", flush=True)
        with open(RESULTS, "w") as f:
            json.dump(existing, f, indent=1)


if __name__ == "__main__":
    main()
