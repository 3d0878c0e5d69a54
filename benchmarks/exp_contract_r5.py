"""Round-5 contraction evidence (VERDICT r4 missing #1).

Two artifacts for the MERA/tensor-contraction family
(`/root/reference/benchmarks/benchtests.jl:70-133`):

1. **HLO check**: ``st.contract`` with a LAZY-transposed / conj operand
   compiles to a dot fusion with NO materialized transpose copy — the
   lazy-view recipe (slice+reshape+transpose metadata) must fuse into the
   ``dot_general`` operand, not spend an HBM pass. Asserted on the COMPILED
   TPU HLO: no top-level ``transpose`` / ``copy`` instruction over the
   operand shape outside fusions.

2. **Timing parity**: contract on the lazy-transposed view vs einsum on the
   pre-materialized dense transpose — same wall time = the lazy layout is
   free (recorded; the strided-vs-jnp MERA rows live in sweeps.py
   ``contraction_mera`` at bond dims 128/192, above the 20 us tunnel floor).

Run: timeout 1500 python benchmarks/exp_contract_r5.py
Merges into benchmarks/results_tpu_r5.json under "contraction_evidence".
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import strided_tpu as st  # noqa: E402
from strided_tpu.utils.timing import time_slope  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_tpu_r5.json")


def hlo_no_materialized_transpose(d=1024):
    """Compile contract('ab,bc->ac', A.T(lazy), B) and inspect entry-level
    instructions of the optimized HLO."""
    a = jnp.zeros((d, d), jnp.float32)
    b = jnp.zeros((d, d), jnp.float32)

    def f(a_, b_):
        vT = st.transpose(st.strided(a_))  # lazy: metadata only
        return st.contract("ab,bc->ac", vT, st.strided(b_))

    txt = jax.jit(f).lower(a, b).compile().as_text()
    # entry-computation lines only (fusion bodies are indented under their
    # own computation definitions; a materialized transpose would be a
    # dedicated top-level fusion/copy writing an operand-sized buffer)
    entry = txt.split("ENTRY")[-1]
    bad = [
        ln for ln in entry.splitlines()
        if re.search(r"=\s*f32\[\d+,\d+\]\S*\s+(transpose|copy)\(", ln)
    ]
    n_fusions = len(re.findall(r"fusion\(", entry))
    return {
        "materialized_transpose_or_copy_lines": bad,
        "ok": not bad,
        "entry_fusions": n_fusions,
    }


def timing_parity(d=2048):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((d, d)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((d, d)), jnp.float32)
    s = 1.0 / np.sqrt(d)

    def lazy(x):
        return st.contract("ab,bc->ac", st.transpose(st.strided(x)),
                           st.strided(b)) * s

    def dense(x):
        from jax import lax
        return jnp.einsum("ab,bc->ac", x.T, b,
                          precision=lax.Precision.HIGHEST) * s

    t_lazy = time_slope(lazy, a, k1=32, k2=160)
    t_dense = time_slope(dense, a, k1=32, k2=160)
    return {"lazy_us": round(t_lazy * 1e6, 1),
            "dense_us": round(t_dense * 1e6, 1),
            "ratio": round(t_lazy / t_dense, 3)}


def main():
    existing = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            existing = json.load(f)
    out = existing.setdefault("contraction_evidence", {})
    res = hlo_no_materialized_transpose()
    out["hlo_check"] = res
    print("HLO check:", res, flush=True)
    out["lazy_vs_dense_transpose_2048"] = timing_parity()
    print("timing:", out["lazy_vs_dense_transpose_2048"], flush=True)
    with open(RESULTS, "w") as f:
        json.dump(existing, f, indent=1)


if __name__ == "__main__":
    main()
