"""Round-5 re-audit of the generic Pallas-MAP gate with the honest harness.

``pallas_map_min_elements`` (= 1<<25) routes scrambled (transposed-read)
pure maps to the tile executor above ~5793^2, justified by r4 numbers
measured with the residency-confounded chained harness (tiles 339 vs "XLA
299" at 8192^2 scale-transpose). The r5 interleaved-chain harness showed
XLA arms were under-/over-read there, so this re-measures both sides of
the gate honestly (the tile executor is an opaque pallas_call — honest in
both harnesses; the XLA arm is the one that needed fixing).

Workload: ``out = 0.999 * A.T`` through the PUBLIC engine
(``scale_into`` -> generic fused map; config toggles force tile vs XLA
lowering), f32, sizes straddling the gate.

Run: timeout 2500 python benchmarks/exp_mapgate_r5.py
Merges into benchmarks/results_tpu_r5.json under "map_gate_audit".
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import strided_tpu as st  # noqa: E402
from strided_tpu.config import set_config, get_config  # noqa: E402
from strided_tpu.utils.timing import time_interleaved  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_tpu_r5.json")
TARGET_BYTES = 420e6


def main():
    existing = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            existing = json.load(f)
    out = existing.setdefault("map_gate_audit", {})
    out.setdefault("comment", (
        "scale-transpose 0.999*A.T through the public engine; interleaved-"
        "chain harness (collapse-proof); GB/s = 2-pass model. 'tiles' "
        "forces the Pallas map executor, 'xla' forces plain lowering."
    ))
    old = get_config()
    try:
        for n in (6144, 8192):
            m = max(2, int(np.ceil(TARGET_BYTES / (2 * n * n * 4))))
            rng = np.random.default_rng(n)
            arrs = [jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
                    for _ in range(m)]
            nbytes = n * n * 4 * 2

            def eng(x):
                dst = st.strided(jnp.zeros((n, n), jnp.float32))
                return st.to_array(
                    st.scale_into(dst, 0.999, st.transpose(st.strided(x)))
                )

            rows = {"m_chains": m}
            for name, overrides in (
                ("tiles", dict(use_pallas=True, pallas_map_min_elements=1024,
                               min_pallas_elements=1024)),
                ("xla", dict(pallas_map_min_elements=1 << 60)),
            ):
                set_config(**overrides)
                try:
                    sec = time_interleaved(eng, arrs)
                    rows[name] = round(nbytes / sec / 1e9, 1)
                except Exception as e:
                    rows[name] = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
                finally:
                    set_config(**{k: getattr(old, k)
                                  for k in old.__dataclass_fields__})
                print(f"n={n} {name}: {rows[name]}", flush=True)
            out[str(n)] = rows
            with open(RESULTS, "w") as f:
                json.dump(existing, f, indent=1)
    finally:
        set_config(**{k: getattr(old, k) for k in old.__dataclass_fields__})


if __name__ == "__main__":
    main()
