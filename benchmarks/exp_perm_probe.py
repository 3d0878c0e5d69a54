"""Round-3 probe: which in-kernel rank-4 reversal formulations does Mosaic
compile on the real chip, and how fast are they?

Context (committed to results_tpu_r3.json): the 64^4 reversal — the
reference's flagship permute (README row 4) — currently lowers to XLA at
~150 GB/s. Direct rank-4 ``jnp.transpose`` inside a Pallas kernel crashes
the Mosaic compile helper, so this probes decompositions into (batched) 2-D
transposes and reshapes, plus whether the generic tile engine's rank-4 plan
compiles on hardware at a raised VMEM allowance.
"""
import os, sys, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strided_tpu.utils.timing import time_slope_checked

D = 64
NBYTES = 2 * D**4 * 4


def _call3(kernel, b3, b2, x):
    """Grid over (j3-blocks, j2-blocks); in block (b3,b2,64,64) at (g3,g2);
    out block (64,64,b2,b3) at (.., g2,g3)."""
    return pl.pallas_call(
        kernel,
        grid=(D // b3, D // b2),
        in_specs=[pl.BlockSpec((b3, b2, D, D), lambda g3, g2: (g3, g2, 0, 0))],
        out_specs=pl.BlockSpec((D, D, b2, b3), lambda g3, g2: (0, 0, g2, g3)),
        out_shape=jax.ShapeDtypeStruct((D,) * 4, x.dtype),
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(x)


def v_direct(b3, b2):
    def kernel(i_ref, o_ref):
        o_ref[...] = jnp.transpose(i_ref[...], (3, 2, 1, 0))

    return lambda x: _call3(kernel, b3, b2, x)


def v_3stage(b3, b2):
    """Reversal as three (batched) 2-D transposes:
    (j3,j2,j1,j0) -reshape+T2-> (j0, j3,j2,j1) -batchT-> (j0, j2,j1, j3)
    -sublaneT-> (j0, j1, j2, j3)."""

    def kernel(i_ref, o_ref):
        x = i_ref[...]                                # (b3, b2, 64, 64)
        x = x.reshape(b3 * b2 * D, D)
        x = jnp.transpose(x, (1, 0))                  # (j0, j3 j2 j1)
        x = x.reshape(D, b3, b2 * D)
        x = jnp.transpose(x, (0, 2, 1))               # (j0, j2 j1, j3)
        x = x.reshape(D, b2, D, b3)                   # (j0, j2, j1, j3)
        x = jnp.transpose(x, (0, 2, 1, 3))            # (j0, j1, j2, j3)
        o_ref[...] = x

    return lambda x: _call3(kernel, b3, b2, x)


def v_2stage_batch(b3, b2):
    """(j3,j2,j1,j0) -T2 of (j3 j2, j1 j0)-> ((j1 j0),(j3 j2)) then fix both
    digit pairs with lane-preserving swaps."""

    def kernel(i_ref, o_ref):
        x = i_ref[...]                                # (b3, b2, 64, 64)
        x = x.reshape(b3 * b2, D * D)
        x = jnp.transpose(x, (1, 0))                  # (j1 j0, j3 j2)
        x = x.reshape(D, D, b3, b2)                   # (j1, j0, j3, j2)
        x = jnp.transpose(x, (1, 0, 3, 2))            # (j0, j1, j2, j3)
        o_ref[...] = x

    return lambda x: _call3(kernel, b3, b2, x)


def v_loop_rank3(b3, b2):
    """Static python loop over b3; body is a rank-3 reversal."""

    def kernel(i_ref, o_ref):
        for k in range(b3):
            x = i_ref[k]                              # (b2, 64, 64)
            o_ref[:, :, :, k] = jnp.transpose(x, (2, 1, 0))

    return lambda x: _call3(kernel, b3, b2, x)


def _call_m(kernel, k2, b1):
    """Merged-out geometry: grid (j1-blocks, j2-blocks); in block
    (64, k2, b1, 64) = (j3, j2, j1, j0) at (0, g2, g1, 0); OUT is viewed as
    (j0, j1, (j2 j3)) = (64, 64, 4096) with block (64, b1, k2*64) at
    (0, g1, g2) — trailing dims (b1, k2*64) satisfy the (8,128) rule with
    small VMEM (in+out = 2 x 16KB*k2*b1)."""

    def run(x):
        out = pl.pallas_call(
            kernel,
            grid=(D // b1, D // k2),
            in_specs=[pl.BlockSpec((D, k2, b1, D), lambda g1, g2: (0, g2, g1, 0))],
            out_specs=pl.BlockSpec((D, b1, k2 * D), lambda g1, g2: (0, g1, g2)),
            out_shape=jax.ShapeDtypeStruct((D, D, D * D), x.dtype),
            interpret=jax.default_backend() != "tpu",
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(x)
        return out.reshape((D,) * 4)

    return run


def v_direct_m(k2, b1):
    def kernel(i_ref, o_ref):
        x = i_ref[...]                                # (64, k2, b1, 64)
        y = jnp.transpose(x, (3, 2, 1, 0))            # (j0, j1, j2, j3)
        o_ref[...] = y.reshape(D, b1, k2 * D)

    return _call_m(kernel, k2, b1)


def v_2stage_m(k2, b1):
    def kernel(i_ref, o_ref):
        x = i_ref[...]                                # (j3, j2, j1, j0)
        x = x.reshape(D * k2, b1 * D)
        x = jnp.transpose(x, (1, 0))                  # ((j1 j0), (j3 j2))
        x = x.reshape(b1, D, D, k2)                   # (j1, j0, j3, j2)
        x = jnp.transpose(x, (1, 0, 3, 2))            # (j0, j1, j2, j3)
        o_ref[...] = x.reshape(D, b1, k2 * D)

    return _call_m(kernel, k2, b1)


def v_3stage_m(k2, b1):
    def kernel(i_ref, o_ref):
        x = i_ref[...]                                # (j3, j2, j1, j0)
        x = x.reshape(D * k2 * b1, D)
        x = jnp.transpose(x, (1, 0))                  # (j0, (j3 j2 j1))
        x = x.reshape(D, D, k2 * b1)                  # (j0, j3, (j2 j1))
        x = jnp.transpose(x, (0, 2, 1))               # (j0, (j2 j1), j3)
        x = x.reshape(D, k2, b1, D)                   # (j0, j2, j1, j3)
        x = jnp.transpose(x, (0, 2, 1, 3))            # (j0, j1, j2, j3)
        o_ref[...] = x.reshape(D, b1, k2 * D)

    return _call_m(kernel, k2, b1)


def engine_rank4(x):
    import strided_tpu as st
    from strided_tpu.core.mapreduce import permutedims_into

    out = st.strided(jnp.zeros_like(x))
    return permutedims_into(out, st.strided(x), (3, 2, 1, 0)).parent.reshape(x.shape)


def main():
    V = {
        "direct_8_8": v_direct(8, 8),
        "3stage_8_8": v_3stage(8, 8),
        "3stage_16_16": v_3stage(16, 16),
        "3stage_8_64": v_3stage(8, 64),
        "3stage_64_8": v_3stage(64, 8),
        "2stage_8_8": v_2stage_batch(8, 8),
        "2stage_16_16": v_2stage_batch(16, 16),
        "loop_rank3_8_8": v_loop_rank3(8, 8),
        # merged-out geometry (small legal blocks)
        "direct_m_4_8": v_direct_m(4, 8),
        "direct_m_8_16": v_direct_m(8, 16),
        "2stage_m_4_8": v_2stage_m(4, 8),
        "2stage_m_8_16": v_2stage_m(8, 16),
        "2stage_m_16_32": v_2stage_m(16, 32),
        "3stage_m_4_8": v_3stage_m(4, 8),
        "3stage_m_8_16": v_3stage_m(8, 16),
        "3stage_m_16_32": v_3stage_m(16, 32),
    }
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(V)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((D,) * 4), jnp.float32)

    # Device-side check (64 MB host fetch over the tunnel would take ~2 min
    # per variant): max |got - reversal| computed on-chip, one scalar out.
    @jax.jit
    def _maxdiff(got, x):
        return jnp.max(jnp.abs(got - jnp.transpose(x, (3, 2, 1, 0))))

    def check(got):
        return float(_maxdiff(got, x)) == 0.0
    for name in names:
        if name == "engine":
            from strided_tpu.config import set_config
            from strided_tpu.core import executor_pallas
            set_config(pallas_budget_divisor=2)
            executor_pallas.LAST_PLAN.clear()
            try:
                got = jax.jit(engine_rank4)(x)
                got.block_until_ready()
                ok = check(got)
                s, note = time_slope_checked(engine_rank4, x)
                print(json.dumps({
                    "v": "engine_div2", "gbs": NBYTES / s / 1e9, "ok": ok,
                    "plan": {k: str(v) for k, v in executor_pallas.LAST_PLAN.items()},
                    "note": note,
                }), flush=True)
            except Exception as e:
                print(json.dumps({"v": "engine_div2", "error": repr(e)[:160]}),
                      flush=True)
            continue
        fn = V[name]
        t0 = time.time()
        try:
            got = jax.jit(fn)(x)
            got.block_until_ready()
            ok = check(got)
            s, note = time_slope_checked(fn, x)
            print(json.dumps({
                "v": name, "gbs": NBYTES / s / 1e9, "ok": ok, "note": note,
                "compile_s": round(time.time() - t0, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"v": name, "error": repr(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
