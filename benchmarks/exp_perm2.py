"""Round-3 probe #2: rank-4 reversal with the LEGAL middle-dims block geometry.

exp_perm_probe.py showed every geometry that blocks the minor dims is either
illegal (the (8,128) last-two-dims rule) or crashes the Mosaic compile helper
(in-kernel rank-4 ``jnp.transpose`` / cross-lane reshapes). The geometry probed
here blocks the two MIDDLE dims (b, c) of ``x[a,b,c,d] -> y[d,c,b,a]``:

- in  block ``(64, Bb, Cc, 64)`` at ``(0, gb, gc, 0)`` — last two dims
  ``(Cc, 64)``: ``Cc % 8 == 0`` and minor == full dim -> legal;
- out block ``(64, Cc, Bb, 64)`` at ``(0, gc, gb, 0)`` — same rule;
- HBM contiguity: blocking dim c with d kept full leaves contiguous runs of
  ``Cc*64*4`` bytes (2 KB at Cc=8) on the input, and blocking b with a full
  leaves ``Bb*64*4``-byte runs on the output — the same 2 KB-row DMA geometry
  as the 512-tile 2-D transpose (326 GB/s measured);
- in-kernel compute avoids rank-4 transposes: either a static loop of
  ``Bb*Cc`` plain (64,64) 2-D transposes, or reshape/transpose chains that
  only ever swap two dims.

Also measures the honest XLA baseline and the production engine path (which
emits an in-kernel rank-4 transpose — probing whether that compiles at all
on hardware; off-TPU tests run interpret mode and cannot see this).

Usage: python benchmarks/exp_perm2.py [variant,names]
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


def _call_mid(kernel, bb, cc):
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(D // bb, D // cc),
            in_specs=[pl.BlockSpec((D, bb, cc, D), lambda gb, gc: (0, gb, gc, 0))],
            out_specs=pl.BlockSpec((D, cc, bb, D), lambda gb, gc: (0, gc, gb, 0)),
            out_shape=jax.ShapeDtypeStruct((D,) * 4, x.dtype),
            interpret=jax.default_backend() != "tpu",
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(x)

    return run


def v_loop2d(bb, cc):
    """out[:, c, b, :] = in[:, b, c, :].T — Bb*Cc unrolled (64,64) transposes."""

    def kernel(i_ref, o_ref):
        for b in range(bb):
            for c in range(cc):
                o_ref[:, c, b, :] = jnp.transpose(i_ref[:, b, c, :], (1, 0))

    return _call_mid(kernel, bb, cc)


def v_chain(bb, cc):
    """Reshape/2-swap chain: (a,(b c),d) -T-> (d,(b c),a)? No — do the big
    minor<->major transpose once, then fix b/c with an adjacent swap."""

    def kernel(i_ref, o_ref):
        x = i_ref[...]                       # (64, bb, cc, 64) = (a,b,c,d)
        x = x.reshape(D * bb * cc, D)
        x = jnp.transpose(x, (1, 0))         # (d, (a b c))
        x = x.reshape(D, D, bb, cc)          # (d, a, b, c)
        x = jnp.transpose(x, (0, 3, 2, 1))   # (d, c, b, a) — rank-4 rev of tail
        o_ref[...] = x

    return _call_mid(kernel, bb, cc)


def v_chain3(bb, cc):
    """Same but the tail reversal is done as two adjacent swaps of rank<=3
    shapes (never a rank-4 permutation with minor-dim movement)."""

    def kernel(i_ref, o_ref):
        x = i_ref[...]                       # (a, b, c, d)
        x = x.reshape(D * bb * cc, D)
        x = jnp.transpose(x, (1, 0))         # (d, (a b c))
        x = x.reshape(D, D * bb, cc)
        x = jnp.transpose(x, (0, 2, 1))      # (d, c, (a b))
        x = x.reshape(D, cc, D, bb)
        x = jnp.transpose(x, (0, 1, 3, 2))   # (d, c, b, a)
        o_ref[...] = x

    return _call_mid(kernel, bb, cc)


def v_loop2d_nocompute(bb, cc):
    """Same block geometry and slice traffic but NO transposes (copies wrong
    data): isolates whether the ~160 GB/s is DMA-bound or compute-bound."""

    def kernel(i_ref, o_ref):
        for b in range(bb):
            for c in range(cc):
                o_ref[:, c, b, :] = i_ref[:, b, c, :]

    return _call_mid(kernel, bb, cc)


def v_mxu(bb, cc, precision="highest"):
    """Minor-digit move via the MXU: ``dot_general(x, I_64)`` contracting the
    'a' dim is a batched transpose (out[b,c,d,a] = x[a,b,c,d]); the remaining
    (b,c,d)->(d,c,b) is a minor-dim-preserving permute. At HIGHEST precision
    x @ I is bit-exact for f32: the bf16x6 splitting decomposes each f32
    exactly into three non-overlapping bf16 parts and I is exact in bf16."""
    from jax import lax

    def kernel(i_ref, o_ref):
        x = i_ref[...]                       # (64, bb, cc, 64) = (a,b,c,d)
        eye = jnp.eye(D, dtype=x.dtype)
        with jax.default_matmul_precision(precision):
            y = lax.dot_general(x, eye, (((0,), (0,)), ((), ())))
        # y[b, c, d, a]; fix leading digits (minor dim untouched)
        o_ref[...] = jnp.transpose(y, (2, 1, 0, 3))

    return _call_mid(kernel, bb, cc)


def v_xla(x):
    return jnp.transpose(x, (3, 2, 1, 0)) + jnp.float32(0.0)


def engine_rank4(x):
    import strided_tpu as st
    from strided_tpu.core.mapreduce import permutedims_into

    out = st.strided(jnp.zeros_like(x))
    return permutedims_into(out, st.strided(x), (3, 2, 1, 0)).parent.reshape(x.shape)


def main():
    V = {
        "xla": v_xla,
        "loop2d_8_8": v_loop2d(8, 8),
        "loop2d_16_8": v_loop2d(16, 8),
        "loop2d_8_16": v_loop2d(8, 16),
        "loop2d_16_16": v_loop2d(16, 16),
        "chain_8_8": v_chain(8, 8),
        "chain3_8_8": v_chain3(8, 8),
        "chain3_16_16": v_chain3(16, 16),
        "nocompute_8_8": v_loop2d_nocompute(8, 8),
        "mxu_8_8": v_mxu(8, 8),
        "mxu_16_8": v_mxu(16, 8),
        "mxu_8_16": v_mxu(8, 16),
        "mxu_default_8_8": v_mxu(8, 8, precision="default"),
    }
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(V) + ["engine"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((D,) * 4), jnp.float32)

    @jax.jit
    def _maxdiff(got, x):
        return jnp.max(jnp.abs(got - jnp.transpose(x, (3, 2, 1, 0))))

    def check(got):
        return float(_maxdiff(got, x)) == 0.0

    for name in names:
        t0 = time.time()
        try:
            if name == "engine":
                from strided_tpu.core import executor_pallas
                executor_pallas.LAST_PLAN.clear()
                fn = engine_rank4
            else:
                fn = V[name]
            got = jax.jit(fn)(x)
            got.block_until_ready()
            ok = check(got)
            s, note = time_slope_checked(fn, x)
            rec = {
                "v": name, "gbs": NBYTES / s / 1e9, "ok": ok, "note": note,
                "compile_s": round(time.time() - t0, 1),
            }
            if name == "engine":
                from strided_tpu.core import executor_pallas
                rec["pallas"] = bool(executor_pallas.LAST_PLAN)
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(json.dumps({"v": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
