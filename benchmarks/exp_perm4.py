"""Experiment: rank-4 reversal permute kernels (64^4 f32).

Hypothesis: the generic executor's per-axis BlockSpecs give 64-wide minor
dims (half the 128 lanes wasted). Grouping a partial axis with trailing
fully-tiled axes makes every DMA full-lane. Measures several groupings.
"""
import os, sys, time, json, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strided_tpu.utils.timing import time_slope_checked

D = 64
NBYTES = 2 * D**4 * 4


def v_grouped_j2(b2):
    """Grid over j2 only. in phys (j3,j2,(j1 j0)) blocks (64,b2,4096);
    out phys (j0,j1,(j2 j3)) blocks (64,64,b2*64)."""

    def kernel(i_ref, o_ref):
        x = i_ref[...]                       # (64, b2, 4096)
        x = x.reshape(D, b2, D, D)           # (j3, j2, j1, j0)
        y = jnp.transpose(x, (3, 2, 1, 0))   # (j0, j1, j2, j3)
        o_ref[...] = y.reshape(D, D, b2 * D)

    def run(x):
        xin = x.reshape(D, D, D * D)
        out = pl.pallas_call(
            kernel,
            grid=(D // b2,),
            in_specs=[pl.BlockSpec((D, b2, D * D), lambda g: (0, g, 0))],
            out_specs=pl.BlockSpec((D, D, b2 * D), lambda g: (0, 0, g)),
            out_shape=jax.ShapeDtypeStruct((D, D, D * D), x.dtype),
            # output blocks are disjoint per grid step: parallel semantics
            # let Mosaic reorder/overlap (ADVICE r2 item 3)
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(xin)
        return out.reshape(x.shape)

    return run


def v_grouped_j1j2(b1, b2):
    """Grid over (j1, j2). in blocks (64, b2, b1*64) @ (0, g2, g1);
    out blocks (64, b1, b2*64) @ (0, g1, g2)."""

    def kernel(i_ref, o_ref):
        x = i_ref[...]                       # (64, b2, b1*64)
        x = x.reshape(D, b2, b1, D)          # (j3, j2, j1, j0)
        y = jnp.transpose(x, (3, 2, 1, 0))   # (j0, j1, j2, j3)
        o_ref[...] = y.reshape(D, b1, b2 * D)

    def run(x):
        xin = x.reshape(D, D, D * D)
        out = pl.pallas_call(
            kernel,
            grid=(D // b1, D // b2),
            in_specs=[pl.BlockSpec((D, b2, b1 * D), lambda g1, g2: (0, g2, g1))],
            out_specs=pl.BlockSpec((D, b1, b2 * D), lambda g1, g2: (0, g1, g2)),
            out_shape=jax.ShapeDtypeStruct((D, D, D * D), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(xin)
        return out.reshape(x.shape)

    return run


def v_2d_transpose_ref(tile):
    """Mosaic 2-D transpose ceiling: plain 4096^2 transpose, (tile,tile)."""
    M = D * D

    def kernel(i_ref, o_ref):
        o_ref[...] = jnp.transpose(i_ref[...], (1, 0))

    def run(x):
        xin = x.reshape(M, M)
        out = pl.pallas_call(
            kernel,
            grid=(M // tile, M // tile),
            in_specs=[pl.BlockSpec((tile, tile), lambda i, j: (j, i))],
            out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, M), x.dtype),
        )(xin)
        return out.reshape(x.shape)

    return run


def v_plain4d(b3, b2):
    """No reshapes at all: 4-D blocks, pure jnp.transpose reversal in-kernel.
    in (j3,j2,j1,j0) blocks (b3,b2,64,64); out (j0,j1,j2,j3) blocks
    (64,64,b2,b3)."""

    def kernel(i_ref, o_ref):
        o_ref[...] = jnp.transpose(i_ref[...], (3, 2, 1, 0))

    def run(x):
        out = pl.pallas_call(
            kernel,
            grid=(D // b3, D // b2),
            in_specs=[pl.BlockSpec((b3, b2, D, D), lambda g3, g2: (g3, g2, 0, 0))],
            out_specs=pl.BlockSpec((D, D, b2, b3), lambda g3, g2: (0, 0, g2, g3)),
            out_shape=jax.ShapeDtypeStruct((D,) * 4, x.dtype),
        )(x)
        return out

    return run


def v_mxu(b3, b2):
    """Move j3 into lanes via an MXU identity contraction (exact in f32
    HIGHEST), then a lane-preserving leading-dim permute."""

    def kernel(i_ref, o_ref):
        x = i_ref[...]  # (b3, b2, 64, 64) = (j3, j2, j1, j0)
        r = jax.lax.broadcasted_iota(jnp.int32, (b3, b3), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (b3, b3), 1)
        ident = (r == c).astype(x.dtype)
        # contract local j3 against I -> (j2, j1, j0, j3)
        y = jax.lax.dot_general(
            x,
            ident,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # (j2, j1, j0, j3) -> (j0, j1, j2, j3): lanes (j3) untouched
        o_ref[...] = jnp.transpose(y, (2, 1, 0, 3))

    def run(x):
        out = pl.pallas_call(
            kernel,
            grid=(D // b3, D // b2),
            in_specs=[pl.BlockSpec((b3, b2, D, D), lambda g3, g2: (g3, g2, 0, 0))],
            out_specs=pl.BlockSpec((D, D, b2, b3), lambda g3, g2: (0, 0, g2, g3)),
            out_shape=jax.ShapeDtypeStruct((D,) * 4, x.dtype),
        )(x)
        return out

    return run


def v_dma4d(c2):
    """Symmetrize-style manual-DMA double-buffered kernel. Step k owns a
    j2-run of c2: DMA in A[:, run, :, :] (16KB contiguous runs), reversal
    on the VMEM value, DMA out to OUT[:, :, run, :]."""
    nsteps = D // c2

    def kernel_fixed(a_hbm, out_hbm, s_in, s_out, in_sems, out_sems):
        # same as kernel but writes into the slot of s_out
        step = pl.program_id(0)
        slot = step % 2
        nxt = (step + 1) % 2

        def in_dma(sl, st_):
            return pltpu.make_async_copy(
                a_hbm.at[:, pl.ds(st_ * c2, c2), :, :],
                s_in.at[sl],
                in_sems.at[sl],
            )

        def out_dma(sl, st_):
            return pltpu.make_async_copy(
                s_out.at[sl],
                out_hbm.at[:, :, pl.ds(st_ * c2, c2), :],
                out_sems.at[sl],
            )

        @pl.when(step == 0)
        def _():
            in_dma(0, 0).start()

        @pl.when(step + 1 < nsteps)
        def _():
            in_dma(nxt, step + 1).start()

        in_dma(slot, step).wait()

        @pl.when(step >= 2)
        def _():
            out_dma(slot, step - 2).wait()

        s_out[slot] = jnp.transpose(s_in[slot], (3, 2, 1, 0))
        out_dma(slot, step).start()

        @pl.when(step == nsteps - 1)
        def _():
            out_dma(slot, step).wait()
            @pl.when(step >= 1)
            def _():
                out_dma(nxt, step - 1).wait()

    def run(x):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, D, c2, D, D), x.dtype),
                pltpu.VMEM((2, D, D, c2, D), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel_fixed,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((D,) * 4, x.dtype),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x)

    return run


VARIANTS = {
    "grouped_j2_b4": v_grouped_j2(4),
    "grouped_j2_b8": v_grouped_j2(8),
    "grouped_j1j2_8_8": v_grouped_j1j2(8, 8),
    "grouped_j1j2_16_16": v_grouped_j1j2(16, 16),
    "plain4d_8_8": v_plain4d(8, 8),
    "plain4d_16_16": v_plain4d(16, 16),
    "plain4d_8_64": v_plain4d(8, 64),
    "plain4d_64_8": v_plain4d(64, 8),
    "mxu_64_8": v_mxu(64, 8),
    "t2d_256": v_2d_transpose_ref(256),
    "t2d_512": v_2d_transpose_ref(512),
    "dma4d_c4": v_dma4d(4),
    "dma4d_c8": v_dma4d(8),
    "dma4d_c16": v_dma4d(16),
}


def main():
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(VARIANTS)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((D,) * 4), jnp.float32)
    # correctness oracle
    want = np.transpose(np.asarray(x), (3, 2, 1, 0))
    for name in names:
        fn = VARIANTS[name]
        t0 = time.time()
        try:
            got = jax.jit(fn)(x)
            got.block_until_ready()
            if not name.startswith("t2d"):
                ok = bool(np.array_equal(np.asarray(got), want))
            else:
                ok = bool(
                    np.array_equal(
                        np.asarray(got).reshape(4096, 4096),
                        np.asarray(x).reshape(4096, 4096).T,
                    )
                )
            # slope timing (r3): time_looped carries the flat ~1 ms/dispatch
            # tunnel overhead into every step (k=24 biased a 0.2 ms kernel
            # by 5x); the slope of two loop lengths cancels it exactly.
            s, note = time_slope_checked(fn, x)
            print(
                json.dumps(
                    {
                        "v": name,
                        "gbs": NBYTES / s / 1e9,
                        "ok": ok,
                        "note": note,
                        "compile_s": round(time.time() - t0, 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"v": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
