"""Specialized Pallas kernels for symmetric-structure workloads.

:func:`symmetrize` computes ``B = (A + A') / 2`` — the reference's flagship
benchmark workload (`/root/reference/README.md:69-73`) — in a **two-pass**
HBM schedule: the naive lowering (XLA's, and the generic engine's) reads
``A`` twice (once straight, once transposed) and writes ``B``, i.e. three
HBM passes; this kernel walks only the upper-triangular tile pairs, reads
``A[i,j]`` and ``A[j,i]`` once each, and writes both output tiles from VMEM
— two passes total, a 1.5x traffic reduction that XLA cannot express
because one grid step must write two disjoint output blocks.

Mechanics (see the Pallas guide patterns): inputs/outputs stay in
``pltpu.ANY`` (HBM); a scalar-prefetched worklist of (i, j) tile pairs
drives a 1-D grid; the kernel DMAs its two input tiles to VMEM scratch,
forms ``S = (A[i,j] + A[j,i]^T) / 2``, and DMAs ``S`` to ``B[i,j]`` and
``S^T`` to ``B[j,i]``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import get_config

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = ["symmetrize"]


def _make_sym_kernel(nsteps: int, T: int, alpha: float = 0.5):
    """Double-buffered tile-pair kernel: step k prefetches step k+1's input
    tiles while computing, and output DMAs drain two steps behind. Diagonal
    pairs (i == j) skip the second (duplicate) output DMA — measured r3
    (benchmarks/results_tpu_r3.json): 325.9 vs 323.3 GB/s at 8192^2/f32,
    and the identical schedule as a pure pair-copy (no compute) runs
    325.0 GB/s, i.e. this kernel is at its DMA schedule's ceiling."""

    def kernel(ii_ref, jj_ref, a_hbm, out_hbm, s_in, s_out, in_sems, out_sems):
        # Pin index math to int32: under jax_enable_x64 the default int is
        # int64, which Mosaic cannot lower.
        step = jnp.asarray(pl.program_id(0), jnp.int32)
        slot = step % 2
        nxt = (step + 1) % 2

        def in_dmas(sl, st_):
            i = ii_ref[st_]
            j = jj_ref[st_]
            return (
                pltpu.make_async_copy(
                    a_hbm.at[pl.ds(i * T, T), pl.ds(j * T, T)],
                    s_in.at[sl, 0],
                    in_sems.at[sl, 0],
                ),
                pltpu.make_async_copy(
                    a_hbm.at[pl.ds(j * T, T), pl.ds(i * T, T)],
                    s_in.at[sl, 1],
                    in_sems.at[sl, 1],
                ),
            )

        def out_dmas(sl, st_):
            i = ii_ref[st_]
            j = jj_ref[st_]
            return (
                pltpu.make_async_copy(
                    s_out.at[sl, 0],
                    out_hbm.at[pl.ds(i * T, T), pl.ds(j * T, T)],
                    out_sems.at[sl, 0],
                ),
                pltpu.make_async_copy(
                    s_out.at[sl, 1],
                    out_hbm.at[pl.ds(j * T, T), pl.ds(i * T, T)],
                    out_sems.at[sl, 1],
                ),
            )

        @pl.when(step == 0)
        def _():
            for d in in_dmas(0, 0):
                d.start()

        @pl.when(step + 1 < nsteps)
        def _():
            for d in in_dmas(nxt, step + 1):
                d.start()

        for d in in_dmas(slot, step):
            d.wait()

        # Guard out-slot reuse: the DMAs launched two steps ago from this
        # slot must have drained before we overwrite s_out[slot]. Diagonal
        # pairs started only the first write, so only wait the second when
        # it was actually issued.
        def wait_out_pair(sl, st_):
            i_ = ii_ref[st_]
            j_ = jj_ref[st_]
            d0, d1 = out_dmas(sl, st_)
            d0.wait()

            @pl.when(i_ != j_)
            def _():
                d1.wait()

        @pl.when(step >= 2)
        def _():
            wait_out_pair(slot, step - 2)

        S = (s_in[slot, 0] + s_in[slot, 1].T) * alpha
        s_out[slot, 0] = S
        s_out[slot, 1] = S.T
        d0, d1 = out_dmas(slot, step)
        d0.start()

        @pl.when(ii_ref[step] != jj_ref[step])
        def _():
            d1.start()

        @pl.when(step == nsteps - 1)
        def _():
            wait_out_pair(slot, step)
            if nsteps >= 2:
                @pl.when(step >= 1)
                def _():
                    wait_out_pair(nxt, step - 1)

    return kernel


@functools.partial(jax.jit, static_argnames=("tile", "alpha"))
def symmetrize(a: jax.Array, tile: int = 512, alpha: float = 0.5) -> jax.Array:
    """``(a + a.T) * alpha`` via the two-pass tile-pair kernel.

    Requires a square f32/bf16 matrix with side divisible by ``tile``
    (falls back to the plain fused expression otherwise). ``alpha`` is
    static (a Python float) — the lazy-expression pattern dispatch extracts
    it from literals like ``(v + v.T) * 0.5`` / ``... / 2``."""
    n, m = a.shape
    cfg = get_config()
    interpret = cfg.interpret or jax.default_backend() != "tpu"
    ok = (
        _HAS_PALLAS
        and cfg.use_pallas
        and n == m
        and n % tile == 0
        and a.dtype in (jnp.float32, jnp.bfloat16)
    )
    if not ok:
        return (a + a.T) * alpha

    nb = n // tile
    pairs = [(i, j) for i in range(nb) for j in range(i, nb)]
    ii = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
    jj = jnp.asarray(np.array([p[1] for p in pairs], np.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, tile, tile), a.dtype),  # in slots x {A_ij, A_ji}
            pltpu.VMEM((2, 2, tile, tile), a.dtype),  # out slots x {S, S^T}
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        _make_sym_kernel(len(pairs), tile, alpha),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n), a.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=16 * 1024 * 1024,
        ),
    )(ii, jj, a)
