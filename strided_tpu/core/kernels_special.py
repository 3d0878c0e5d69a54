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


def _sym_kernel(ii_ref, jj_ref, a_hbm, out_hbm, s_in1, s_in2, s_out, sems):
    step = pl.program_id(0)
    i = ii_ref[step]
    j = jj_ref[step]
    T = s_in1.shape[0]

    in1 = pltpu.make_async_copy(
        a_hbm.at[pl.ds(i * T, T), pl.ds(j * T, T)], s_in1, sems.at[0]
    )
    in2 = pltpu.make_async_copy(
        a_hbm.at[pl.ds(j * T, T), pl.ds(i * T, T)], s_in2, sems.at[1]
    )
    in1.start()
    in2.start()
    in1.wait()
    in2.wait()

    s_out[...] = (s_in1[...] + s_in2[...].T) * 0.5

    o1 = pltpu.make_async_copy(
        s_out, out_hbm.at[pl.ds(i * T, T), pl.ds(j * T, T)], sems.at[2]
    )
    o1.start()
    o1.wait()

    @pl.when(j != i)
    def _():
        # reuse s_in1 as scratch for the transposed tile
        s_in1[...] = s_out[...].T
        o2 = pltpu.make_async_copy(
            s_in1, out_hbm.at[pl.ds(j * T, T), pl.ds(i * T, T)], sems.at[3]
        )
        o2.start()
        o2.wait()


@functools.partial(jax.jit, static_argnames=("tile",))
def symmetrize(a: jax.Array, tile: int = 512) -> jax.Array:
    """``(a + a.T) / 2`` via the two-pass tile-pair kernel.

    Requires a square f32/bf16 matrix with side divisible by ``tile``
    (falls back to the plain fused expression otherwise)."""
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
        return (a + a.T) / 2

    nb = n // tile
    pairs = [(i, j) for i in range(nb) for j in range(i, nb)]
    ii = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
    jj = jnp.asarray(np.array([p[1] for p in pairs], np.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((tile, tile), a.dtype),
            pltpu.VMEM((tile, tile), a.dtype),
            pltpu.VMEM((tile, tile), a.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        _sym_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n), a.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=16 * 1024 * 1024,
        ),
    )(ii, jj, a)
