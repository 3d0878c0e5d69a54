"""Round-4 streaming-reduction experiment (VERDICT r3 item 6).

Question: can a kernels_special-style MANUAL-DMA streaming reduction kernel
(double-buffered input slabs, VMEM accumulator, parallel-dim-major grid)
reach >= 500 GB/s on large partial reductions, where the r3 revisiting-
BlockSpec grid managed only 28-103 GB/s and XLA streams at 575-683?

CAVEAT discovered after this script's first run: the broadcast-back chain
used here PARTIALLY COLLAPSES even under optimization barriers (nocompute
rows measured up to 868 GB/s > the 819 HBM spec), so its absolute numbers
overread. The authoritative comparison is the collapse-proof dus-one-row
harness (results_tpu_r4.json ``stream_reduce_dus_harness``): kernel read
pass 728-753 GB/s vs XLA 692-715, ABAB interleaved. This script remains
useful for the RELATIVE slab-geometry ordering (256x4096 best).

Variants measured at 8192^2 f32, ``out[c] = sum_r A[r, c]`` (axis-0 sum —
the reduction whose minor-dim output makes XLA work hardest):

- ``xla``            — ``jnp.sum(a, axis=0)`` (the production dispatch)
- ``stream_RxC``     — manual-DMA kernel, slab (R, C), col-block-parallel
                       outer grid, sequential row-slab inner grid
- ``nocompute_RxC``  — same DMA schedule with the add removed (reads only):
                       the schedule's speed-of-light

Run: ``timeout 590 python benchmarks/exp_reduce.py`` (real TPU).
Results recorded in benchmarks/results_tpu_r4.json + DESIGN.md.
"""

from __future__ import annotations

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from strided_tpu.utils.timing import time_slope  # noqa: E402

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception as e:  # pragma: no cover
    raise SystemExit(f"pallas unavailable: {e}")


def _make_stream_kernel(nR: int, R: int, C: int, compute: bool):
    def kernel(a_hbm, out_ref, s_in, acc, in_sems):
        rs = jnp.asarray(pl.program_id(1), jnp.int32)
        cb = jnp.asarray(pl.program_id(0), jnp.int32)
        slot = rs % 2
        nxt = (rs + 1) % 2

        def dma(sl, r_):
            return pltpu.make_async_copy(
                a_hbm.at[pl.ds(r_ * R, R), pl.ds(cb * C, C)],
                s_in.at[sl],
                in_sems.at[sl],
            )

        @pl.when(rs == 0)
        def _():
            dma(0, 0).start()

        @pl.when(rs + 1 < nR)
        def _():
            dma(nxt, rs + 1).start()

        dma(slot, rs).wait()

        if compute:
            partial = jnp.sum(s_in[slot], axis=0, dtype=jnp.float32)

            @pl.when(rs == 0)
            def _():
                acc[...] = partial

            @pl.when(rs > 0)
            def _():
                acc[...] = acc[...] + partial
        else:

            @pl.when(rs == 0)
            def _():
                acc[...] = s_in[slot][0]

        @pl.when(rs == nR - 1)
        def _():
            out_ref[...] = acc[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("R", "C", "compute"))
def stream_sum_axis0(a, R=256, C=2048, compute=True):
    n, m = a.shape
    assert n % R == 0 and m % C == 0
    nR = n // R
    grid = (m // C, nR)
    return pl.pallas_call(
        _make_stream_kernel(nR, R, C, compute),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((C,), lambda cb, rs: (cb,)),
        out_shape=jax.ShapeDtypeStruct((m,), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, R, C), jnp.float32),
            pltpu.VMEM((C,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(a)


def main():
    n = 8192
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32) * 1e-3
    # time_slope needs shape-preserving fns: chain as
    #   x_{k+1} = broadcast(colsum(x_k)/n, (n, n))
    # per step = one full read (the reduction under test) + one full write
    # (common to every variant). 2-pass traffic model; single-array chain
    # keeps the 512 MB working set in the HBM-bound regime (DESIGN.md r4).
    nbytes = a.size * 4 * 2
    inv = 1.0 / n
    results = {}

    def chain(reduce_fn):
        return lambda x: jnp.broadcast_to(
            (reduce_fn(x) * inv)[None, :], x.shape
        )

    sec = time_slope(chain(lambda x: jnp.sum(x, axis=0)), a, k1=8, k2=40)
    results["xla"] = nbytes / sec / 1e9
    print(f"xla: {results['xla']:.1f} GB/s (2-pass model)", flush=True)

    # write-floor baseline: broadcast one row (no reduction read)
    sec = time_slope(lambda x: jnp.broadcast_to(x[:1] * inv, x.shape), a, k1=8, k2=40)
    results["write_floor"] = nbytes / sec / 1e9
    print(f"write-floor (row broadcast): {results['write_floor']:.1f} GB/s",
          flush=True)

    want = np.asarray(jax.jit(lambda x: jnp.sum(x, axis=0))(a), np.float64)
    for R, C in [(256, 2048), (512, 2048), (256, 4096), (512, 4096), (1024, 2048), (256, 8192)]:
        key = f"stream_{R}x{C}"
        try:
            got = np.asarray(stream_sum_axis0(a, R=R, C=C), np.float64)
            dev = float(np.max(np.abs(got - want)))
            assert dev < 1e-2, dev
            sec = time_slope(
                chain(lambda x, R=R, C=C: stream_sum_axis0(x, R=R, C=C)),
                a, k1=8, k2=40,
            )
            results[key] = nbytes / sec / 1e9
            sec_nc = time_slope(
                chain(lambda x, R=R, C=C: stream_sum_axis0(x, R=R, C=C, compute=False)),
                a, k1=8, k2=40,
            )
            results[f"nocompute_{R}x{C}"] = nbytes / sec_nc / 1e9
            print(
                f"{key}: {results[key]:.1f} GB/s "
                f"(nocompute {results[f'nocompute_{R}x{C}']:.1f})",
                flush=True,
            )
        except Exception as e:
            results[key] = f"FAIL: {type(e).__name__}: {str(e)[:160]}"
            print(f"{key}: {results[key]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
