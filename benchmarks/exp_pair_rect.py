"""Round-4 rect-tile pair-kernel experiment (VERDICT r3 item 4).

r3 measured the best plain transpose-COPY at 8192^2 with rectangular
512x1024 tiles (335.7 GB/s) vs square-512 (326.0); the production pair
kernel only supports square tiles. Question: does the rect geometry (DMAs
with twice-longer contiguous rows) transfer to the PAIR schedule?

Design: a "supertile" step processes the column-pair {j, j+1} of tile row
i with TWO DMAs — A[iT:(i+1)T, jT:(j+2)T] (T x 2T, 4 KB rows) and
A[jT:(j+2)T, iT:(i+1)T] (2T x T) — instead of four square DMAs, halving
DMA count and doubling the minor extent of half the transfers. This is a
timing experiment over the strictly-off-diagonal supertiles (the diagonal
band needs a second square-tile launch in production — see DESIGN.md r4
notes); per-byte rates are compared against the square kernel over its
full worklist, which is fair because both schedules' per-step traffic is
counted exactly.

Run: ``timeout 590 python benchmarks/exp_pair_rect.py`` (real TPU).
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
from strided_tpu.core.kernels_special import _make_pair_kernel  # noqa: E402

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_rect_kernel(nsteps: int, T: int, alpha: float):
    """Supertile pair step: (i, k) -> rect tiles (T, 2T) + (2T, T)."""

    def kernel(ii_ref, kk_ref, a_hbm, out_hbm, s_in1, s_in2, s_o1, s_o2,
               in_sems, out_sems):
        step = jnp.asarray(pl.program_id(0), jnp.int32)
        slot = step % 2
        nxt = (step + 1) % 2

        def in_dmas(sl, st_):
            ri = ii_ref[st_] * T
            cj = kk_ref[st_] * (2 * T)
            return (
                pltpu.make_async_copy(
                    a_hbm.at[pl.ds(ri, T), pl.ds(cj, 2 * T)],
                    s_in1.at[sl], in_sems.at[sl, 0]),
                pltpu.make_async_copy(
                    a_hbm.at[pl.ds(cj, 2 * T), pl.ds(ri, T)],
                    s_in2.at[sl], in_sems.at[sl, 1]),
            )

        def out_dmas(sl, st_):
            ri = ii_ref[st_] * T
            cj = kk_ref[st_] * (2 * T)
            return (
                pltpu.make_async_copy(
                    s_o1.at[sl], out_hbm.at[pl.ds(ri, T), pl.ds(cj, 2 * T)],
                    out_sems.at[sl, 0]),
                pltpu.make_async_copy(
                    s_o2.at[sl], out_hbm.at[pl.ds(cj, 2 * T), pl.ds(ri, T)],
                    out_sems.at[sl, 1]),
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

        @pl.when(step >= 2)
        def _():
            for d in out_dmas(slot, step - 2):
                d.wait()

        S1 = (s_in1[slot] + s_in2[slot].T) * alpha   # (T, 2T)
        s_o1[slot] = S1
        s_o2[slot] = S1.T
        for d in out_dmas(slot, step):
            d.start()

        @pl.when(step == nsteps - 1)
        def _():
            for d in out_dmas(slot, step):
                d.wait()
            if nsteps >= 2:
                @pl.when(step >= 1)
                def _():
                    for d in out_dmas(nxt, step - 1):
                        d.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("T",))
def rect_pairs(a, T=384):
    n = a.shape[0]
    nb = n // T
    nk = n // (2 * T)
    work = [(i, k) for i in range(nb) for k in range(nk) if 2 * k > i]
    ii = jnp.asarray(np.array([w[0] for w in work], np.int32))
    kk = jnp.asarray(np.array([w[1] for w in work], np.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(work),),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, T, 2 * T), a.dtype),
            pltpu.VMEM((2, 2 * T, T), a.dtype),
            pltpu.VMEM((2, T, 2 * T), a.dtype),
            pltpu.VMEM((2, 2 * T, T), a.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        _make_rect_kernel(len(work), T, 0.5),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n), a.dtype),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=24 * 1024 * 1024
        ),
    )(ii, kk, a)
    return out, len(work)


def main():
    import strided_tpu as st

    n = 8064  # multiple of 384 AND 768 AND 256; large-size regime
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    results = {}

    for T in (384, 256):
        # symmetrize runs a CLAMPED worklist over the 128-aligned core:
        # ceil(core/T) tile rows (the r4-draft model undercounted by one row
        # at non-divisible sizes, understating square_256 ~6%)
        core = (n // 128) * 128
        nb = -(-core // T)
        sq_pairs = nb * (nb + 1) // 2
        sec = time_slope(lambda x, T=T: st.symmetrize(x, tile=T), a, k1=8, k2=40)
        # traffic model for square: reads = 2 tiles/pair, writes = 2 (1 diag)
        reads = sq_pairs * 2 * T * T * 4
        writes = (sq_pairs * 2 - nb) * T * T * 4
        results[f"square_{T}"] = float((reads + writes) / sec / 1e9)
        print(f"square T={T}: {results[f'square_{T}']:.1f} GB/s "
              f"(worklist bytes model)", flush=True)

        out, nwork = rect_pairs(a, T=T)
        jax.block_until_ready(out)
        # rect traffic: per step reads (T*2T + 2T*T), writes same
        rbytes = nwork * 4 * T * (2 * T) * 4
        sec = time_slope(lambda x, T=T: rect_pairs(x, T=T)[0], a, k1=8, k2=40)
        results[f"rect_{T}x{2*T}"] = float(rbytes / sec / 1e9)
        print(f"rect  T={T}x{2*T}: {results[f'rect_{T}x{2*T}']:.1f} GB/s "
              f"({nwork} supertiles)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
