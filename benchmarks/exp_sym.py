"""Round-3 symmetrize roofline experiment (VERDICT r2 item 4).

Questions this answers with slope-timed on-chip numbers (committed to
``results_tpu_r3.json``):

1. What is the chip's streaming ceiling (x+1 read+write)?
2. What is the 2-D transpose-copy ceiling — XLA's and a plain Pallas tiled
   transpose at several tile sizes? (The symmetrize kernel cannot beat the
   transpose unit: every element of A must cross lanes once.)
3. What does the tile-pair symmetrize kernel do across tile sizes, and what
   is its DMA-schedule ceiling (same double-buffered pair schedule with the
   VPU transposes removed — a pure pair-copy)? The gap between (3-copy) and
   (3-full) isolates the in-VMEM transpose cost.
4. Does skipping the duplicate diagonal write matter (1/(nb+1) of writes)?

Usage: python benchmarks/exp_sym.py [variant,names] [n]
"""
import os, sys, json, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strided_tpu.utils.timing import time_slope_checked
from strided_tpu.core.kernels_special import symmetrize


def v_stream(x):
    return x + 1.0


def v_xla_sym(x):
    return (x + x.T) * 0.5


def v_xla_transpose(x):
    return x.T + 1e-30 * x  # +eps keeps it a real copy (not a view)


def v_pallas_t2d(tile):
    def kernel(i_ref, o_ref):
        o_ref[...] = jnp.transpose(i_ref[...], (1, 0))

    def run(x):
        n = x.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n // tile, n // tile),
            in_specs=[pl.BlockSpec((tile, tile), lambda i, j: (j, i))],
            out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((n, n), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(x)

    return run


def v_pallas_sym_blockspec(tile):
    """Symmetrize WITHOUT manual DMA: one grid step owns output tile (i,j)
    and reads A[i,j] and A[j,i] through two BlockSpecs. Reads A twice (three
    HBM passes total) but lets Mosaic schedule everything."""

    def kernel(a_ref, at_ref, o_ref):
        o_ref[...] = (a_ref[...] + jnp.transpose(at_ref[...], (1, 0))) * 0.5

    def run(x):
        n = x.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n // tile, n // tile),
            in_specs=[
                pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
                pl.BlockSpec((tile, tile), lambda i, j: (j, i)),
            ],
            out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((n, n), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(x, x)  # A read through two BlockSpecs: (i,j) and (j,i)

    return run


def v_pallas_t2d_rect(th, tw):
    """Rectangular transpose tiles: input rows of tw*4 bytes, output rows of
    th*4 bytes — probes whether the ~325 GB/s square-tile ceiling is set by
    the 2 KB DMA row length."""

    def kernel(i_ref, o_ref):
        o_ref[...] = jnp.transpose(i_ref[...], (1, 0))

    def run(x):
        n = x.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n // th, n // tw),
            in_specs=[pl.BlockSpec((th, tw), lambda i, j: (i, j))],
            out_specs=pl.BlockSpec((tw, th), lambda i, j: (j, i)),
            out_shape=jax.ShapeDtypeStruct((n, n), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x)

    return run


def _pair_kernel(nsteps: int, T: int, do_transpose: bool, skip_diag_write: bool):
    """The tile-pair kernel family: double-buffered manual DMA over the upper
    triangle. ``do_transpose=False`` turns it into a pure pair-copy (the DMA
    ceiling of the same schedule). ``skip_diag_write=True`` drops the second
    (duplicate) output DMA on diagonal pairs."""

    def kernel(ii_ref, jj_ref, a_hbm, out_hbm, s_in, s_out, in_sems, out_sems):
        step = jnp.asarray(pl.program_id(0), jnp.int32)
        slot = step % 2
        nxt = (step + 1) % 2

        def in_dmas(sl, st_):
            i = ii_ref[st_]
            j = jj_ref[st_]
            return (
                pltpu.make_async_copy(
                    a_hbm.at[pl.ds(i * T, T), pl.ds(j * T, T)],
                    s_in.at[sl, 0], in_sems.at[sl, 0]),
                pltpu.make_async_copy(
                    a_hbm.at[pl.ds(j * T, T), pl.ds(i * T, T)],
                    s_in.at[sl, 1], in_sems.at[sl, 1]),
            )

        def out_dmas(sl, st_):
            i = ii_ref[st_]
            j = jj_ref[st_]
            return (
                pltpu.make_async_copy(
                    s_out.at[sl, 0],
                    out_hbm.at[pl.ds(i * T, T), pl.ds(j * T, T)],
                    out_sems.at[sl, 0]),
                pltpu.make_async_copy(
                    s_out.at[sl, 1],
                    out_hbm.at[pl.ds(j * T, T), pl.ds(i * T, T)],
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
            if skip_diag_write:
                i2 = ii_ref[step - 2]
                j2 = jj_ref[step - 2]
                d0, d1 = out_dmas(slot, step - 2)
                d0.wait()
                @pl.when(i2 != j2)
                def _():
                    d1.wait()
            else:
                for d in out_dmas(slot, step - 2):
                    d.wait()

        if do_transpose:
            S = (s_in[slot, 0] + s_in[slot, 1].T) * 0.5
            s_out[slot, 0] = S
            s_out[slot, 1] = S.T
        else:
            s_out[slot, 0] = s_in[slot, 0]
            s_out[slot, 1] = s_in[slot, 1]

        d0, d1 = out_dmas(slot, step)
        d0.start()
        if skip_diag_write:
            i = ii_ref[step]
            j = jj_ref[step]
            @pl.when(i != j)
            def _():
                d1.start()
        else:
            d1.start()

        @pl.when(step == nsteps - 1)
        def _():
            def wait_pair(sl, st_):
                if skip_diag_write:
                    i_ = ii_ref[st_]
                    j_ = jj_ref[st_]
                    e0, e1 = out_dmas(sl, st_)
                    e0.wait()
                    @pl.when(i_ != j_)
                    def _():
                        e1.wait()
                else:
                    for d in out_dmas(sl, st_):
                        d.wait()

            wait_pair(slot, step)
            if nsteps >= 2:
                @pl.when(step >= 1)
                def _():
                    wait_pair(nxt, step - 1)

    return kernel


def v_pair(tile, do_transpose=True, skip_diag_write=False):
    def run(x):
        n = x.shape[0]
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
                pltpu.VMEM((2, 2, tile, tile), x.dtype),
                pltpu.VMEM((2, 2, tile, tile), x.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        return pl.pallas_call(
            _pair_kernel(len(pairs), tile, do_transpose, skip_diag_write),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, n), x.dtype),
            interpret=jax.default_backend() != "tpu",
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(ii, jj, x)

    return run


def variants():
    V = {
        "stream": v_stream,
        "xla_sym": v_xla_sym,
        "xla_transpose": v_xla_transpose,
    }
    for t in (256, 512, 1024):
        V[f"t2d_pallas_{t}"] = v_pallas_t2d(t)
        V[f"sym_blockspec_{t}"] = v_pallas_sym_blockspec(t)
        V[f"pair_copy_{t}"] = v_pair(t, do_transpose=False)
        V[f"pair_full_{t}"] = v_pair(t, do_transpose=True)
        V[f"pair_full_skipdiag_{t}"] = v_pair(t, do_transpose=True,
                                              skip_diag_write=True)
    for th, tw in ((256, 1024), (128, 2048), (512, 1024), (1024, 512),
                   (256, 2048)):
        V[f"t2d_rect_{th}x{tw}"] = v_pallas_t2d_rect(th, tw)
    V["prod_kernel_512"] = lambda x: symmetrize(x, tile=512)
    return V


def main():
    V = variants()
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(V)
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    nbytes = 2 * x.size * 4  # fused read + write (the workload's traffic)

    # Device-side verification: fetching the 256 MB output through the tunnel
    # (~0.6 MB/s) would take minutes per variant; compare on-device against
    # the XLA reference and pull ONE scalar (max |diff|) to the host.
    @jax.jit
    def _maxdiff_sym(got, x):
        return jnp.max(jnp.abs(got - (x + x.T) * 0.5))

    @jax.jit
    def _maxdiff_t(got, x):
        return jnp.max(jnp.abs(got - x.T))

    @jax.jit
    def _maxdiff_id(got, x):
        return jnp.max(jnp.abs(got - x))

    for name in names:
        fn = V[name]
        t0 = time.time()
        try:
            got = jax.jit(fn)(x)
            got.block_until_ready()
            if "sym" in name or name.startswith(("pair_full", "prod")):
                ok = float(_maxdiff_sym(got, x)) == 0.0
            elif name.startswith("pair_copy"):
                ok = float(_maxdiff_id(got, x)) == 0.0
            elif "transpose" in name or name.startswith("t2d"):
                ok = float(_maxdiff_t(got, x)) == 0.0
            else:
                ok = True
            del got
            s, note = time_slope_checked(fn, x)
            print(json.dumps({
                "v": name, "n": n, "gbs": nbytes / s / 1e9, "ok": ok,
                "note": note, "compile_s": round(time.time() - t0, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"v": name, "error": repr(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
