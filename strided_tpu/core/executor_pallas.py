"""Pallas tile-kernel executor for the fused map/reduce engine.

The TPU-native replacement for the reference's ``@generated`` blocked SIMD
kernel + task scheduler (`/root/reference/src/mapreduce.jl:141-425`): instead
of pointer-bump loop nests split over Julia tasks, eligible operations run as
one ``pallas_call`` whose grid tiles the fused iteration space:

- **fusion / order / tiles** come from the planner (``planner.py``), the
  direct analog of ``_mapreduce_fuse!``/``_mapreduce_order!``/
  ``_computeblocks``;
- **reduction dims become trailing grid axes** iterating fastest, so the
  output block stays resident in VMEM and accumulates across visits — races
  are impossible by construction, the same rule as the reference's
  cost-zeroing of reduction dims (`/root/reference/src/mapreduce.jl:172-177`);
- **``initop`` applies exactly on the first reduction visit** (all reduction
  grid indices zero), mirroring the first-visit flags of
  `/root/reference/src/mapreduce.jl:351-423`; the old output content arrives
  through an input aliased onto the output buffer;
- **reduction ops must have a known identity** to run here — unknown ops fall
  back to the XLA path, just as the reference rejects unknown reductions
  under threading (`/root/reference/src/mapreduce.jl:188-191`).

Eligibility (:func:`try_fused_mapreduce` returns ``None`` -> XLA fallback):
every operand *exactly nested* over its parent (pure-reshape physical view:
permutes/transposes/broadcasts of dense buffers — no slice copies), 4-byte
real dtypes or bf16, problem size above ``min_pallas_elements`` (the analog
of ``MINTHREADLENGTH``, `/root/reference/src/mapreduce.jl:141`).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .view import StridedView
from .regularize import decompose, Decomposition
from . import planner
from ..config import get_config

try:  # Pallas is TPU/CPU-interpret capable; import guarded for safety
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


_OK_DTYPES = ("float32", "bfloat16", "int32", "uint32")

# Debug/observability: recorded at TRACE time whenever the Pallas path is
# selected (dims, tiles, grid, per-operand physical axes) so perf work can
# see what the solver picked without reading Mosaic dumps. Caveats: on jit
# cache hits nothing re-traces, so the dict describes the most recent TRACE,
# not the most recent dispatch; it is a module-level mutable global, so
# concurrent tracing from multiple threads can interleave updates.
LAST_PLAN: dict = {}


class _Ineligible(Exception):
    pass


def _demote(reason: str):
    """Decline the Pallas path, logging why at DEBUG so silent path
    demotions are observable (ADVICE r3 item 3)."""
    import logging

    logging.getLogger("strided_tpu.dispatch").debug(
        "pallas path demoted: %s", reason
    )
    raise _Ineligible(reason)


def _reducer_for(op):
    """Map a known binary reduce op to its jnp tile-reducer (Mosaic lowers
    these natively); unknown ops return None -> XLA fallback, mirroring the
    reference's rejection of unknown reductions under threading
    (`/root/reference/src/mapreduce.jl:188-191`).

    sum/prod pin ``dtype`` to the operand dtype: the reference accumulates in
    eltype, and under ``jax_enable_x64`` jnp would otherwise upcast int32 ->
    int64 inside the kernel, which Mosaic cannot lower (64-bit types)."""
    import operator

    table = [
        ((operator.add, jnp.add), lambda v, axis: jnp.sum(v, axis=axis, dtype=v.dtype)),
        ((operator.mul, jnp.multiply), lambda v, axis: jnp.prod(v, axis=axis, dtype=v.dtype)),
        ((jnp.minimum,), jnp.min),
        ((jnp.maximum,), jnp.max),
        ((jnp.logical_and,), jnp.all),
        ((jnp.logical_or,), jnp.any),
    ]
    for ops, red in table:
        if any(op is o for o in ops):
            return red
    return None


def _exact_nested(dec: Decomposition, parent_len: int) -> bool:
    """Physical array is a free reshape of the flat parent."""
    if dec.overlapping or any(dec.flipped) or dec.min_offset != 0:
        return False
    n = len(dec.sizes)
    if n == 0:
        return parent_len == 1
    if dec.strides[-1] != 1:
        return False
    for k in range(n - 1):
        if dec.strides[k] != dec.sizes[k + 1] * dec.strides[k + 1]:
            return False
    return math.prod(dec.sizes) == parent_len


def try_fused_mapreduce(
    f: Callable,
    op: Optional[Callable],
    initop: Optional[Callable],
    dims: Tuple[int, ...],
    out: StridedView,
    ins: Sequence[StridedView],
) -> Optional[StridedView]:
    cfg = get_config()
    if not (_HAS_PALLAS and cfg.use_pallas):
        return None
    try:
        return _run(f, op, initop, dims, out, ins, cfg)
    except _Ineligible:
        return None


def _run(f, op, initop, dims, out, ins, cfg):
    operands = [out] + list(ins)
    for v in operands:
        if str(v.dtype) not in _OK_DTYPES or v.conj:
            raise _Ineligible
    if math.prod(dims) < cfg.min_pallas_elements:
        raise _Ineligible
    if op is None and math.prod(dims) < cfg.pallas_map_min_elements:
        # the tile-map path only wins once the working set is HBM-bound
        # (config.pallas_map_min_elements rationale; DESIGN.md r4)
        raise _Ineligible
    if any(d == 0 for d in dims):
        raise _Ineligible

    # ``pl.pallas_call`` kernels cannot close over array values ("captures
    # constants ... pass them as inputs") — a traced scalar in the user
    # closure (e.g. ``(v + v.T) * s`` under jit) or a captured concrete
    # array must take the XLA path, which fuses closures fine. Detect by
    # abstract-tracing f and checking for non-literal consts.
    try:
        closed = jax.make_jaxpr(f)(
            *[jax.ShapeDtypeStruct((1,) * len(dims), v.dtype) for v in ins]
        )
        for c in closed.consts:
            if isinstance(c, (jax.Array, jax.core.Tracer)):
                # device arrays / traced values (any rank) cannot be closed
                # over by a pallas_call kernel ("captures constants")
                _demote(f"closure captures {type(c).__name__}")
            elif getattr(c, "ndim", 0) > 0:
                _demote("closure captures an array constant")
            # else: 0-d plain-numpy scalars lower as literals — eligible
            # (ADVICE r3 item 3)
    except _Ineligible:
        raise
    except Exception as e:  # f not abstractly traceable here -> let XLA try
        _demote(f"f not abstractly traceable: {type(e).__name__}: {e}")

    red0 = tuple(
        i for i in range(len(dims)) if out.strides[i] == 0 and dims[i] != 1
    )
    if op is not None and red0 and not cfg.pallas_reductions:
        raise _Ineligible  # XLA streams reductions faster (see config.py)
    _reducer = _reducer_for(op) if (op is not None and red0) else None
    if op is not None and red0 and _reducer is None:
        raise _Ineligible  # unknown reduction op: XLA fold path handles it

    # ---- plan: fuse -> drop size-1 -> order (reduction dims innermost) ----
    all_strides = tuple(tuple(v.strides) for v in operands)
    dims_f, strides_f = planner.fuse_dims(tuple(dims), all_strides)
    keep = [i for i in range(len(dims_f)) if dims_f[i] > 1]
    if not keep:
        raise _Ineligible
    dims_k = tuple(dims_f[i] for i in keep)
    strides_k = tuple(tuple(s[i] for i in keep) for s in strides_f)
    red_k = tuple(
        j for j, i in enumerate(keep)
        if strides_k[0][j] == 0  # out stride 0 on a size>1 dim == reduction
    )
    perm, dims_o, strides_o, costs = planner.order_dims(dims_k, strides_k)
    # Stable-partition: non-reduction dims first, reduction dims last
    # (innermost grid; the output block must be constant across them).
    order = [j for j in range(len(perm)) if perm[j] not in red_k] + [
        j for j in range(len(perm)) if perm[j] in red_k
    ]
    perm = tuple(perm[j] for j in order)
    dims_o = tuple(dims_o[j] for j in order)
    strides_o = tuple(tuple(s[j] for j in order) for s in strides_o)
    costs = tuple(costs[j] for j in order)
    r = len(dims_o)
    n_red = sum(1 for p in perm if p in red_k)
    n_par = r - n_red
    if n_par == 0:
        # complete reduction: synthesize a leading parallel dim of size 1
        dims_o = (1,) + dims_o
        strides_o = tuple((0,) + s for s in strides_o)
        costs = (1,) + costs
        perm = (-1,) + perm
        r += 1
        n_par = 1
    if r > 5:
        raise _Ineligible

    # ---- per-operand physical layouts ----
    decs = []
    for v, s in zip(operands, strides_o):
        dec = decompose(dims_o, s, v.offset)
        if not _exact_nested(dec, int(v.parent.shape[0])):
            raise _Ineligible
        decs.append(dec)
    dec_out = decs[0]
    # Dispatch honesty (measured on v5e): when every operand's physical
    # order already matches the logical iteration order — no in-VMEM
    # transpose needed anywhere — XLA's fused elementwise codegen wins
    # (e.g. compute-bound broadcast 8192^2: 490 GB/s XLA vs 276 Pallas).
    # The tile path only earns its keep on scrambled layouts (transposed
    # reads: 339 vs 299 GB/s). Same spirit as the reference engaging its
    # blocked path only when blocking can help. Reductions are already
    # policy-gated by ``pallas_reductions``; ``pallas_aligned_maps=True``
    # forces aligned maps through Pallas (tests / experiments).
    if (
        op is None
        and not cfg.pallas_aligned_maps
        and all(list(d.real_axes) == sorted(d.real_axes) for d in decs)
    ):
        raise _Ineligible
    # output must own exactly the parallel dims of size > 1 (size-1 parallel
    # dims — e.g. the synthetic one for complete reductions — carry no data)
    expected_par = set(i for i in range(n_par) if dims_o[i] > 1)
    if set(dec_out.real_axes) != expected_par:
        raise _Ineligible

    # ---- tiles ----
    itemsizes = tuple(v.dtype.itemsize for v in operands)
    # Alignment per logical dim: lane (128) where any operand has its
    # physical minor axis, sublane (8, scaled by sub-word packing) for
    # second-minor. A physically 1-D operand folds both register dims into
    # its single axis, so its block must be a multiple of sublane*lane
    # (1024 for f32 — Mosaic's 1-D memref tiling).
    align = [1] * r
    for dec, v in zip(decs, operands):
        if not dec.real_axes:
            continue
        pack = max(1, 4 // v.dtype.itemsize)  # bf16 packs 2 per 32-bit word
        if len(dec.real_axes) == 1:
            a = dec.real_axes[-1]
            align[a] = max(align[a], 8 * pack * 128)
        else:
            align[dec.real_axes[-1]] = max(align[dec.real_axes[-1]], 128)
            align[dec.real_axes[-2]] = max(align[dec.real_axes[-2]], 8 * pack)
    sublane = 8
    lane = 128
    # Plan against a quarter of the VMEM budget: Pallas double-buffers every
    # operand block (2x) and register-tile padding inflates further; the
    # planner's footprint is single-buffered.
    budget = cfg.vmem_budget_bytes // max(1, cfg.pallas_budget_divisor)
    tiles = list(
        planner.compute_tiles(
            dims_o, costs, strides_o, itemsizes, budget, sublane, lane
        )
    )
    for i in range(r):
        a = align[i]
        if a > 1 and tiles[i] < dims_o[i]:
            tiles[i] = max(a, tiles[i] - tiles[i] % a)
            tiles[i] = min(tiles[i], dims_o[i])

    # Alignment bumps may have re-broken the budget: shrink outermost dims
    # (halving, never below each dim's alignment floor) until it fits.
    def _fp(t):
        return planner.vmem_footprint(tuple(t), strides_o, itemsizes, sublane, lane)

    while _fp(tiles) > budget:
        for j in range(r):
            floor = min(align[j], dims_o[j]) if align[j] > 1 else 1
            if tiles[j] > floor:
                tiles[j] = max(floor, tiles[j] // 2)
                break
        else:
            raise _Ineligible
    # reductions need exact tiling (padded lanes would poison the combine)
    for i in range(n_par, r):
        if dims_o[i] % tiles[i] != 0:
            if dims_o[i] % align[i] == 0 and align[i] > 1:
                tiles[i] = align[i]
            elif tiles[i] != dims_o[i]:
                raise _Ineligible
    # map path: padded input lanes feed f; garbage is masked on write, but
    # keep lanes aligned where required
    for i in range(r):
        if align[i] > 1 and dims_o[i] % align[i] != 0 and tiles[i] != dims_o[i]:
            raise _Ineligible
    tiles = tuple(tiles)

    grid = tuple(pl.cdiv(dims_o[i], tiles[i]) for i in range(r))

    # ---- BlockSpecs ----
    def spec_for(dec):
        axes = dec.real_axes  # logical axes in physical order
        if not axes:  # scalar operand (complete-reduction output, etc.)
            return pl.BlockSpec((1,), lambda *g: (0,))
        block = tuple(tiles[a] for a in axes)

        def index_map(*g, _axes=axes):
            return tuple(g[a] for a in _axes)

        return pl.BlockSpec(block, index_map)

    in_specs = [spec_for(dec) for dec in decs[1:]]
    out_spec = spec_for(dec_out)
    needs_old = op is not None or initop is not None
    if needs_old:
        in_specs = in_specs + [out_spec]

    tile_shape = tiles

    def to_logical(blk, dec):
        """Physical tile -> full logical tile (transpose + broadcast)."""
        axes = dec.real_axes
        if axes:
            sort = sorted(range(len(axes)), key=lambda k: axes[k])
            if sort != list(range(len(axes))):
                blk = jnp.transpose(blk, sort)
            return lax.broadcast_in_dim(blk, tile_shape, tuple(sorted(axes)))
        return lax.broadcast_in_dim(blk.reshape(()), tile_shape, ())

    def kernel(*refs):
        if needs_old:
            in_refs, old_ref, out_ref = refs[:-2], refs[-2], refs[-1]
        else:
            in_refs, out_ref = refs[:-1], refs[-1]
        vals = f(*[to_logical(ref[...], dec) for ref, dec in zip(in_refs, decs[1:])])
        red_axes = tuple(range(n_par, r))
        if op is None or not red_axes:
            res = vals
        else:
            res = _reducer(vals, axis=red_axes)
        # res axes = logical parallel dims 0..n_par-1. Squeeze size-1 dims
        # the output doesn't own, then put the rest into out physical order.
        own = dec_out.real_axes
        drop = [i for i in range(n_par) if i not in own]
        if drop:
            res = lax.squeeze(res, drop)
        if own:
            sorted_own = sorted(own)
            operm = tuple(sorted_own.index(a) for a in own)
            if operm != tuple(range(len(own))):
                res = jnp.transpose(res, operm)
        else:
            res = res.reshape((1,))
        res = res.astype(out_ref.dtype)
        if not needs_old:
            out_ref[...] = res
            return
        old = old_ref[...]
        if op is None:
            out_ref[...] = res
            return
        first = jnp.bool_(True)
        for k in range(n_par, r):
            first = jnp.logical_and(first, pl.program_id(k) == 0)

        @pl.when(first)
        def _():
            seed = initop(old) if initop is not None else old
            out_ref[...] = op(seed.astype(res.dtype), res).astype(out_ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[...] = op(out_ref[...].astype(res.dtype), res).astype(
                out_ref.dtype
            )

    phys_ins = [
        v.parent.reshape(dec.sizes) if dec.sizes else v.parent.reshape(())
        for v, dec in zip(ins, decs[1:])
    ]
    out_phys_shape = dec_out.sizes or (1,)
    call_ins = list(phys_ins)
    io_aliases = {}
    if needs_old:
        call_ins.append(out.parent.reshape(out_phys_shape))
        io_aliases = {len(call_ins) - 1: 0}

    LAST_PLAN.clear()
    LAST_PLAN.update(
        dims=dims_o,
        tiles=tiles,
        grid=grid,
        n_par=n_par,
        real_axes=[dec.real_axes for dec in decs],
        align=tuple(align),
    )

    interpret = cfg.interpret or jax.default_backend() != "tpu"
    compiler_params = None
    if not interpret:
        try:
            compiler_params = pltpu.CompilerParams(
                dimension_semantics=tuple(
                    ["parallel"] * n_par + ["arbitrary"] * (r - n_par)
                ),
                # allow the compiler the full planned footprint (double
                # buffers + padding) with headroom
                vmem_limit_bytes=min(cfg.vmem_budget_bytes * 2, 100 * 1024 * 1024),
            )
        except Exception:
            compiler_params = None

    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_phys_shape, out.dtype),
        input_output_aliases=io_aliases,
        interpret=interpret,
        **({"compiler_params": compiler_params} if compiler_params else {}),
    )(*call_ins)

    new_parent = result.reshape(-1)
    return StridedView(new_parent, out.shape, out.strides, out.offset, out.conj)
