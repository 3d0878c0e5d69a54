"""Trace-time planner: dimension fusion, loop-order heuristic, tile solver.

TPU-native re-expression of the reference's kernel-planning layer:

- :func:`fuse_dims` — adjacent-dimension fusion, the direct analog of
  ``_mapreduce_fuse!`` (`/root/reference/src/mapreduce.jl:98-117`), in
  row-major convention (merge dims (i, i+1) when every operand satisfies
  ``s[i] == d[i+1] * s[i+1]``).
- :func:`index_order` — per-dim stride rank, analog of ``indexorder``
  (`/root/reference/src/mapreduce.jl:427-441`).
- :func:`order_dims` — the importance-scored loop ordering of
  ``_mapreduce_order!`` (`/root/reference/src/mapreduce.jl:119-139`): each
  dim scores ``1 << (g * (N - indexorder))`` per operand with the output
  weighted 2x, size-1 dims forced outermost; we sort *ascending* so the most
  important dim lands innermost (last), the row-major mirror of the
  reference's descending sort in column-major.
- :func:`compute_tiles` — the VMEM tile solver, analog of ``_computeblocks``
  (`/root/reference/src/mapreduce.jl:470-500`) with the L1/cache-line
  footprint model (``totalmemoryregion``, `:502-520`) replaced by a TPU VMEM
  model: per-operand tiles are padded to the (sublane, lane) register tiling
  of their two minor physical dims, and the halving loop drives the summed
  footprint under the VMEM budget.

All functions are pure, operate on static shapes/strides (hashable tuples),
and are cached — the analog of Julia specializing per (N, M) at compile time;
caching keeps jit re-traces cheap (SURVEY.md §7 "planner must be
hashable/cacheable").
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

__all__ = [
    "fuse_dims",
    "index_order",
    "order_dims",
    "compute_tiles",
    "vmem_footprint",
    "plan",
    "Plan",
]

Strides = Tuple[int, ...]


def index_order(strides: Strides) -> Tuple[int, ...]:
    """Rank of |stride| among nonzero strides; zero strides rank 1.

    Contract-identical to the reference ``indexorder``
    (`/root/reference/src/mapreduce.jl:427-441`)."""
    out = []
    for si in strides:
        a = abs(si)
        if a == 0:
            out.append(1)
            continue
        k = 1
        for s in strides:
            if s != 0 and abs(s) < a:
                k += 1
        out.append(k)
    return tuple(out)


def fuse_dims(dims: Tuple[int, ...], all_strides: Tuple[Strides, ...]):
    """Merge adjacent dims (i, i+1) into i+1 when for EVERY operand
    ``s[i] == d[i+1] * s[i+1]`` (row-major adjacency). Merged dim keeps the
    product size; the vacated dim becomes size 1 (and is dropped by
    :func:`order_dims`'s size-1 rule). Mirrors ``_mapreduce_fuse!``
    (`/root/reference/src/mapreduce.jl:103-115`)."""
    dims = list(dims)
    all_strides = [list(s) for s in all_strides]
    n = len(dims)
    # Walk outermost -> innermost so the merged chunk accumulates at the
    # small-stride end (the row-major mirror of the reference's N..2 loop).
    for i in range(0, n - 1):
        if all(s[i] == dims[i + 1] * s[i + 1] for s in all_strides):
            dims[i + 1] = dims[i] * dims[i + 1]
            dims[i] = 1
    return tuple(dims), tuple(tuple(s) for s in all_strides)


def order_dims(dims: Tuple[int, ...], all_strides: Tuple[Strides, ...]):
    """Choose the loop order. Returns ``(perm, dims, all_strides, costs)``
    with dims permuted outermost..innermost; ``perm[k]`` is the original axis
    at loop position k. Mirrors ``_mapreduce_order!``
    (`/root/reference/src/mapreduce.jl:119-139`); costs are
    ``2 * min_nonzero_stride`` (0 -> 1), used by the tile solver and by the
    sharding layer to pick split axes."""
    m = len(all_strides)
    n = len(dims)
    g = (m + 1).bit_length()  # ceil(log2(M+2)) bits per operand rank
    orders = [index_order(s) for s in all_strides]
    importance = []
    for i in range(n):
        score = 2 * (1 << (g * (n - orders[0][i])))  # output weighted 2x
        for k in range(1, m):
            score += 1 << (g * (n - orders[k][i]))
        if dims[i] <= 1:
            score = 0  # size-1 dims pushed outermost (they don't loop)
        importance.append(score)
    # Ascending importance: most important dim becomes innermost (last).
    perm = tuple(sorted(range(n), key=lambda i: (importance[i], -i)))
    dims_p = tuple(dims[i] for i in perm)
    strides_p = tuple(tuple(s[i] for i in perm) for s in all_strides)
    costs = []
    for i in range(n):
        mn = min(abs(s[i]) for s in strides_p)
        costs.append(1 if mn == 0 else mn * 2)
    return perm, dims_p, strides_p, tuple(costs)


def _padded_tile(tile_dims, strides, itemsize, sublane, lane):
    """VMEM footprint (bytes) of one operand's tile: the operand's two
    smallest-stride dims are its physical minor dims and get padded to the
    (sublane, lane) register tiling; stride-0 dims occupy a single lane row
    (they are broadcast, not stored per-element)."""
    order = index_order(strides)
    # physical minor dim = smallest nonzero stride (order == 1 among nonzero)
    nz = [(order[i], i) for i in range(len(strides)) if strides[i] != 0]
    nz.sort()
    minor = nz[0][1] if nz else None
    second = nz[1][1] if len(nz) > 1 else None
    total = 1
    for i, d in enumerate(tile_dims):
        if strides[i] == 0:
            continue  # broadcast: no per-element storage along this dim
        if i == minor:
            d = -(-d // lane) * lane
        elif i == second:
            d = -(-d // sublane) * sublane
        total *= d
    if minor is not None and tile_dims[minor] < lane:
        pass  # already padded above
    return total * itemsize


def vmem_footprint(tile_dims, all_strides, itemsizes, sublane=8, lane=128):
    """Summed padded VMEM bytes across operands for a candidate tile —
    TPU analog of ``totalmemoryregion`` (`/root/reference/src/mapreduce.jl:502-520`),
    with (sublane, lane) register tiles replacing 64-byte cache lines."""
    return sum(
        _padded_tile(tile_dims, s, isz, sublane, lane)
        for s, isz in zip(all_strides, itemsizes)
    )


def compute_tiles(
    dims: Tuple[int, ...],
    costs: Tuple[int, ...],
    all_strides: Tuple[Strides, ...],
    itemsizes: Tuple[int, ...],
    budget: int,
    sublane: int = 8,
    lane: int = 128,
) -> Tuple[int, ...]:
    """Solve tile sizes against the VMEM budget.

    Same control flow as ``_computeblocks`` (`/root/reference/src/mapreduce.jl:470-500`):
    if everything fits, tile = whole dims; otherwise repeatedly halve the dim
    with the largest ``(tile - 1) * cost`` (last argmax, like the reference's
    ``_lastargmax``) until the footprint drops below 2x budget, then shrink
    in lane/sublane-sized steps to fit. Unlike the reference we never shrink
    below the hardware register tile on the minor dims — partially-used
    lanes waste bandwidth either way, so tiles stay aligned."""
    if vmem_footprint(dims, all_strides, itemsizes, sublane, lane) <= budget:
        return tuple(dims)
    tiles = list(dims)
    n = len(dims)

    # Minimum useful tile along each loop dim: the innermost loop dims map to
    # lanes/sublanes of the output operand — don't shrink below those.
    min_tile = [1] * n
    if n >= 1:
        min_tile[n - 1] = min(dims[n - 1], lane)
    if n >= 2:
        min_tile[n - 2] = min(dims[n - 2], sublane)

    def fp(t):
        return vmem_footprint(tuple(t), all_strides, itemsizes, sublane, lane)

    def shrinkable(i):
        return tiles[i] > min_tile[i]

    while fp(tiles) >= 2 * budget:
        cand = [((tiles[i] - 1) * costs[i], i) for i in range(n) if shrinkable(i)]
        if not cand:
            break
        _, i = max(cand, key=lambda t: (t[0], t[1]))
        tiles[i] = max(min_tile[i], (tiles[i] + 1) // 2)
    while fp(tiles) > budget:
        cand = [((tiles[i] - 1) * costs[i], i) for i in range(n) if shrinkable(i)]
        if not cand:
            break
        _, i = max(cand, key=lambda t: (t[0], t[1]))
        step = lane if i == n - 1 else (sublane if i == n - 2 else 1)
        tiles[i] = max(min_tile[i], tiles[i] - step)
    return tuple(tiles)


class Plan(tuple):
    """(perm, dims, all_strides, costs, tiles) — hashable planner output."""

    __slots__ = ()

    @property
    def perm(self):
        return self[0]

    @property
    def dims(self):
        return self[1]

    @property
    def all_strides(self):
        return self[2]

    @property
    def costs(self):
        return self[3]

    @property
    def tiles(self):
        return self[4]


@functools.lru_cache(maxsize=4096)
def plan(
    dims: Tuple[int, ...],
    all_strides: Tuple[Strides, ...],
    itemsizes: Tuple[int, ...],
    budget: int,
    sublane: int = 8,
    lane: int = 128,
) -> Plan:
    """Full pipeline: fuse -> order -> tile. Cached on static metadata so
    repeated jit traces of the same layouts are free (the analog of Julia's
    per-(N, M) method specialization cache)."""
    dims_f, strides_f = fuse_dims(dims, all_strides)
    perm, dims_o, strides_o, costs = order_dims(dims_f, strides_f)
    # Drop size-1 dims (they ended up outermost with importance 0).
    keep = [i for i in range(len(dims_o)) if dims_o[i] > 1]
    if not keep:
        keep = [len(dims_o) - 1] if dims_o else []
    perm = tuple(perm[i] for i in keep)
    dims_o = tuple(dims_o[i] for i in keep)
    strides_o = tuple(tuple(s[i] for i in keep) for s in strides_o)
    costs = tuple(costs[i] for i in keep)
    tiles = compute_tiles(dims_o, costs, strides_o, itemsizes, budget, sublane, lane)
    return Plan((perm, dims_o, strides_o, costs, tiles))
