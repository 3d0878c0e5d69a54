"""Planner contract tests — the heuristics are deterministic math, tested
directly (SURVEY.md §7 stage 2), mirroring the reference's
fusion/order/blocking semantics (`/root/reference/src/mapreduce.jl:98-139,427-520`).
"""

from strided_tpu.core.planner import (
    fuse_dims,
    index_order,
    order_dims,
    compute_tiles,
    vmem_footprint,
    plan,
)


def test_index_order_matches_reference_contract():
    # rank of |stride| among nonzero strides; zero strides rank 1
    assert index_order((20, 5, 1)) == (3, 2, 1)
    assert index_order((1, 0, 5)) == (1, 1, 2)
    assert index_order((-8, 2, 0, 1)) == (3, 2, 1, 1)


def test_fuse_contiguous_copy_collapses():
    # A contiguous 4-D copy collapses to effectively 1-D (reference comment,
    # SURVEY.md on _mapreduce_fuse!).
    dims = (2, 3, 4, 5)
    rm = (60, 20, 5, 1)
    fdims, fstr = fuse_dims(dims, (rm, rm))
    # all merged into the last dim
    assert fdims == (1, 1, 1, 120)
    assert [d for d in fdims if d > 1] == [120]


def test_fuse_respects_disagreeing_operand():
    dims = (4, 6)
    a = (6, 1)  # contiguous
    b = (1, 4)  # transposed
    fdims, _ = fuse_dims(dims, (a, b))
    assert fdims == (4, 6)  # no fusion possible


def test_fuse_partial():
    # (2,3,4) with operands contiguous in last two dims only
    dims = (2, 3, 4)
    a = (100, 4, 1)  # gap before dim 0: can't merge (0,1); (1,2) merges
    b = (12, 4, 1)
    fdims, fstr = fuse_dims(dims, (a, b))
    assert fdims == (2, 1, 12)


def test_order_innermost_is_min_stride_of_output():
    dims = (64, 32)
    out = (32, 1)   # row-major output
    src = (1, 64)   # transposed input
    perm, d, s, costs = order_dims(dims, (out, src))
    # output is weighted 2x, so its minor dim (axis 1) wins innermost
    assert perm[-1] == 1
    assert d == (64, 32)
    assert costs[-1] == 2  # 2 * min stride (=1)


def test_order_size1_outermost():
    dims = (8, 1, 16)
    s = ((16, 16, 1), (16, 16, 1))
    perm, d, _, _ = order_dims(dims, s)
    assert perm[0] == 1  # size-1 dim pushed outermost


def test_order_zero_stride_cost():
    dims = (8, 16)
    out = (16, 1)
    red = (0, 1)  # stride-0 on dim 0 (e.g. broadcast input)
    _, _, _, costs = order_dims(dims, (out, red))
    assert costs[0] == 1 or costs[0] == 32  # dim with a 0 stride costs min->1? min(|16|,|0|)=0 -> 1... cost uses min over operands


def test_costs_zero_stride_maps_to_one():
    dims = (8, 16)
    a = (0, 1)
    b = (16, 1)
    _, dp, sp, costs = order_dims(dims, (a, b))
    # find position of original axis 0
    # min stride over operands at that dim is 0 -> cost 1
    for i in range(2):
        mn = min(abs(s[i]) for s in sp)
        assert costs[i] == (1 if mn == 0 else 2 * mn)


def test_tiles_fit_budget():
    dims = (512, 512)
    rm = (512, 1)
    itemsize = (4, 4)
    budget = 128 * 1024
    tiles = compute_tiles(dims, (2, 2), (rm, rm), itemsize, budget)
    assert vmem_footprint(tiles, (rm, rm), itemsize) <= budget
    # aligned to hardware tiling
    assert tiles[-1] % 128 == 0 or tiles[-1] == dims[-1]


def test_tiles_whole_when_fits():
    dims = (64, 128)
    rm = (128, 1)
    tiles = compute_tiles(dims, (2, 2), (rm,), (4,), 8 * 1024 * 1024)
    assert tiles == dims


def test_tiles_never_below_register_tile():
    dims = (4096, 4096)
    rm = (4096, 1)
    cm = (1, 4096)  # transposed operand forces big footprint
    tiles = compute_tiles(dims, (2, 2), (rm, cm), (4, 4), 64 * 1024)
    assert tiles[-1] >= min(dims[-1], 128)
    assert tiles[-2] >= min(dims[-2], 8)


def test_plan_cached_and_hashable():
    p1 = plan((256, 256), ((256, 1), (1, 256)), (4, 4), 1 << 20)
    p2 = plan((256, 256), ((256, 1), (1, 256)), (4, 4), 1 << 20)
    assert p1 is p2  # lru_cache hit
    hash(p1)


def test_plan_drops_size1():
    p = plan((1, 64, 1, 32), ((0, 32, 0, 1), (0, 32, 0, 1)), (4, 4), 1 << 20)
    assert p.dims == (64, 32) or p.dims == (2048,)  # fused
