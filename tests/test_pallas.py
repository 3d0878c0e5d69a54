"""Pallas executor tests (interpret mode on CPU — the reference-style
"multi-config same-assertions" strategy, SURVEY.md §4): the tile kernel must
agree exactly with the XLA path and the numpy oracle, and eligibility
fallbacks must trigger where designed."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import strided_tpu as st
from strided_tpu import config as cfg
from strided_tpu.core import executor_pallas as ep
from strided_tpu.core.view import StridedView
from strided_tpu.core.regularize import materialize


@pytest.fixture(autouse=True)
def small_threshold():
    old = cfg.get_config()
    # pallas_reductions on: these tests pin the Pallas reduce machinery's
    # correctness (initop-once, sequential reduction grid) even though the
    # production default routes reductions to XLA (config.py rationale).
    # use_pallas forced on too: this file tests the kernel machinery itself,
    # so it must engage regardless of the suite-wide engine profile
    # (STRIDED_TPU_TEST_PROFILE=xla disables Pallas globally).
    cfg.set_config(use_pallas=True, min_pallas_elements=1024, pair_kernel_min_elements=1024,
                   pallas_map_min_elements=1024,
                   pallas_reductions=True, pallas_aligned_maps=True)
    yield
    cfg.set_config(
        use_pallas=old.use_pallas,
        min_pallas_elements=old.min_pallas_elements,
        pallas_map_min_elements=old.pallas_map_min_elements,
        vmem_budget_bytes=old.vmem_budget_bytes,
        pallas_reductions=old.pallas_reductions,
        pallas_aligned_maps=old.pallas_aligned_maps,
    )


def direct(f, op, initop, dims, out, ins):
    res = ep.try_fused_mapreduce(f, op, initop, dims, out, ins)
    assert res is not None, "expected the Pallas path to engage"
    return res


def test_map_symmetrize():
    a = np.random.default_rng(0).standard_normal((256, 256)).astype(np.float32)
    A = st.strided(jnp.asarray(a))
    B = st.strided(jnp.zeros((256, 256), jnp.float32))
    res = direct(
        lambda x, y: (x + y) / 2, None, None, (256, 256), B, [A, st.transpose(A)]
    )
    np.testing.assert_allclose(
        np.asarray(res.parent).reshape(256, 256), (a + a.T) / 2, rtol=1e-6
    )


def test_map_into_transposed_out():
    # out itself is a lazy transpose (write-side permutation)
    a = np.random.default_rng(1).standard_normal((128, 256)).astype(np.float32)
    A = st.strided(jnp.asarray(a))
    buf = st.strided(jnp.zeros((256, 128), jnp.float32))
    out = st.transpose(buf)  # logical (128, 256)
    res = direct(lambda x: 2 * x, None, None, (128, 256), out, [A])
    np.testing.assert_allclose(
        np.asarray(res.parent).reshape(256, 128), 2 * a.T, rtol=1e-6
    )


def test_rank4_permute_copy():
    t = np.random.default_rng(2).standard_normal((16, 8, 16, 8)).astype(np.float32)
    T = st.strided(jnp.asarray(t))
    P = st.permutedims(T, (3, 2, 1, 0))
    out = st.strided(jnp.zeros((8, 16, 8, 16), jnp.float32))
    res = direct(lambda x: x, None, None, (8, 16, 8, 16), out, [P])
    np.testing.assert_array_equal(
        np.asarray(res.parent).reshape(8, 16, 8, 16),
        np.transpose(t, (3, 2, 1, 0)),
    )


def test_reduction_with_initop_beta():
    beta = 2.5
    a = np.random.default_rng(3).standard_normal((64, 1024)).astype(np.float32)
    c0 = np.random.default_rng(4).standard_normal((64,)).astype(np.float32)
    A = st.strided(jnp.asarray(a))
    out_buf = st.strided(jnp.asarray(c0.copy()))
    out = StridedView(out_buf.parent, (64, 1024), (1, 0), 0, False)
    # shrink VMEM so the reduction dim splits across grid steps
    cfg.set_config(vmem_budget_bytes=256 * 1024)
    res = direct(lambda x: x * x, jnp.add, lambda z: beta * z, (64, 1024), out, [A])
    expect = beta * c0 + (a * a).sum(axis=1)
    np.testing.assert_allclose(np.asarray(res.parent), expect, rtol=2e-5)


def test_complete_reduction():
    a = np.random.default_rng(5).standard_normal((128, 128)).astype(np.float32)
    A = st.strided(jnp.asarray(a))
    out = StridedView(jnp.zeros((1,), jnp.float32), (128, 128), (0, 0), 0, False)
    res = direct(
        lambda x: x, jnp.add, lambda z: jnp.zeros_like(z), (128, 128), out, [A]
    )
    np.testing.assert_allclose(float(res.parent[0]), a.sum(), rtol=1e-4)


def test_broadcast_input():
    a = np.random.default_rng(6).standard_normal((128, 256)).astype(np.float32)
    row = np.random.default_rng(7).standard_normal((256,)).astype(np.float32)
    A = st.strided(jnp.asarray(a))
    R = st.broadcast_to(
        st.strided(jnp.asarray(row))[None, :], (128, 256)
    )
    out = st.strided(jnp.zeros((128, 256), jnp.float32))
    res = direct(jnp.add, None, None, (128, 256), out, [A, R])
    np.testing.assert_allclose(
        np.asarray(res.parent).reshape(128, 256), a + row, rtol=1e-6
    )


def test_int32_exact():
    a = np.random.default_rng(8).integers(-100, 100, (64, 64)).astype(np.int32)
    A = st.strided(jnp.asarray(a))
    out = st.strided(jnp.zeros((64, 64), jnp.int32))
    res = direct(lambda x, y: x * y, None, None, (64, 64), out, [A, st.transpose(A)])
    np.testing.assert_array_equal(
        np.asarray(res.parent).reshape(64, 64), a * a.T
    )


def test_min_reduction():
    a = np.random.default_rng(9).standard_normal((64, 512)).astype(np.float32)
    A = st.strided(jnp.asarray(a))
    out = StridedView(jnp.zeros((64,), jnp.float32), (64, 512), (1, 0), 0, False)
    res = direct(
        lambda x: x, jnp.minimum,
        lambda z: jnp.full_like(z, jnp.inf), (64, 512), out, [A],
    )
    np.testing.assert_allclose(np.asarray(res.parent), a.min(axis=1), rtol=1e-6)


# ---- eligibility fallbacks ----


def test_fallback_f64():
    a = st.strided(jnp.zeros((256, 256), jnp.float64))
    out = st.strided(jnp.zeros((256, 256), jnp.float64))
    assert ep.try_fused_mapreduce(lambda x: x, None, None, (256, 256), out, [a]) is None


def test_fallback_sliced_view():
    big = st.strided(jnp.zeros((300, 300), jnp.float32))
    sl = st.sview(big, np.s_[0:256, 0:256])
    out = st.strided(jnp.zeros((256, 256), jnp.float32))
    assert ep.try_fused_mapreduce(lambda x: x, None, None, (256, 256), out, [sl]) is None


def test_fallback_small():
    cfg.set_config(min_pallas_elements=1 << 15)
    a = st.strided(jnp.zeros((16, 16), jnp.float32))
    out = st.strided(jnp.zeros((16, 16), jnp.float32))
    assert ep.try_fused_mapreduce(lambda x: x, None, None, (16, 16), out, [a]) is None


def test_fallback_unknown_reduce_op():
    a = st.strided(jnp.zeros((64, 512), jnp.float32))
    out = StridedView(jnp.zeros((64,), jnp.float32), (64, 512), (1, 0), 0, False)
    weird = lambda p, q: jnp.arctan2(p, q)
    assert ep.try_fused_mapreduce(lambda x: x, weird, None, (64, 512), out, [a]) is None


def test_engine_dispatch_consistency():
    """fused_mapreduce must give identical results whether or not the Pallas
    path engages (the reference's 1-thread vs N-thread equivalence)."""
    a = np.random.default_rng(10).standard_normal((128, 512)).astype(np.float32)
    A = st.strided(jnp.asarray(a))

    def run():
        B = st.strided(jnp.zeros((512, 128), jnp.float32))
        return np.asarray(
            st.sbroadcast_into(B, lambda x: x * 3, st.transpose(A)).parent
        )

    cfg.set_config(use_pallas=True)
    with_pallas = run()
    cfg.set_config(use_pallas=False)
    without = run()
    cfg.set_config(use_pallas=True)
    np.testing.assert_allclose(with_pallas, without, rtol=1e-6)


def test_symmetrize_special_kernel():
    from strided_tpu.core.kernels_special import symmetrize

    a = jnp.asarray(
        np.random.default_rng(20).standard_normal((1024, 1024)), jnp.float32
    )
    r = np.asarray(symmetrize(a, tile=512))
    an = np.asarray(a)
    np.testing.assert_allclose(r, (an + an.T) / 2, rtol=1e-6)
    # odd sizes and f64 fall back to the fused expression
    b = jnp.asarray(np.random.default_rng(21).standard_normal((100, 100)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(symmetrize(b)), (np.asarray(b) + np.asarray(b).T) / 2, rtol=1e-6
    )


@pytest.mark.parametrize("n", [1000, 392])
def test_pair_kernel_clamped_bit_exact_vs_strips(n):
    """ADVICE r4 item 3: the edge-clamped worklist overlaps DMA writes
    between near-clamp pairs AND the XLA strips rewrite the corner — safe
    ONLY while every path writes bit-identical bytes. This pins the
    identical-value invariant in CI (not just bench.py): kernel+strips vs
    the identical-structure fused XLA expression, EXACT equality, at sizes
    with clamped tiles (core % tile != 0) and ragged strips, for the
    same-buffer, distinct-buffer, and single-transposed-term families."""
    from strided_tpu.core.kernels_special import pair_axpby

    old = cfg.get_config()
    try:
        cfg.set_config(min_pallas_elements=1024, pair_kernel_min_elements=1024, use_pallas=True)
        rng = np.random.default_rng(n)
        a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
        c = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
        # same-buffer symmetrize (alpha == beta: S2 = S1.T shortcut in play)
        got = np.asarray(pair_axpby(a, scale_mode="div", scale=2.0))
        want = np.asarray(jax.jit(lambda x: (x + x.T) / 2.0)(a))
        np.testing.assert_array_equal(got, want)
        # same-buffer axpby-transpose (alpha != beta): the coeff-mul + add
        # structure gives the compiler an FMA-contraction choice, which can
        # differ between separately compiled programs by 1 ulp on CPU — pin
        # to a few-ulp bound (TPU bench gates the fma-free symmetrize exact)
        got = np.asarray(pair_axpby(a, alpha=3.0, beta=2.0))
        want = np.asarray(jax.jit(lambda x: 3.0 * x + 2.0 * x.T)(a))
        np.testing.assert_allclose(got, want, rtol=0, atol=4e-6)
        # distinct buffers
        got = np.asarray(pair_axpby(a, c, alpha=1.0, beta=-1.0))
        want = np.asarray(jax.jit(lambda x, y: x + -(y.T))(a, c))
        np.testing.assert_array_equal(got, want)
        # single-transposed-term (alpha == 0 drops the plain term)
        got = np.asarray(pair_axpby(a, alpha=0.0, beta=3.0))
        want = np.asarray(jax.jit(lambda x: x.T * 3.0)(a))
        np.testing.assert_array_equal(got, want)
    finally:
        cfg.set_config(**{k: getattr(old, k) for k in old.__dataclass_fields__})


def test_pair_kernel_flagship_4000_bit_exact():
    """The reference's literal 4000^2 flagship size through the clamped
    kernel, pinned bit-exact in the pallas CI profile (bench.py gates the
    same invariant on real hardware every round)."""
    import os

    if os.environ.get("STRIDED_TPU_TEST_PROFILE") != "pallas":
        pytest.skip("4000^2 interpret-mode run only in the pallas profile")
    from strided_tpu.core.kernels_special import pair_axpby

    rng = np.random.default_rng(40)
    a = jnp.asarray(rng.standard_normal((4000, 4000)), jnp.float32)
    got = np.asarray(pair_axpby(a, scale_mode="div", scale=2.0, tile=512))
    want = np.asarray(jax.jit(lambda x: (x + x.T) / 2.0)(a))
    np.testing.assert_array_equal(got, want)
