"""Dual-config engine pass — the analog of the reference running its whole
suite once serial and once multithreaded (`/root/reference/test/runtests.jl:10-24`):
the same value-level assertions run with the Pallas path forced on (low size
threshold, interpret mode on CPU) and with it off, and both must agree with
the oracle bit-for-bit where exact."""

import numpy as np
import pytest
import jax.numpy as jnp

import strided_tpu as st
from strided_tpu import config as cfg
from strided_tpu.core.mapreduce import (
    smap,
    copy_into,
    permutedims_into,
    sreduce,
    sreduce_dims,
    mapreducedim_into,
)
from strided_tpu.core.broadcast import sbroadcast, sbroadcast_into
from strided_tpu.core.regularize import materialize


@pytest.fixture(params=["pallas", "xla"])
def engine(request):
    old = cfg.get_config()
    if request.param == "pallas":
        cfg.set_config(
            use_pallas=True, min_pallas_elements=256, pair_kernel_min_elements=256, pallas_map_min_elements=256, pallas_reductions=True,
            pallas_aligned_maps=True
        )
    else:
        cfg.set_config(use_pallas=False)
    yield request.param
    cfg.set_config(
        use_pallas=old.use_pallas,
        min_pallas_elements=old.min_pallas_elements,
        pair_kernel_min_elements=old.pair_kernel_min_elements,
        pallas_map_min_elements=old.pallas_map_min_elements,
        pallas_reductions=old.pallas_reductions,
        pallas_aligned_maps=old.pallas_aligned_maps,
    )


def rand32(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_symmetrize_both_paths(engine):
    a = rand32((128, 128))
    A = st.strided(jnp.asarray(a))
    B = st.strided(jnp.zeros((128, 128), jnp.float32))
    res = sbroadcast_into(B, lambda x, y: (x + y) / 2, A, st.transpose(A))
    np.testing.assert_allclose(
        np.asarray(res.parent).reshape(128, 128), (a + a.T) / 2, rtol=1e-6
    )


def test_permute_copy_both_paths(engine):
    t = rand32((8, 16, 8, 16), seed=1)
    out = st.strided(jnp.zeros((16, 8, 16, 8), jnp.float32))
    res = permutedims_into(out, jnp.asarray(t), (3, 2, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(res.parent).reshape(16, 8, 16, 8), np.transpose(t, (3, 2, 1, 0))
    )


def test_fused_4permute_sum_both_paths(engine):
    t = rand32((8, 8, 8, 8), seed=2)
    T = st.strided(jnp.asarray(t))
    perms = [(0, 1, 2, 3), (3, 2, 1, 0), (2, 3, 0, 1), (1, 0, 3, 2)]
    res = sbroadcast(lambda a, b, c, d: a + b + c + d, *[st.permutedims(T, p) for p in perms])
    expect = sum(np.transpose(t, p) for p in perms)
    np.testing.assert_allclose(np.asarray(materialize(res)), expect, rtol=1e-5)


def test_reduction_beta_both_paths(engine):
    beta = 2.5
    a = rand32((32, 256), seed=3)
    c0 = rand32((32, 1), seed=4)
    out = st.broadcast_to(st.strided(jnp.asarray(c0.copy())), (32, 256))
    res = mapreducedim_into(
        lambda x: x * x, jnp.add, lambda z: beta * z, out, st.strided(jnp.asarray(a))
    )
    expect = beta * c0 + (a * a).sum(axis=1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(res.parent).reshape(32, 1), expect, rtol=2e-5
    )


def test_complete_sum_both_paths(engine):
    a = rand32((64, 64), seed=5)
    got = sreduce(lambda x: x, jnp.add, st.transpose(st.strided(jnp.asarray(a))))
    np.testing.assert_allclose(float(got), a.sum(), rtol=1e-4)


def test_sum_dims_both_paths(engine):
    a = rand32((16, 32, 16), seed=6)
    res = sreduce_dims(lambda x: x, jnp.add, st.strided(jnp.asarray(a)), (1,))
    np.testing.assert_allclose(
        np.asarray(materialize(res)), a.sum(axis=1, keepdims=True), rtol=1e-5
    )


def test_int_exact_both_paths(engine):
    a = np.random.default_rng(7).integers(-50, 50, (64, 64)).astype(np.int32)
    A = st.strided(jnp.asarray(a))
    res = smap(lambda x, y: x * y + x, A, st.transpose(A))
    np.testing.assert_array_equal(
        np.asarray(materialize(res)), a * a.T + a
    )
