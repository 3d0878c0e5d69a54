"""Lazy expression-tree fusion — the Broadcasted-analog contract.

The reference fuses an entire dot-expression into one kernel call
(`/root/reference/src/broadcast.jl:27-37`; flagship example
`/root/reference/README.md:101-105` — the 4-permute sum runs without
temporaries). These tests pin the same contract: operator chains on
StridedViews build a StridedExpr and collapse into exactly ONE
fused_mapreduce call at consumption.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import strided_tpu as st
from strided_tpu import StridedExpr
from strided_tpu.core import mapreduce as mr


def rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float64)


def test_operators_build_lazy_exprs():
    v = st.strided(jnp.ones((4, 4)))
    e = (v + st.transpose(v)) / 2
    assert isinstance(e, StridedExpr)
    assert e.shape == (4, 4)
    assert len(e.leaves) == 2  # flattened: one level, all leaves inline


def test_expr_tree_flattens_nested():
    v = st.strided(jnp.ones((4, 4)))
    e = ((v + v) * (v - v)) + v
    assert isinstance(e, StridedExpr)
    assert len(e.leaves) == 5


def test_whole_tree_is_one_engine_call(monkeypatch):
    calls = []
    orig = mr.fused_mapreduce

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(mr, "fused_mapreduce", spy)
    # broadcast.py imported fused_mapreduce by value; patch there too
    from strided_tpu.core import broadcast as bc

    monkeypatch.setattr(bc, "fused_mapreduce", spy)

    a = rand((32, 32), 1)
    v = st.strided(jnp.asarray(a))
    e = (v + st.transpose(v)) * 0.5 - abs(-v)
    out = np.asarray(e)
    assert len(calls) == 1
    np.testing.assert_allclose(out, (a + a.T) * 0.5 - np.abs(a), rtol=1e-14)


def test_4permute_sum_fused_correct():
    d = 6
    a = rand((d, d, d, d), 2)
    v = st.strided(jnp.asarray(a))
    perms = [(1, 2, 3, 0), (2, 3, 0, 1), (3, 0, 1, 2), (0, 1, 2, 3)]
    e = (
        st.permutedims(v, perms[0])
        + st.permutedims(v, perms[1])
        + st.permutedims(v, perms[2])
        + st.permutedims(v, perms[3])
    )
    assert isinstance(e, StridedExpr) and len(e.leaves) == 4
    oracle = sum(a.transpose(p) for p in perms)
    np.testing.assert_allclose(np.asarray(e), oracle, rtol=1e-14)


def test_expr_into_reduction_fuses():
    a = rand((16, 16), 3)
    v = st.strided(jnp.asarray(a))
    e = (v + st.transpose(v)) / 2
    s = st.sreduce(lambda x: x, jnp.add, e)
    np.testing.assert_allclose(float(s), ((a + a.T) / 2).sum(), rtol=1e-12)
    sd = st.sreduce_dims(lambda x: x, jnp.add, e, 1)
    np.testing.assert_allclose(
        np.asarray(st.materialize(sd)).ravel(), ((a + a.T) / 2).sum(1), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(e.sum()), ((a + a.T) / 2).sum(), rtol=1e-12)


def test_expr_as_sbroadcast_argument():
    a = rand((8, 8), 4)
    v = st.strided(jnp.asarray(a))
    e = v * 2.0
    r = st.sbroadcast(jnp.add, e, v)
    np.testing.assert_allclose(np.asarray(st.materialize(r)), 3 * a, rtol=1e-14)


def test_expr_in_map_into_and_smap():
    a = rand((8, 8), 5)
    v = st.strided(jnp.asarray(a))
    e = v + 1.0
    out = st.strided(jnp.zeros((8, 8)))
    res = st.map_into(out, lambda x: 2 * x, e)
    np.testing.assert_allclose(
        np.asarray(res.parent).reshape(8, 8), 2 * (a + 1), rtol=1e-14
    )
    r2 = st.smap(lambda x, y: x + y, e, v)
    np.testing.assert_allclose(
        np.asarray(st.materialize(r2)), 2 * a + 1, rtol=1e-14
    )


def test_scalar_and_raw_array_operands():
    a = rand((5, 7), 6)
    b = rand((5, 7), 7)
    v = st.strided(jnp.asarray(a))
    e = 3.0 * v + jnp.asarray(b)  # scalar embeds; raw array becomes a leaf
    assert isinstance(e, StridedExpr) and len(e.leaves) == 2
    np.testing.assert_allclose(np.asarray(e), 3 * a + b, rtol=1e-14)


def test_expr_dtype_promotion():
    v = st.strided(jnp.ones((3, 3), jnp.float32))
    w = st.strided(jnp.ones((3, 3), jnp.float64))
    assert (v + w).dtype == jnp.float64
    assert (v < w).dtype == jnp.bool_


def test_strided_jit_returns_dense_from_expr():
    a = rand((16, 16), 8)

    @st.strided_jit
    def f(x):
        return (x + st.transpose(x)) / 2  # returns a StridedExpr inside

    out = f(jnp.asarray(a))
    assert isinstance(out, jax.Array)
    np.testing.assert_allclose(np.asarray(out), (a + a.T) / 2, rtol=1e-14)


def test_broadcasting_inside_expr():
    a = rand((4, 6), 9)
    row = rand((6,), 10)
    e = st.strided(jnp.asarray(a)) + st.strided(jnp.asarray(row))
    assert e.shape == (4, 6)
    np.testing.assert_allclose(np.asarray(e), a + row, rtol=1e-14)
