"""@strided-analog decorator tests — mirroring the reference macro tests
(`/root/reference/test/othertests.jl:130-190`): composition of views,
reshapes, transposes and broadcasts inside one annotated function; non-array
structure passes through unharmed; type-stability becomes
"no-recompile-on-same-layout" assertions (SURVEY.md §4 transfer rule 5)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import strided_tpu as st
from strided_tpu import strided_jit, to_array


def test_strided_jit_symmetrize():
    a = np.random.default_rng(0).standard_normal((32, 32))

    @strided_jit
    def symmetrize(x):
        return (x + st.transpose(x)) / 2

    out = symmetrize(jnp.asarray(a))
    assert isinstance(out, jax.Array)
    np.testing.assert_allclose(np.asarray(out), (a + a.T) / 2, rtol=1e-14)


def test_strided_jit_view_reshape_compose():
    # view + reshape + broadcast compose (othertests.jl:130-190)
    a = np.random.default_rng(1).standard_normal((4, 6))

    @strided_jit
    def f(x):
        y = st.sview(x, np.s_[0:2, :])        # (2, 6)
        z = st.sreshape(y, (3, 4))            # stride-preserving reshape
        return z + 1.0

    np.testing.assert_allclose(
        np.asarray(f(jnp.asarray(a))), a[0:2, :].reshape(3, 4) + 1.0, rtol=1e-14
    )


def test_strided_jit_nonarray_passthrough():
    @strided_jit
    def f(x, flag):
        # dict structure and scalars pass through
        return {"res": x * 2.0, "meta": flag}

    out = f(jnp.ones((3, 3)), 7)
    assert out["meta"] == 7
    np.testing.assert_allclose(np.asarray(out["res"]), 2 * np.ones((3, 3)))


def test_no_recompile_same_layout():
    traces = 0

    @strided_jit
    def f(x):
        nonlocal traces
        traces += 1
        return st.transpose(x) * 2.0

    a = jnp.ones((8, 8))
    f(a)
    f(a + 1)
    assert traces == 1  # same shape/layout: cached
    f(jnp.ones((4, 4)))
    assert traces == 2  # new shape: one retrace


def test_to_array_dtype_convert():
    v = st.strided(jnp.arange(6, dtype=jnp.int32).reshape(2, 3))
    arr = to_array(st.transpose(v), dtype=jnp.float64)
    assert arr.dtype == jnp.float64
    np.testing.assert_array_equal(
        np.asarray(arr), np.arange(6).reshape(2, 3).T.astype(np.float64)
    )


def test_strided_view_args_accepted():
    @strided_jit
    def f(v):
        return st.sreduce(lambda x: x, jnp.add, v)

    a = np.random.default_rng(2).standard_normal((5, 5))
    got = f(st.transpose(st.strided(jnp.asarray(a))))
    np.testing.assert_allclose(float(got), a.sum(), rtol=1e-12)
