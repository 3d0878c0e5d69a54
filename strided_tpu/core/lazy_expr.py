"""Lazy fused-broadcast expression trees — the ``Broadcasted`` analog.

In the reference, Julia's dot-syntax builds a ``Broadcasted`` tree that the
``copyto!`` overload flattens into ONE fused kernel over all strided leaves
(`/root/reference/src/broadcast.jl:27-98`): ``B .= (A .+ A') ./ 2`` touches
HBM exactly twice no matter how many operators appear. Eager pairwise
operators would instead materialize a dense intermediate per node — the very
temporaries the reference exists to eliminate (`/root/reference/README.md:101-105`).

:class:`StridedExpr` restores that contract on TPU: Python operators on
:class:`StridedView` (and on expressions) return a lazy node that records the
elementwise function and its operand *leaves*; nested nodes are flattened at
construction (the ``CaptureArgs``/``consume`` walk of
`/root/reference/src/broadcast.jl:67-98`, done once per node instead of once
per call). Any consumption — ``materialize``/``np.asarray``, ``sbroadcast``
composition, a reduction, or a ``strided_jit`` return — collapses the whole
tree into a single ``fused_mapreduce`` over all leaves.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .view import StridedView, strided

__all__ = ["StridedExpr", "flatten_operands", "as_expr_parts"]


def flatten_operands(f: Callable, args: Sequence) -> Tuple[Callable, List[StridedView]]:
    """Flatten mixed (views / expressions / arrays / scalars) operands.

    Returns ``(g, leaves)`` where ``leaves`` are :class:`StridedView`s and
    ``g(*dense_leaf_values)`` evaluates ``f`` with scalars embedded and child
    expressions recursively applied — one composed elementwise closure for
    the entire tree."""
    leaves: List[StridedView] = []
    getters = []
    for a in args:
        if isinstance(a, StridedExpr):
            start = len(leaves)
            leaves.extend(a.leaves)
            getters.append(
                lambda vals, s=start, n=len(a.leaves), cf=a.f: cf(*vals[s : s + n])
            )
        elif isinstance(a, StridedView):
            idx = len(leaves)
            leaves.append(a)
            getters.append(lambda vals, i=idx: vals[i])
        elif isinstance(a, (jax.Array, np.ndarray)) and getattr(a, "ndim", 0) > 0:
            idx = len(leaves)
            leaves.append(strided(jnp.asarray(a)))
            getters.append(lambda vals, i=idx: vals[i])
        else:  # python / 0-d scalar: embed in the closure (CaptureArgs-style)
            getters.append(lambda vals, a=a: a)

    def g(*vals):
        return f(*[get(vals) for get in getters])

    return g, leaves


def as_expr_parts(x) -> Tuple[Callable, List[StridedView], Tuple[int, ...]]:
    """``(f, leaves, shape)`` for a view or expression — the uniform input
    contract for fusing consumers (reductions, in-place assignment)."""
    if isinstance(x, StridedExpr):
        return x.f, list(x.leaves), x.shape
    v = x if isinstance(x, StridedView) else strided(jnp.asarray(x))
    return (lambda a: a), [v], v.shape


class StridedExpr:
    """A lazy elementwise expression over strided-view leaves.

    ``f`` consumes one dense array per leaf (already broadcast to ``shape``)
    and returns the elementwise result. Construction flattens child
    expressions so the tree is always exactly one level deep."""

    __slots__ = ("f", "leaves", "shape")

    def __init__(self, f: Callable, args: Sequence):
        g, leaves = flatten_operands(f, args)
        if not leaves:
            raise ValueError("StridedExpr requires at least one array operand")
        self.f = g
        self.leaves = tuple(leaves)
        self.shape = tuple(jnp.broadcast_shapes(*[v.shape for v in leaves]))

    # -- introspection -----------------------------------------------------
    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def size(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    @property
    def dtype(self):
        out = jax.eval_shape(
            self.f, *[jax.ShapeDtypeStruct((), v.dtype) for v in self.leaves]
        )
        return out.dtype

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return (
            f"StridedExpr(shape={self.shape}, nleaves={len(self.leaves)}, "
            f"dtype={self.dtype})"
        )

    # -- consumption -------------------------------------------------------
    def evaluate(self) -> StridedView:
        """Collapse into one fused kernel; returns a dense StridedView."""
        from .broadcast import sbroadcast

        return sbroadcast(self.f, *self.leaves)

    def materialize(self) -> jax.Array:
        from .regularize import materialize

        return materialize(self.evaluate())

    def __array__(self, dtype=None):
        return np.asarray(self.materialize(), dtype=dtype)

    # -- reductions fuse through the tree ---------------------------------
    def sum(self, axis=None):
        from .mapreduce import sreduce, sreduce_dims

        if axis is None:
            return sreduce(lambda x: x, jnp.add, self)
        return sreduce_dims(lambda x: x, jnp.add, self, axis)


def _expr_binop(f):
    def fwd(self, other):
        return StridedExpr(f, (self, other))

    def rev(self, other):
        return StridedExpr(f, (other, self))

    return fwd, rev


def _install_operators(cls):
    """Install lazy operator overloads on ``cls`` (StridedView and
    StridedExpr share the exact same operator surface)."""
    for name, fn in [
        ("add", jnp.add),
        ("sub", jnp.subtract),
        ("mul", jnp.multiply),
        ("truediv", jnp.true_divide),
        ("pow", jnp.power),
        ("mod", jnp.mod),
    ]:
        fwd, rev = _expr_binop(fn)
        setattr(cls, f"__{name}__", fwd)
        setattr(cls, f"__r{name}__", rev)
    for name, fn in [
        ("lt", jnp.less),
        ("le", jnp.less_equal),
        ("gt", jnp.greater),
        ("ge", jnp.greater_equal),
    ]:
        setattr(cls, f"__{name}__", _expr_binop(fn)[0])
    cls.__neg__ = lambda self: StridedExpr(jnp.negative, (self,))
    cls.__abs__ = lambda self: StridedExpr(jnp.abs, (self,))


_install_operators(StridedExpr)
