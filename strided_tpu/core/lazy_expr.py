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

    __slots__ = ("f", "leaves", "shape", "raw_op", "raw_args")

    def __init__(self, f: Callable, args: Sequence):
        g, leaves = flatten_operands(f, args)
        if not leaves:
            raise ValueError("StridedExpr requires at least one array operand")
        self.f = g
        self.leaves = tuple(leaves)
        self.shape = tuple(jnp.broadcast_shapes(*[v.shape for v in leaves]))
        # Structure retained for pattern dispatch (the closure above erases
        # it): the node's own op and its un-flattened operands. The analog of
        # the reference dispatching `B .= (A .+ A')./2` to a specialized
        # path by looking at the Broadcasted tree, not the fused closure.
        self.raw_op = f
        self.raw_args = tuple(args)

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
        """Collapse into one fused kernel; returns a dense StridedView.

        Structured patterns are recognized first: ``(v + v.T) * alpha`` (in
        any of its spellings) dispatches to the two-pass tile-pair
        symmetrize kernel — 325.9 vs ~265 GB/s for the generic three-pass
        engine at 8192²/f32 (benchmarks/results_tpu_r3.json), because the
        kernel reads A once while the generic engine reads A and A.T as two
        operands. Everything else takes the generic fused path."""
        from .broadcast import sbroadcast

        res = _try_symmetrize(self)
        if res is not None:
            return res
        global LAST_EXPR_DISPATCH
        LAST_EXPR_DISPATCH = "generic"
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


# Observability for tests/benchmarks: which path the last evaluate() took
# ("symmetrize-kernel" or "generic"). Trace-time global, same caveats as
# executor_pallas.LAST_PLAN.
LAST_EXPR_DISPATCH: str = ""


def _python_scalar(x):
    """A compile-time scalar the pattern dispatch may bake statically: plain
    Python/numpy numbers only — tracers and 0-d arrays stay dynamic and
    disqualify the pattern (the generic path handles them)."""
    import numbers

    if isinstance(x, bool) or not isinstance(x, numbers.Real):
        return None
    return float(x)


def _match_transpose_pair(a, b):
    """Both operands 2-D square views of the SAME dense buffer, one the lazy
    transpose of the other, offsets 0 — i.e. ``v`` and ``v.T`` in either
    order. Returns the (n, n) row-major parent array or None."""
    if not (isinstance(a, StridedView) and isinstance(b, StridedView)):
        return None
    if a.conj or b.conj or a.ndim != 2 or b.ndim != 2:
        return None
    n = a.shape[0]
    if a.shape != (n, n) or b.shape != (n, n) or n == 0:
        return None
    if a.parent is not b.parent or a.offset != 0 or b.offset != 0:
        return None
    row_major = (n, 1)
    col_major = (1, n)
    if {a.strides, b.strides} != {row_major, col_major}:
        return None
    if int(a.parent.shape[0]) != n * n:
        return None
    return a.parent.reshape(n, n)


def _try_symmetrize(expr: "StridedExpr"):
    """Recognize ``(v + v.T) * alpha`` / ``(v + v.T) / s`` / ``v + v.T`` and
    run the dedicated tile-pair kernel. Returns a StridedView or None."""
    alpha = None
    add_node = None
    op = expr.raw_op
    args = expr.raw_args
    if op is jnp.add:
        alpha, add_node = 1.0, expr
    elif op is jnp.multiply and len(args) == 2:
        for s, e in (args, args[::-1]):
            sc = _python_scalar(s)
            if sc is not None and isinstance(e, StridedExpr):
                alpha, add_node = sc, e
                break
    elif op is jnp.true_divide and len(args) == 2:
        sc = _python_scalar(args[1])
        if sc not in (None, 0.0) and isinstance(args[0], StridedExpr):
            alpha, add_node = 1.0 / sc, args[0]
    if add_node is None or alpha is None:
        return None
    if add_node is not expr and add_node.raw_op is not jnp.add:
        return None
    aargs = add_node.raw_args
    if len(aargs) != 2:
        return None
    parent2d = _match_transpose_pair(*aargs)
    if parent2d is None:
        return None
    if str(parent2d.dtype) not in ("float32", "bfloat16"):
        return None

    from ..config import get_config

    cfg = get_config()
    n = parent2d.shape[0]
    if not (cfg.use_pallas and cfg.expr_pattern_dispatch):
        return None
    if n * n < cfg.min_pallas_elements:
        return None
    tile = next((t for t in (512, 256, 128) if n % t == 0), None)
    if tile is None:
        return None

    from .kernels_special import symmetrize

    global LAST_EXPR_DISPATCH
    LAST_EXPR_DISPATCH = "symmetrize-kernel"
    import logging

    logging.getLogger("strided_tpu.dispatch").debug(
        "evaluate: (v + v.T) * %g -> symmetrize tile-pair kernel (n=%d, tile=%d)",
        alpha, n, tile,
    )
    return strided(symmetrize(parent2d, tile=tile, alpha=alpha))


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
