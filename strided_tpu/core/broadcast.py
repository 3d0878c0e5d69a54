"""Broadcast front-end: numpy-style broadcasting lowered into one fused call.

Analog of the reference's broadcast integration
(`/root/reference/src/broadcast.jl`): where Julia's dot-syntax builds a
``Broadcasted`` tree that ``copyto!`` flattens into a ``CaptureArgs`` closure
over the strided leaves (`/root/reference/src/broadcast.jl:27-98`), here JAX
tracing *is* the fusion mechanism — the user hands us ``f`` directly and we
lower every operand into the iteration space with the same stride-0
promotion trick as the reference's ``promoteshape``
(`/root/reference/src/broadcast.jl:50-65`): size-1 (or missing leading) dims
get stride 0, so the kernel revisits the same element instead of copying.

Scalar (non-array) arguments are closed over in argument order, mirroring
``CaptureArgs``/``Arg`` consumption (`/root/reference/src/broadcast.jl:67-98`).

Python operators on :class:`StridedView` (``+ - * / **
 comparisons``) route
through :func:`sbroadcast`, giving the reference's ``@strided B .= ...``
experience without a macro.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .view import StridedView, StridedLayoutError, strided, broadcast_to
from .mapreduce import fused_mapreduce
from .regularize import materialize
from .lazy_expr import StridedExpr, flatten_operands, _install_operators

__all__ = ["sbroadcast", "sbroadcast_into", "broadcast_views", "StridedExpr"]


def _broadcast_shape(*shapes):
    try:
        return jnp.broadcast_shapes(*shapes)
    except ValueError as e:
        # the engine's documented error type for layout/shape violations
        # (mirrors the reference's eager DimensionMismatch throws,
        # `/root/reference/src/broadcast.jl:61`)
        raise StridedLayoutError(
            f"operand shapes are not broadcast-compatible: {shapes}"
        ) from e


def broadcast_views(shape, views):
    """Promote each view to ``shape`` with stride-0 broadcast dims
    (``promoteshape``, `/root/reference/src/broadcast.jl:50-65`)."""
    out = []
    for v in views:
        if v.shape == tuple(shape):
            out.append(v)
        else:
            # prepend size-1 dims, then stride-0 broadcast
            if v.ndim < len(shape):
                v = StridedView(
                    v.parent,
                    (1,) * (len(shape) - v.ndim) + v.shape,
                    (0,) * (len(shape) - v.ndim) + v.strides,
                    v.offset,
                    v.conj,
                )
            out.append(broadcast_to(v, shape))
    return out


def sbroadcast(f: Callable, *args) -> StridedView:
    """Allocating fused broadcast: ``f.(args...)`` in reference terms.

    Args may be views, lazy :class:`StridedExpr` trees (their leaves are
    inlined — the whole composed expression runs as ONE kernel), dense
    arrays, or scalars (closed over in argument order, the ``CaptureArgs``
    analog, `/root/reference/src/broadcast.jl:67-98`)."""
    g, views = flatten_operands(f, args)
    if not views:
        return strided(jnp.asarray(f(*args)))
    shape = _broadcast_shape(*[v.shape for v in views])
    bviews = broadcast_views(shape, views)
    # Result dtype via abstract eval on scalars.
    scal = [jax.ShapeDtypeStruct((), v.dtype) for v in views]
    rdt = jax.eval_shape(g, *scal).dtype
    out = strided(jnp.zeros(shape, rdt))
    if math.prod(shape) == 0:
        return out
    return fused_mapreduce(g, None, None, shape, out, bviews)


def sbroadcast_into(out, f: Callable, *args) -> StridedView:
    """In-place fused broadcast: ``out .= f.(args...)``. Identity writes of
    a pattern-matching lazy expression (``v.at[:].set(w + w.T)``) route
    through the tile-pair kernel (see ``lazy_expr.try_pattern_into``)."""
    from .lazy_expr import try_pattern_into

    out = out if isinstance(out, StridedView) else strided(out)
    hit = try_pattern_into(out, f, args)
    if hit is not None:
        return hit
    g, views = flatten_operands(f, args)
    shape = tuple(out.shape)
    bshape = _broadcast_shape(shape, *[v.shape for v in views])
    if tuple(bshape) != shape:
        raise StridedLayoutError(
            f"broadcast result shape {bshape} does not match output {shape}"
        )
    bviews = broadcast_views(shape, views)
    if math.prod(shape) == 0:
        return out
    return fused_mapreduce(g, None, None, shape, out, bviews)


# ---------------------------------------------------------------------------
# operator overloads on StridedView: LAZY — they build a StridedExpr tree
# that any consumer collapses into one fused kernel, exactly like the
# reference's dot-syntax building a Broadcasted tree
# (`/root/reference/src/broadcast.jl:27-37`).
# ---------------------------------------------------------------------------

_install_operators(StridedView)
from .lazy_expr import _install_reductions  # noqa: E402

_install_reductions(StridedView)
StridedView.__array__ = lambda self, dtype=None: np.asarray(
    materialize(self), dtype=dtype
)
