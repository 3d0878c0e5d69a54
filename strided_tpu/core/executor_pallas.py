"""Pallas tile-kernel executor for the fused map/reduce engine.

The TPU-native replacement for the reference's ``@generated`` blocked SIMD
kernel + task scheduler (`/root/reference/src/mapreduce.jl:141-425`): instead
of pointer-bump loop nests split over Julia tasks, eligible operations run as
one ``pallas_call`` whose grid tiles the fused iteration space. Reduction
dims become trailing *sequential* grid axes accumulating into the output
block — races are impossible by construction, the same rule as the
reference's cost-zeroing of reduction dims (`/root/reference/src/mapreduce.jl:172-177`)
— and ``initop`` is applied exactly when the reduction grid indices are all
zero, mirroring the first-visit flags of `/root/reference/src/mapreduce.jl:351-423`.

Eligibility (checked by :func:`try_fused_mapreduce`, which returns ``None``
to fall back to the XLA path): every operand must be *exactly nested* (its
physical array is a free reshape of its flat parent — permutes/transposes/
broadcasts of dense arrays), the fused rank must be small, and the problem
must be large enough to amortize kernel launch (the analog of
``MINTHREADLENGTH``, `/root/reference/src/mapreduce.jl:141`).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

from .view import StridedView

# Real implementation lands with the Pallas kernel milestone; the engine is
# fully functional through the XLA path meanwhile.


def try_fused_mapreduce(
    f: Callable,
    op: Optional[Callable],
    initop: Optional[Callable],
    dims: Tuple[int, ...],
    out: StridedView,
    ins: Sequence[StridedView],
) -> Optional[StridedView]:
    return None
