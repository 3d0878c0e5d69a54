"""strided_tpu — a TPU-native strided-array kernel engine and batched
MPC/trajectory-optimization stack.

Brand-new framework with the capabilities of Strided.jl
(`/root/reference`) re-designed for TPU: lazy strided views, a fused
multi-operand map/broadcast/reduce engine lowered through XLA and Pallas,
MXU matmul with α/β semantics, and a shard_map-based multi-chip layer, all
feeding a batched MPC / trajectory-optimization stack.
"""

from .config import Config, get_config, set_config  # noqa: F401
from .core.view import (  # noqa: F401
    StridedView,
    StridedLayoutError,
    strided,
    as_view,
    permutedims,
    transpose,
    adjoint,
    conj,
    sreshape,
    sview,
    flip,
    broadcast_to,
)
from .core.regularize import materialize  # noqa: F401

__version__ = "0.1.0"
