from .mesh import make_mesh, data_sharding, replicated, P  # noqa: F401
from .sharded import (  # noqa: F401
    shard_batch,
    sharded_rollout,
    sharded_mpc_step,
    scenario_consensus_control,
)
from .tp import matmul_nsplit, matmul_msplit, matmul_ksplit  # noqa: F401
from .engine import (  # noqa: F401
    choose_split_dim,
    sharded_smap,
    sharded_reduce,
    sharded_batched_pair,
    sharded_stream_sum,
)
from .dist import init_distributed  # noqa: F401
