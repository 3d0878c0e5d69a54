from .timing import (  # noqa: F401
    time_fn,
    time_chained,
    time_looped,
    time_slope,
    time_slope_checked,
    time_interleaved,
    bandwidth_gbs,
)
from .checkpoint import save_pytree, load_pytree  # noqa: F401
from .profiling import trace, annotate, Timer  # noqa: F401
