from .timing import time_fn, bandwidth_gbs  # noqa: F401
