"""Round-2 perf probe: rank-4 permute + transpose ceilings on the real TPU."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import strided_tpu as st
from strided_tpu.core import executor_pallas
from strided_tpu.utils.timing import time_slope_checked

EPS = 1e-30
print("backend:", jax.default_backend(), flush=True)

d = 64
a4 = jnp.asarray(np.random.default_rng(1).standard_normal((d,) * 4), jnp.float32)
perm = (3, 2, 1, 0)

def f_str(x):
    # NOTE (ADVICE r2 item 2): the zeros_like destination is DEAD code here —
    # a full permute copy is a bijective write, and scatter_into's bijection
    # path returns the transposed values directly without ever reading the
    # parent buffer, so XLA DCEs the zero fill. Traffic = 1 read + 1 write,
    # matching f_jnp.
    out = st.strided(jnp.zeros_like(x))
    return st.permutedims_into(out, st.strided(x), perm).parent.reshape(x.shape)

f_jnp = lambda x: jnp.transpose(x, perm) + EPS * x

nbytes = 2 * a4.size * 4

# trigger one dispatch to capture the plan
_ = jax.jit(f_str)(a4).block_until_ready()
print("plan:", executor_pallas.LAST_PLAN, flush=True)

s, note = time_slope_checked(f_str, a4)
print(json.dumps({"w": "perm4_strided", "gbs": nbytes / s / 1e9, "note": note}), flush=True)
s, note = time_slope_checked(f_jnp, a4)
print(json.dumps({"w": "perm4_jnp", "gbs": nbytes / s / 1e9, "note": note}), flush=True)

# 2-D transpose ceiling at matching total size (4096^2 = 64^4)
m = jnp.asarray(np.random.default_rng(2).standard_normal((4096, 4096)), jnp.float32)
f_t = lambda x: jnp.transpose(x) + EPS * x
s, note = time_slope_checked(f_t, m)
print(json.dumps({"w": "transpose2d_4096", "gbs": 2 * m.size * 4 / s / 1e9, "note": note}), flush=True)

# pure stream
f_s = lambda x: x + 1.0
s, note = time_slope_checked(f_s, m)
print(json.dumps({"w": "stream_4096", "gbs": 2 * m.size * 4 / s / 1e9, "note": note}), flush=True)
