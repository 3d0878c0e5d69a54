"""Round benchmark: quadrotor condensed-QP MPC solves/s on the local chip(s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s/chip", "vs_baseline": N}

Baseline (BASELINE.md): >= 10,000 solves/s on a v5e-8 for the 12-state,
horizon-50, box-constrained quadrotor MPC => 1250 solves/s/chip.
``vs_baseline`` is value / 1250 (>1 means beating the per-chip target).

The JSON line is GATED (VERDICT r2 items 1/6): before printing, the script
asserts (a) the ON-DEVICE accuracy of the exact headline configuration
(ADMM-6 at rho=8, f32: first applied input within 1e-4 of a converged f64
oracle AND horizon plan within 0.15 — the same bounds tests/test_mpc.py
pins on CPU; the (rho, iters) operating point is the measured accuracy
frontier with 3.4x plan-gate margin and closed-loop regulation identical
to rho=1/k=20, results_tpu_r5.json admm_operating_point) and (b)
Mosaic-COMPILED Pallas
kernels agree with the XLA path on a scrambled-layout map, an initop
reduction, and the symmetrize kernel. A failed gate raises — no JSON.

Extra diagnostic metrics (fused permute+reduce bandwidth vs HBM roofline,
batched rollout throughput, iLQR/Riccati f32-TPU vs f64-CPU deviations) go
to stderr so the one-line contract holds.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# f64 is used ONLY inside scoped `with jax.enable_x64(True)` blocks running
# CPU-side oracles; the TPU compute path (and every Pallas kernel) stays
# f32/bf16 — a global x64 flag would leak 64-bit scalars into Mosaic
# lowering, which does not support them.

PER_CHIP_TARGET = 10_000 / 8  # BASELINE.md: 10k solves/s on v5e-8


from strided_tpu.utils.timing import time_fn, time_chained, time_slope  # noqa: E402


def bench_mpc_solves(batch=16384, horizon=50, admm_iters=6, rho=8.0):
    # batch 16384 sits at the measured throughput knee (re-swept r5 at the
    # tuned operating point, results_tpu_r5.json admm_operating_point:
    # 16384->29.5M, 32768->26.5M, 65536->21.7M, 131072->14.9M); the
    # (rho=8, k=6) solver config is the measured accuracy frontier — see
    # bench_mpc_accuracy.
    from strided_tpu.models import quadrotor, hover_state, hover_input
    from strided_tpu.mpc import make_hover_mpc

    dt = 0.02
    dtype = jnp.float32
    model = quadrotor()
    Q = jnp.diag(jnp.array([10, 10, 10, 1, 1, 1, 5, 5, 5, 1, 1, 1], dtype))
    R = jnp.eye(4, dtype=dtype) * 0.1
    ctrl = make_hover_mpc(
        model, hover_state(dtype), hover_input(dtype=dtype), Q, R, Q,
        horizon=horizon, dt=dt,
        u_min=jnp.array([-5.0, -0.5, -0.5, -0.5], dtype),
        u_max=jnp.array([10.0, 0.5, 0.5, 0.5], dtype),
        admm_iters=admm_iters, rho=rho,
    )

    @jax.jit
    def step(x):
        u, _ = ctrl.control(x)
        return model.step(x, u, dt)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (batch, 12)), dtype)
    # slope timing: closed-loop steps chained inside one program at two loop
    # lengths; the difference cancels the ~25 ms/dispatch tunnel overhead.
    # Long loops: at the tuned operating point a batch runs ~0.6 ms, inside
    # the band where short loops carry multi-percent jitter (CLAUDE.md rule)
    sec = time_slope(step, x, k1=16, k2=80)
    solves_per_s = batch / sec
    # sanity: controller regulates (finite outputs)
    assert np.isfinite(np.asarray(step(x))).all()
    return solves_per_s, sec


def bench_symmetrize_bandwidth(n=8192):
    """Fused symmetrize B = (A + A')/2 — benchmark #1 family; reports GB/s
    for THREE paths: the dedicated tile-pair Pallas kernel
    (``symmetrize_kernel_gbs``), the flagship lazy expression
    ``(A + A.T) * 0.5`` through the public API (which the structured
    pattern dispatch routes to the same kernel — the number the reference's
    flagship workload actually measures), and the generic three-pass engine
    with the pattern dispatch disabled (the fallback every non-matching
    expression takes)."""
    import strided_tpu as st
    from strided_tpu.config import set_config, get_config

    a = jnp.asarray(np.random.default_rng(1).standard_normal((n, n)), jnp.float32)
    nbytes = a.size * 4 * 2  # one fused read of A + one write
    sec_k = time_slope(lambda x: st.symmetrize(x, tile=512), a, k1=8, k2=40)

    def engine(x):
        v = st.strided(x)
        return st.to_array((v + st.transpose(v)) * 0.5)

    sec_e = time_slope(engine, a, k1=8, k2=40)
    old = get_config()
    try:
        set_config(expr_pattern_dispatch=False)
        sec_g = time_slope(engine, a, k1=8, k2=40)
    finally:
        set_config(expr_pattern_dispatch=old.expr_pattern_dispatch)
    return nbytes / sec_k / 1e9, nbytes / sec_e / 1e9, nbytes / sec_g / 1e9


def bench_symmetrize_flagship_size(n=4000):
    """The reference's LITERAL #1 benchmark size — 4000x4000, NOT divisible
    by any kernel tile (`/root/reference/README.md:69-73`; VERDICT r3 item
    1): the edge-tile-clamped pair kernel must both dispatch and hold its
    bandwidth. Asserts the dispatch path on-device, bit-exact vs the plain
    XLA expression, then reports GB/s through the public expression API."""
    import strided_tpu as st
    from strided_tpu.core import lazy_expr as le
    from strided_tpu.config import set_config, get_config

    a = jnp.asarray(np.random.default_rng(4).standard_normal((n, n)), jnp.float32)
    v = st.strided(a)
    le.LAST_EXPR_DISPATCH = ""
    got = ((v + st.transpose(v)) / 2).materialize()
    assert le.LAST_EXPR_DISPATCH == "pair-kernel", (
        f"4000^2 flagship did not dispatch to the pair kernel "
        f"(path={le.LAST_EXPR_DISPATCH!r})"
    )
    want = jax.jit(lambda x: (x + x.T) / 2)(a)
    dev = float(jnp.max(jnp.abs(got - want)))  # on-device compare, scalar fetch
    assert dev == 0.0, f"flagship kernel mismatch vs XLA: {dev}"

    def engine(x):
        v = st.strided(x)
        return st.to_array((v + st.transpose(v)) / 2)

    # 64 MB arrays run ~230 us/step: k must be large enough that the loop-
    # length delta (~30 ms at k2-k1=128) dwarfs the tunnel's queue jitter —
    # at k2=40 the small-size slope can swing by 2x (r4 measurement note in
    # DESIGN.md).
    nbytes = a.size * 4 * 2
    sec = time_slope(engine, a, k1=32, k2=160)
    return nbytes / sec / 1e9


def bench_mpc_accuracy(batch=64, horizon=50, admm_iters=6, rho=8.0):
    """Accuracy of the EXACT bench configuration (ADMM-``admm_iters``, f32,
    rho=1) against a converged f64 numpy ADMM oracle on the same QP — the
    tolerance attached to the solves/s headline. Pinned by
    ``tests/test_mpc.py::test_bench_config_accuracy``. The default
    (rho=8, k=6) is the measured accuracy frontier (r5,
    results_tpu_r5.json admm_operating_point): rho=1 was under-tuned — at
    rho=8 the first-input dev sits at the f32 floor (1.6e-5) and the plan
    gate passes with 3.4x margin at just 6 iterations, while closed-loop
    regulation is identical to rho=1/k=20 (traj cost 34.509 both).

    Returns ``(max_abs_dev, u_scale)``: worst |U_20 - U*| over the horizon
    plan and the input magnitude scale for context."""
    from strided_tpu.models import quadrotor, hover_state, hover_input
    from strided_tpu.mpc import make_hover_mpc

    dt = 0.02
    dtype = jnp.float32
    model = quadrotor()
    Q = jnp.diag(jnp.array([10, 10, 10, 1, 1, 1, 5, 5, 5, 1, 1, 1], dtype))
    R = jnp.eye(4, dtype=dtype) * 0.1
    u_min = jnp.array([-5.0, -0.5, -0.5, -0.5], dtype)
    u_max = jnp.array([10.0, 0.5, 0.5, 0.5], dtype)
    ctrl = make_hover_mpc(
        model, hover_state(dtype), hover_input(dtype=dtype), Q, R, Q,
        horizon=horizon, dt=dt, u_min=u_min, u_max=u_max,
        admm_iters=admm_iters, rho=rho,
    )
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.3, 0.3, (batch, 12)), dtype)
    U20 = np.asarray(jax.jit(ctrl.plan)(x), np.float64)  # (batch, N, m)

    # numpy f64 oracle: the same over-relaxed ADMM run to convergence on the
    # same QP data (mpc/qp.py::qp_solve), all in float64
    qp = ctrl.qp
    dx = np.asarray(x, np.float64) - np.asarray(ctrl.x_eq, np.float64)
    H = np.asarray(qp.H, np.float64)
    Mm = np.asarray(qp.M, np.float64)
    K = np.asarray(qp.K_lqr, np.float64)
    rho, alpha = qp.rho, 1.6
    Hinv = np.linalg.inv(H + rho * np.eye(H.shape[0]))
    lo = np.tile(np.asarray(u_min, np.float64), qp.N)
    hi = np.tile(np.asarray(u_max, np.float64), qp.N)
    g = dx @ Mm.T
    z = np.clip(-dx @ K.T, lo, hi)
    y = np.zeros_like(z)
    for _ in range(2000):
        u = (rho * (z - y) - g) @ Hinv
        u_rel = alpha * u + (1 - alpha) * z
        z = np.clip(u_rel + y, lo, hi)
        y = y + u_rel - z
    U_star = z.reshape(batch, qp.N, qp.m)
    dev_first = float(np.max(np.abs(U20[:, 0] - U_star[:, 0])))
    dev_plan = float(np.max(np.abs(U20 - U_star)))
    return dev_first, dev_plan, float(np.max(np.abs(U_star)))


def bench_smoke():
    """Exact-comparison checks of Mosaic-COMPILED Pallas kernels vs the XLA
    path (VERDICT r2 weak #5: off-TPU all kernel tests run in interpret mode;
    this is the only place the compiled path is pinned). Raises on mismatch.

    Covers: (1) a scrambled-layout map (the production tile-engine path),
    (2) an initop partial reduction (first-visit-β machinery) in int32 so the
    comparison is exact, (3) the two-pass symmetrize kernel."""
    import strided_tpu as st
    from strided_tpu.config import set_config, get_config
    from strided_tpu.core.mapreduce import permutedims_into, mapreducedim_into
    from strided_tpu.core.view import strided as as_view, broadcast_to

    from strided_tpu.core import executor_pallas

    old = get_config()
    checks = []
    try:
        # --- 1. scrambled map: transpose-copy through the tile engine ---
        a = jnp.asarray(
            np.random.default_rng(7).standard_normal((512, 384)), jnp.float32
        )
        set_config(use_pallas=True, min_pallas_elements=1024, pair_kernel_min_elements=1024, pallas_map_min_elements=1024)
        executor_pallas.LAST_PLAN.clear()

        @jax.jit
        def tcopy(a):
            out = as_view(jnp.zeros((384, 512), jnp.float32))
            return st.to_array(permutedims_into(out, as_view(a), (1, 0)))

        got = np.asarray(tcopy(a))
        assert executor_pallas.LAST_PLAN, "transpose-copy did not take the Pallas path"
        assert (got == np.asarray(a).T).all(), "compiled tile-engine transpose-copy mismatch"
        checks.append("scrambled-map")

        # --- 2. initop reduction (exact int32): out = 3*old + sum(in, axis 0) ---
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.integers(-9, 9, (512, 256)), jnp.int32)
        old_out = jnp.asarray(rng.integers(-9, 9, (1, 256)), jnp.int32)
        set_config(use_pallas=True, pallas_reductions=True, min_pallas_elements=1024, pair_kernel_min_elements=1024)
        executor_pallas.LAST_PLAN.clear()

        @jax.jit
        def red(x, old_out):
            ov = broadcast_to(as_view(old_out), (512, 256))
            res = mapreducedim_into(lambda v: v, jnp.add, lambda o: 3 * o, ov, as_view(x))
            return res.parent

        got = np.asarray(red(x, old_out)).reshape(1, 256)
        assert executor_pallas.LAST_PLAN, "initop reduction did not take the Pallas path"
        want = 3 * np.asarray(old_out) + np.asarray(x).sum(axis=0, keepdims=True)
        assert (got == want).all(), "compiled initop-reduction mismatch"
        checks.append("initop-reduce")

        # --- 3. symmetrize tile-pair kernel vs plain XLA expression ---
        set_config(use_pallas=True)
        b = jnp.asarray(
            np.random.default_rng(9).standard_normal((1024, 1024)), jnp.float32
        )
        got = np.asarray(st.symmetrize(b, tile=256))
        want = np.asarray(jax.jit(lambda b: (b + b.T) * 0.5)(b))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
        checks.append("symmetrize")
    finally:
        set_config(**{name: getattr(old, name) for name in old.__dataclass_fields__})
    return checks


def bench_ilqr_accuracy(T=40, iters=15):
    """Cartpole iLQR f32 on the default (TPU) backend vs the same sweep in
    f64 on the CPU backend — the control-trajectory tolerance line BASELINE.md
    asks for (VERDICT r2 item 7)."""
    from strided_tpu.models import cartpole
    from strided_tpu.mpc import QuadCost, ilqr

    dt = 0.05

    def run(dtype, device=None):
        model = cartpole()
        cost = QuadCost(
            Q=jnp.diag(jnp.array([1.0, 10.0, 0.1, 0.1], dtype)),
            R=jnp.eye(1, dtype=dtype) * 0.01,
            Qf=jnp.diag(jnp.array([10.0, 100.0, 1.0, 1.0], dtype)),
            x_goal=jnp.array([0.0, np.pi, 0.0, 0.0], dtype),
        )
        x0 = jnp.zeros(4, dtype)
        us0 = jnp.asarray(
            np.random.default_rng(3).standard_normal((T, 1)) * 0.05, dtype
        )
        fn = lambda x, u: ilqr(model, cost, x, u, dt, iters=iters)
        if device is not None:
            with jax.default_device(device):
                res = jax.jit(fn)(jax.device_put(x0, device), jax.device_put(us0, device))
                return np.asarray(res.us, np.float64), float(res.cost)
        res = jax.jit(fn)(x0, us0)
        return np.asarray(res.us, np.float64), float(res.cost)

    us32, c32 = run(jnp.float32)  # default backend (TPU when available)
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True):
        us64, c64 = run(jnp.float64, cpu)
    return float(np.max(np.abs(us32 - us64))), float(np.max(np.abs(us64))), c32, c64


def bench_riccati_accuracy(N=50):
    """Riccati LQR gain f32-TPU vs f64-CPU for the quadrotor hover system."""
    from strided_tpu.models import quadrotor, hover_state, hover_input
    from strided_tpu.mpc import lqr_gains

    def run(dtype, device=None):
        model = quadrotor()
        A, B = model.linearize(hover_state(dtype), hover_input(dtype=dtype), 0.02)
        Q = jnp.diag(jnp.array([10, 10, 10, 1, 1, 1, 5, 5, 5, 1, 1, 1], dtype))
        R = jnp.eye(4, dtype=dtype) * 0.1
        fn = lambda a, b: lqr_gains(a, b, Q, R, Q, N)[0]
        if device is not None:
            with jax.default_device(device):
                Ks = jax.jit(fn)(jax.device_put(A, device), jax.device_put(B, device))
        else:
            Ks = jax.jit(fn)(A, B)
        return np.asarray(Ks[0], np.float64)

    K32 = run(jnp.float32)
    with jax.enable_x64(True):
        K64 = run(jnp.float64, jax.devices("cpu")[0])
    return float(np.max(np.abs(K32 - K64))), float(np.max(np.abs(K64)))


def bench_bf16_mfu(d=4096):
    """Fresh-in-round bf16 MXU utilization (VERDICT r4 weak #2: the r3 MFU
    citation went stale — every round's JSON must carry an in-round
    measurement). Chained bf16 d^3 matmuls, slope-timed; the 1/64 rescale
    keeps iterates stationary (entries of x@x have sd ~ sqrt(d) = 64) and
    its cost is negligible vs the matmul."""
    from jax import lax

    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((d, d)), jnp.bfloat16
    )

    def f(x):
        return (jnp.matmul(x, x, precision=lax.Precision.DEFAULT)
                * (1.0 / 64.0)).astype(jnp.bfloat16)

    # long loops per the CLAUDE.md small-size rule: ~0.8 ms/step at 4096^2
    # sits in the band where k2=40 slopes carry multi-percent tunnel jitter
    sec = time_slope(f, x, k1=32, k2=160)
    return 2 * d**3 / sec / 1e12  # TFLOP/s


def bench_rollouts(batch=4096, T=100):
    """Slope-timed (VERDICT r3 weak #4: time_chained includes the ~25 ms
    dispatch overhead and cannot resolve < ~1 ms/call; the slope harness
    cancels it like every other bench line)."""
    from strided_tpu.models import double_pendulum
    from strided_tpu.mpc import rollout_final
    from strided_tpu.utils.timing import time_slope_checked

    m = double_pendulum()
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.standard_normal((batch, 4)) * 0.1, jnp.float32)
    us = jnp.asarray(rng.standard_normal((batch, T, 2)) * 0.01, jnp.float32)
    f = lambda x0: rollout_final(m, x0, us, 0.01)
    sec, note = time_slope_checked(f, x0, k1=4, k2=20)
    return batch * T / sec, sec, note  # dynamics steps / s


def main():
    # ---- GATES (must pass before any headline is printed) ----
    # 1. Compiled-Pallas smoke: Mosaic kernels == XLA on this backend.
    checks = bench_smoke()
    print(f"[bench] smoke: ok ({', '.join(checks)})", file=sys.stderr)

    # 2. On-device accuracy of the exact headline configuration. This runs
    #    on the REAL backend (TPU under the driver) — the r2 failure mode was
    #    a CPU-only test passing while the hardware ran at bf16 precision.
    dev1, devp, uscale = bench_mpc_accuracy()
    print(
        f"[bench] accuracy at the operating point (ADMM-6 rho=8 f32 vs f64 "
        f"converged oracle, input scale {uscale:.2f}): first applied "
        f"input max|du| = {dev1:.1e}; full horizon plan max|dU| = "
        f"{devp:.1e} (gate: first <= 1e-4, plan <= 0.15)",
        file=sys.stderr,
    )
    assert dev1 <= 1e-4, (
        f"ON-DEVICE accuracy gate failed: first applied input off by "
        f"{dev1:.2e} (> 1e-4) — refusing to print a headline number"
    )
    assert devp <= 0.15, f"horizon plan off by {devp:.2e} (> 0.15)"

    # ---- headline ----
    solves, sec = bench_mpc_solves()
    print(
        f"[bench] quadrotor MPC (N=50, ADMM-6 rho=8, batch 16384): "
        f"{solves:,.0f} solves/s ({sec*1e3:.2f} ms/batch)",
        file=sys.stderr,
    )

    # ---- diagnostics (must not break the contract line) ----
    try:
        kgbs, egbs, ggbs = bench_symmetrize_bandwidth()
        print(
            f"[bench] symmetrize 8192^2 f32: kernel {kgbs:.1f} GB/s "
            f"(symmetrize_kernel_gbs), flagship expression via pattern "
            f"dispatch {egbs:.1f} GB/s, generic 3-pass engine {ggbs:.1f} GB/s",
            file=sys.stderr,
        )
        fgbs = bench_symmetrize_flagship_size()
        print(
            f"[bench] symmetrize at the reference's literal flagship size "
            f"4000^2 (edge-tile-clamped pair kernel, gated bit-exact vs "
            f"XLA): {fgbs:.1f} GB/s chained (partially resident regime); "
            f"collapse-proof interleaved-chain comparison: kernel 592 vs "
            f"XLA 282 GB/s, kernel wins at every size >= the measured "
            f"2048^2 dispatch gate (results_tpu_r5.json "
            f"pair_crossover_rotation)",
            file=sys.stderr,
        )
        # Efficiency ledger vs hardware ceilings (VERDICT r3 item 8): HBM
        # spec ~819 GB/s (measured 50/50 stream 654.6, r3); bf16 MXU peak
        # ~197 TFLOP/s on v5e. MFU is measured FRESH each round (r4 weak #2).
        tflops = bench_bf16_mfu()
        print(
            f"[bench] efficiency: symmetrize {egbs:.0f}/819 GB/s = "
            f"{egbs / 819:.0%} of HBM spec ({egbs / 654.6:.0%} of measured "
            f"stream; transpose-class ceiling is ~336 GB/s on this chip — "
            f"{egbs / 336:.0%} of that); bf16 matmul {tflops:.0f}/197 "
            f"TFLOP/s = {tflops / 197:.0%} MFU (measured this round, "
            f"4096^3 slope-timed)",
            file=sys.stderr,
        )
        steps, _, note = bench_rollouts()
        print(
            f"[bench] double-pendulum rollouts: {steps:,.0f} steps/s "
            f"(slope-timed{'; ' + note if note else ''})",
            file=sys.stderr,
        )
        dev_i, scale_i, c32, c64 = bench_ilqr_accuracy()
        print(
            f"[bench] cartpole iLQR f32-device vs f64-CPU: max|du| = "
            f"{dev_i:.1e} (input scale {scale_i:.2f}; costs {c32:.4f} vs {c64:.4f})",
            file=sys.stderr,
        )
        dev_r, scale_r = bench_riccati_accuracy()
        print(
            f"[bench] Riccati LQR gain f32-device vs f64-CPU: max|dK| = "
            f"{dev_r:.1e} (gain scale {scale_r:.2f})",
            file=sys.stderr,
        )
    except Exception as e:  # diagnostics must not break the contract line
        print(f"[bench] diagnostics failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "quadrotor MPC solves/s/chip (12-state, N=50, condensed QP, ADMM-6 rho=8 at the measured accuracy frontier)",
                "value": round(solves, 1),
                "unit": "solves/s/chip",
                "vs_baseline": round(solves / PER_CHIP_TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
