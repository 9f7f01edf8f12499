#!/usr/bin/env python
"""Sweep (ts, tc) tiles for the fused backward+Adam kernel at the bf16
north-star shard (VERDICT r4 #4: bf16 sits at 0.78 of peak; the measured
cause — in-tile VPU work no longer hidden behind DMA at half the bytes —
suggests wider spot tiles / different cell tiles).

Run on the real TPU, box otherwise quiet:
    python scripts/adam_tile_sweep.py

Timing: each config is timed as ONE dispatched ``lax.scan`` chaining
(M, mu, nu) through n kernel invocations, slope between two scan lengths —
per-call dispatch timing through this tunneled backend is unusable (RPC
jitter exceeds the kernel time; see roofline_probe.py's negative slopes).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np  # noqa: F401

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_fetch = jax.jit(lambda t: jax.tree.leaves(t)[0].ravel()[0])


def measure_peak_gbps():
    """Same scan-slope method as bench.measure_peak_gbps (the python-loop
    variant reads 10-15% low under host CPU contention)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import measure_peak_gbps as _bench_peak

    return _bench_peak()


def scan_slope_ms(step, carry, ns=(4, 20)):
    """Marginal ms per step of ``step`` inside one compiled lax.scan —
    one dispatch + one scalar fetch per measurement."""

    def runner(n):
        @jax.jit
        def run(carry):
            def body(c, _):
                return step(c), None
            out, _ = jax.lax.scan(body, carry, None, length=n)
            return out
        return run

    runs = {n: runner(n) for n in ns}
    for n in ns:  # compile
        float(_fetch(runs[n](carry)))
    ts = []
    for n in ns:
        t0 = time.perf_counter()
        float(_fetch(runs[n](carry)))
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (ns[1] - ns[0]) * 1e3


def sweep(c=12_500, s=50_000, k=384, param_dtype=jnp.bfloat16,
          compute_dtype=jnp.bfloat16, peak=789.0):
    from tangram_tpu.ops.fused_step import _dm_adam, _pick_adam_tc
    from tangram_tpu.ops.pallas_core import _rowstats

    key = jax.random.PRNGKey(0)
    kM, kA, kY = jax.random.split(key, 3)
    M = jax.random.normal(kM, (c, s), jnp.float32).astype(param_dtype)
    A = jax.random.uniform(kA, (c, k), jnp.float32).astype(compute_dtype)
    w = jnp.ones((c,), jnp.float32)
    dY = (jax.random.uniform(kY, (s, k), jnp.float32) * 1e-3).astype(compute_dtype)
    dq = jnp.full((s,), 1e-3, jnp.float32)
    dh = jnp.zeros((c,), jnp.float32)
    mu = jnp.zeros((c, s), jnp.bfloat16)
    nu = jnp.full((c, s), 0.01, jnp.bfloat16)
    scalars = jnp.asarray([[1e-4, 0.9, 0.99, 0.0]], jnp.float32)
    m0, l0, u0 = jax.jit(_rowstats)(M)
    r = jnp.zeros((c, 1), jnp.float32)

    pb = jnp.dtype(param_dtype).itemsize
    cb = jnp.dtype(compute_dtype).itemsize

    def model_bytes(tc):
        return (2 * c * s * pb + 4 * c * s * 2 + c * k * cb
                + (-(-c // tc)) * s * k * cb)

    configs = []
    for ts_try in (768, 2048, 2560, 3072, 4096):
        tc_auto = _pick_adam_tc(ts_try, k, 2, cb, pb)
        tcs = {tc_auto}
        for tc_try in (128, 192, 256, 384):
            big = tc_try * ts_try * 2 * (pb + 4) + (tc_try + ts_try) * k * cb
            if big <= 6_500_000:  # slightly past the 4.8 MB default budget
                tcs.add(tc_try)
        for tc_try in sorted(tcs):
            configs.append((ts_try, tc_try))

    print(f"shape {c}x{s} k={k} param={jnp.dtype(param_dtype).name} "
          f"compute={jnp.dtype(compute_dtype).name} peak={peak:.0f} GB/s",
          flush=True)
    results = []
    for ts_try, tc_try in configs:
        def step(carry, _ts=ts_try, _tc=tc_try):
            # chain M/mu/nu AND the carried rowstats, exactly like the real
            # training scan (stats m/l feed the softmax recompute)
            M_c, mu_c, nu_c, m_c, l_c = carry
            out = _dm_adam(M_c, A, w, m_c, l_c, dY, dq, dh, r, mu_c, nu_c,
                           scalars, 0.0, 0.0, with_norms=False,
                           ts=_ts, tc=_tc)
            M_n, mu_n, nu_n, m_n, l_n = out[0], out[1], out[2], out[3], out[4]
            return (M_n, mu_n, nu_n, m_n, l_n)

        try:
            t = scan_slope_ms(step, (M, mu, nu, m0, l0))
            gbps = model_bytes(tc_try) / t / 1e6
            frac = gbps / peak
            results.append((ts_try, tc_try, t, gbps, frac))
            print(f"  ts={ts_try:5d} tc={tc_try:4d}: {t:7.2f} ms  "
                  f"{gbps:6.1f} GB/s  ({frac:5.1%} of peak)", flush=True)
        except Exception as err:
            print(f"  ts={ts_try:5d} tc={tc_try:4d}: FAIL "
                  f"{type(err).__name__}: {str(err)[:120]}", flush=True)
    if results:
        best = min(results, key=lambda x: x[2])
        print(f"best: ts={best[0]} tc={best[1]} {best[2]:.2f} ms "
              f"({best[4]:.1%} of peak)", flush=True)
    return results


def full_step_probe(c=12_500, s=50_000, g=249,
                    param_dtype=jnp.bfloat16, epochs=60, ts_override=None):
    """Whole fused training step (project + epilogue + rbar + dm_adam) at
    the north-star shard, timed exactly like bench.py (scan slope), with
    the Adam spot tile optionally overridden via _pick_adam_ts — validates
    that the kernel-level tile win survives in the full step."""
    import numpy as np

    from tangram_tpu.models.mapper import fit_mapping, init_logits
    from tangram_tpu.ops import fused_step
    from tangram_tpu.ops.losses import LossWeights, MapperData

    rng = np.random.default_rng(0)
    S = (rng.poisson(1.0, (c, g)) + 1).astype(np.float32)
    G = (rng.poisson(2.0, (s, g)) + 1).astype(np.float32)
    d = (G.sum(axis=1) / G.sum()).astype(np.float32)
    data = MapperData(S=jnp.asarray(S), G=jnp.asarray(G), d=jnp.asarray(d))
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    M0 = init_logits(c, s, random_state=42, method="jax")

    orig = fused_step._pick_adam_ts
    if ts_override is not None:
        fused_step._pick_adam_ts = lambda pb=4: ts_override
    # the module-level jit cache keys on (avals, statics) only — identical
    # across ts overrides — so a cached executable would silently ignore the
    # monkeypatch. Clear ALL jit caches so each override really retraces.
    jax.clear_caches()
    try:
        kw = dict(moment_dtype="bfloat16", compute_dtype="bfloat16",
                  param_dtype=jnp.dtype(param_dtype).name, impl="pallas")
        for n in (20, epochs):  # compile both lengths
            params, hist = fit_mapping(M0 * 1.0001, data, lw, n, 0.1, **kw)
            float(jax.device_get(hist["main_loss"][-1]))
        # warm pass: repeat for the slope
        ts2 = {}
        for n in (20, epochs):
            t0 = time.perf_counter()
            params, hist = fit_mapping(M0 * 1.0001, data, lw, n, 0.1, **kw)
            float(jax.device_get(hist["main_loss"][-1]))
            ts2[n] = time.perf_counter() - t0
        step_ms = (ts2[epochs] - ts2[20]) / (epochs - 20) * 1e3
    finally:
        fused_step._pick_adam_ts = orig
        jax.clear_caches()

    from tangram_tpu.ops.fused_step import _pick_adam_tc
    pb = jnp.dtype(param_dtype).itemsize
    ts_used = ts_override or 768
    tc = _pick_adam_tc(ts_used, 384, 2, 2, pb)
    print(f"full step param={jnp.dtype(param_dtype).name} "
          f"ts={'default(768)' if ts_override is None else ts_override} "
          f"(dm tc={tc}): {step_ms:.2f} ms/step", flush=True)
    return step_ms


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    peak = measure_peak_gbps()
    print(f"peak copy bandwidth (slope): {peak:.1f} GB/s", flush=True)
    if "--full-step" in sys.argv:
        for ts_o in (None, 2048, 2560, 3072):
            full_step_probe(ts_override=ts_o)
    else:
        sweep(peak=peak)
