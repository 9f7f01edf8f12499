"""Round-4 experiment: measure peak HBM bandwidth and per-kernel step times.

Not part of the library; feeds the roofline model added to bench.py.
Run on the real TPU: PYTHONPATH=. python scripts/roofline_probe.py

Timing note: on this tunneled backend block_until_ready returns before device
execution finishes, and a host fetch carries ~24 ms of RPC latency — so every
measurement here is slope-based: time chains of n1 and n2 dependent calls with
one scalar fetch at the end, and report (t2-t1)/(n2-n1).
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


def slope_ms(f, args, ns=(4, 16), chain=1):
    """Marginal ms per call of f; the first ``chain`` outputs are fed back
    as the first ``chain`` args (donation-friendly)."""
    out = f(*args)
    float(_fetch(out))
    ts = []
    for n in ns:
        a = list(args)
        out = f(*a)  # fresh donated buffers per measurement
        a[:chain] = jax.tree.leaves(out)[:chain]
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*a)
            new = jax.tree.leaves(out)[:chain]
            for i, v in enumerate(new):
                if v.shape == a[i].shape and v.dtype == a[i].dtype:
                    a[i] = v
        float(_fetch(out))
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (ns[1] - ns[0]) * 1e3


def measure_peak_gbps():
    x = jnp.ones((512 * 1024, 1024), jnp.float32)  # 2 GB
    f = jax.jit(lambda x: x + 1.0)
    ms = slope_ms(f, (x,), ns=(5, 25))
    return 2 * x.nbytes / ms / 1e6


def kernel_breakdown(c, s, k=384, param_dtype=jnp.float32,
                     compute_dtype=jnp.bfloat16, peak=660.0):
    from tangram_tpu.ops.pallas_core import _rowstats, _project
    from tangram_tpu.ops.fused_step import _rbar, _dm_adam, _pick_adam_tc

    # all big arrays generated ON DEVICE: a host->device upload of the
    # 50k x 25k f32 M is ~5 GB through the tunnel (minutes)
    key = jax.random.PRNGKey(0)
    kM, kA, kY = jax.random.split(key, 3)
    M = jax.random.normal(kM, (c, s), jnp.float32).astype(param_dtype)
    A = jax.random.uniform(kA, (c, k), jnp.float32).astype(compute_dtype)
    w = jnp.ones((c,), jnp.float32)
    dY = jax.random.uniform(kY, (s, k), jnp.float32).astype(compute_dtype)
    dq = jnp.ones((s,), jnp.float32)
    dh = jnp.zeros((c,), jnp.float32)
    mu = jnp.zeros((c, s), jnp.bfloat16)
    nu = jnp.full((c, s), 0.01, jnp.bfloat16)
    scalars = jnp.asarray([[0.001, 0.9, 0.99, 0.0]], jnp.float32)
    from tangram_tpu.ops.fused_step import _pick_adam_tc as _ptc
    print(f"\n--- {c}x{s} k={k} param={param_dtype.__name__} "
          f"compute={compute_dtype.__name__} "
          f"(dm tc={_ptc(768, k, 2, jnp.dtype(compute_dtype).itemsize, jnp.dtype(param_dtype).itemsize)}) ---",
          flush=True)

    rows = jax.jit(_rowstats)
    t_rows = slope_ms(rows, (M,))
    print(f"  rowstats: {t_rows:.2f} ms", flush=True)
    m, l, u = rows(M)

    proj = jax.jit(lambda M: _project(M, A, w, m, l))
    t_proj = slope_ms(proj, (M,), ns=(4, 12))  # output shape differs: no chain
    print(f"  project:  {t_proj:.2f} ms", flush=True)

    rbar_f = jax.jit(lambda M: _rbar(M, A, w, m, l, dY, dq, dh))
    t_rbar = slope_ms(rbar_f, (M,), ns=(4, 12))
    print(f"  rbar:     {t_rbar:.2f} ms", flush=True)
    r = rbar_f(M)

    try:
        dm = jax.jit(
            lambda M, mu, nu: _dm_adam(M, A, w, m, l, dY, dq, dh, r, mu, nu,
                                       scalars, 0.0, 0.0,
                                       with_norms=False)[:3],
            donate_argnums=(0, 1, 2),
        )
        t_dm = slope_ms(dm, (M, mu, nu), ns=(4, 12), chain=3)
    except Exception as err:
        print(f"  dm_adam failed ({type(err).__name__}); skipping", flush=True)
        t_dm = float("nan")
    print(f"  dm_adam:  {t_dm:.2f} ms", flush=True)

    pb = jnp.dtype(param_dtype).itemsize
    cb = jnp.dtype(compute_dtype).itemsize
    tc_dm = _pick_adam_tc(768, k, 2, cb, pb)
    gb = 1e9

    total_ms = total_b = 0.0
    for name, ms, bytes_ in [
        ("rowstats", t_rows, c * s * pb),
        ("project", t_proj,
         c * s * pb + (-(-s // 768)) * c * k * cb + s * k * 4),
        ("rbar", t_rbar,
         c * s * pb + c * k * cb + (-(-c // 512)) * s * k * cb),
        ("dm_adam", t_dm,
         2 * c * s * pb + 4 * c * s * 2 + c * k * cb
         + (-(-c // tc_dm)) * s * k * cb),
    ]:
        frac = bytes_ / gb / ms * 1e3 / peak
        print(f"{name:9s}: {ms:7.2f} ms  model {bytes_/gb:6.2f} GB "
              f"-> {bytes_/gb/ms*1e3:6.1f} GB/s  ({frac:4.0%} of peak)")
        if name != "rowstats":  # carried stats: rowstats not in the hot step
            total_ms += ms
            total_b += bytes_
    print(f"step (proj+rbar+dm): {total_ms:.2f} ms, model {total_b/gb:.2f} GB"
          f" -> {total_b/gb/total_ms*1e3:.1f} GB/s ({total_b/gb/total_ms*1e3/peak:.0%})")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    peak = measure_peak_gbps()
    print(f"peak copy bandwidth (slope): {peak:.1f} GB/s")
    kernel_breakdown(50_000, 25_000, param_dtype=jnp.float32, peak=peak)
    kernel_breakdown(12_500, 50_000, param_dtype=jnp.float32, peak=peak)
    kernel_breakdown(12_500, 50_000, param_dtype=jnp.bfloat16, peak=peak)
