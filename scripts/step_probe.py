"""Round-4 experiment: whole-step times via fit_mapping scans (reliable on
the tunneled backend — the history fetch forces a real device sync and the
scan amortizes RPC latency). Usage:
    python scripts/step_probe.py [c] [s] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

c = int(sys.argv[1]) if len(sys.argv) > 1 else 12_500
s = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 40

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_problem, step_time
from tangram_tpu.ops.losses import LossWeights

rng = np.random.default_rng(0)
lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
data = make_problem(rng, c, s)

for label, kw in [
    ("f32 params, bf16 moments+compute",
     dict(moment_dtype="bfloat16", compute_dtype="bfloat16")),
    ("bf16 params+moments+compute",
     dict(param_dtype="bfloat16", moment_dtype="bfloat16",
          compute_dtype="bfloat16")),
    ("bf16 everything + stochastic rounding",
     dict(param_dtype="bfloat16", moment_dtype="bfloat16",
          compute_dtype="bfloat16", rounding="stochastic")),
    ("all f32", dict()),
]:
    t0 = time.perf_counter()
    ms = step_time(data, lw, c, s, steps=steps, impl="pallas", **kw)
    print(f"{label:42s}: {ms:7.2f} ms/step   (wall {time.perf_counter()-t0:.0f}s)",
          flush=True)
