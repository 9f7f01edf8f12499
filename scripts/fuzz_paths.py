"""Extended randomized fuzz of the execution paths (a tool, not a CI test —
the CI suite carries seeded versions; run this for a deeper sweep).

Random shapes, loss configs, schedules, and modes through:
  single-device XLA  vs  fused Pallas  vs  fused sharded (1-D / 2-D mesh)
hunting numeric divergence. Usage:

    python scripts/fuzz_paths.py [seed] [n_trials]

Runs on the virtual 8-device CPU mesh; exits nonzero on any divergence.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tangram_tpu.models.mapper import fit_mapping
from tangram_tpu.ops.losses import LossWeights, MapperData
from tangram_tpu.parallel import fit_mapping_fused_sharded


def run(seed: int, n_trials: int) -> int:
    rng = np.random.default_rng(seed)
    fails = 0
    for trial in range(n_trials):
        c = int(rng.integers(9, 70))
        s = int(rng.integers(8, 50))
        g = int(rng.integers(4, 20))
        constrained = bool(rng.integers(0, 2))
        S = (rng.gamma(2.0, 1.0, (c, g)) + 0.05).astype(np.float32)
        G = (rng.gamma(3.0, 1.0, (s, g)) + 0.05).astype(np.float32)
        d = rng.random(s).astype(np.float32)
        d /= d.sum()
        M0 = rng.normal(0, 1, (c, s)).astype(np.float32)
        if constrained:
            lw = LossWeights(
                lambda_g1=float(rng.uniform(0.3, 2.0)),
                lambda_d=1.0,
                lambda_r=float(rng.choice([0.0, rng.uniform(0, 1e-2)])),
                lambda_count=float(rng.uniform(0.2, 2.0)),
                lambda_f_reg=float(rng.uniform(0.2, 2.0)),
            )
            data = MapperData(
                S=jnp.asarray(S), G=jnp.asarray(G), d=jnp.asarray(d),
                target_count=jnp.float32(float(rng.integers(s // 2, 2 * s))),
            )
            F0 = rng.normal(0, 1, (c,)).astype(np.float32)
            params0 = (jnp.asarray(M0), jnp.asarray(F0))
        else:
            lw = LossWeights(
                lambda_g1=float(rng.uniform(0.3, 2.0)),
                lambda_d=float(rng.choice([0.0, 1.0])),
                lambda_g2=float(rng.choice([0.0, rng.uniform(0, 1)])),
                lambda_r=float(rng.choice([0.0, rng.uniform(0, 1e-2)])),
                lambda_l1=float(rng.choice([0.0, rng.uniform(0, 1e-2)])),
                lambda_l2=float(rng.choice([0.0, rng.uniform(0, 1e-3)])),
            )
            data = MapperData(S=jnp.asarray(S), G=jnp.asarray(G),
                              d=jnp.asarray(d) if lw.lambda_d else None)
            params0 = jnp.asarray(M0)

        if rng.integers(0, 2):
            # CV-fold-style gene masking: exercises the masked reductions
            gm = (rng.random(g) < 0.7).astype(np.float32)
            if gm.sum() == 0:
                gm[0] = 1.0
            data = data._replace(gene_mask=jnp.asarray(gm))

        epochs = int(rng.integers(3, 25))
        lr = (np.linspace(0.3, 0.02, epochs).astype(np.float32)
              if rng.integers(0, 2) else float(rng.uniform(0.02, 0.5)))

        p_x, h_x = fit_mapping(params0, data, lw, epochs, lr, impl="xla",
                               constrained=constrained)
        p_p, h_p = fit_mapping(params0, data, lw, epochs, lr, impl="pallas",
                               fused=True, constrained=constrained)
        if rng.choice(["1d", "2d"]) == "1d":
            mesh = Mesh(np.asarray(jax.devices()), ("cell",))
        else:
            mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                        ("cell", "spot"))
        raw0 = (M0, np.asarray(params0[1])) if constrained else M0
        p_s, h_s = fit_mapping_fused_sharded(raw0, data, lw, epochs, lr,
                                             mesh=mesh)

        # chunked sharded run — the mesh print-streaming / early-stop path:
        # random chunk boundaries, Adam state carried, step_offset keeping
        # the absolute epoch (lr vectors sliced per chunk). Must reproduce
        # the single-scan trajectory.
        if epochs > 2:
            n_cuts = int(rng.integers(1, min(3, epochs - 1) + 1))
            cuts = np.sort(rng.choice(
                np.arange(1, epochs), size=n_cuts, replace=False
            ))
            p_c, opt_state, losses, start = raw0, None, [], 0
            for b in [*cuts.tolist(), epochs]:
                chunk = b - start
                lr_chunk = lr[start:b] if np.ndim(lr) == 1 else lr
                p_c, opt_state, hc = fit_mapping_fused_sharded(
                    p_c, data, lw, chunk, lr_chunk, mesh=mesh,
                    opt_state=opt_state, return_opt_state=True,
                    step_offset=start,
                )
                losses.append(np.asarray(hc["total_loss"]))
                start = b
            h_c = {"total_loss": np.concatenate(losses)}
        else:
            p_c, h_c = p_s, h_s

        # Param tolerance is lr-aware: Adam's first step is ~lr*g/(|g|+eps),
        # so entries whose true gradient is near zero amplify benign
        # reduction-order noise into O(lr*1e-2) param differences. The loss
        # history is the stable discriminator and gets a tight bound.
        lr_max = float(np.max(lr))
        param_tol = 2e-3 + 0.02 * lr_max
        ok = True
        pairs = [("pallas-vs-xla", p_p, p_x), ("sharded-vs-pallas", p_s, p_p),
                 ("chunked-vs-sharded", p_c, p_s)]
        for name, a, b in pairs:
            for leaf_a, leaf_b in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                diff = float(np.max(np.abs(np.asarray(leaf_a) - np.asarray(leaf_b))))
                if not np.isfinite(diff) or diff > param_tol:
                    tc = (float(data.target_count) if constrained else None)
                    print(f"trial {trial}: {name} max|d|={diff:.2e} "
                          f"(tol {param_tol:.1e}) c={c} s={s} g={g} "
                          f"ep={epochs} mesh={mesh.axis_names} "
                          f"constrained={constrained} target={tc} "
                          f"lr={'vec' if np.ndim(lr) else round(float(lr), 4)} "
                          f"lw={lw}")
                    ok = False
        for name, ha, hb in [("loss pallas-vs-xla", h_p, h_x),
                             ("loss sharded-vs-pallas", h_s, h_p),
                             ("loss chunked-vs-sharded", h_c, h_s)]:
            dl = float(np.max(np.abs(np.asarray(ha["total_loss"]) -
                                     np.asarray(hb["total_loss"]))))
            if not np.isfinite(dl) or dl > 1e-3:
                print(f"trial {trial}: {name} max|dloss|={dl:.2e} c={c} "
                      f"s={s} g={g} ep={epochs} constrained={constrained}")
                ok = False
        fails += 0 if ok else 1
    print(f"{n_trials} trials, {fails} failures", flush=True)
    return fails


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sys.exit(1 if run(seed, n) else 0)
