"""Randomized full-trajectory differential fuzz vs the LIVE torch reference
(a tool, not a CI test — the CI suite carries seeded versions; run this for
a deeper sweep).

Random shapes, λ subsets (including the spatial/autocorrelation terms and
cell-type islands, which the CI trajectory fuzz keeps light), and modes;
each trial trains the torch reference Mapper and ours from the SAME numpy
N(0,1) init stream and asserts loss-history and output parity to f32
accumulation tolerance.

Tolerances are sensitivity-aware: with kinked terms (ct-islands'
``max(·, 0)``, autocorrelation ratios) the TRAJECTORY is chaotic — the
reference's own run, perturbed by 1e-7 at init, transiently diverges by
~0.5% mid-training and re-converges (measured on a failing draw; the same
epochs, same shape as the f32 accumulation-order differences between the
two frameworks). So the checks are: tight parity on the pre-optimization
epoch-0 loss (the deterministic correctness signal), a median bound over
the whole trajectory, and tail/output bounds after re-convergence —
rather than a fixed per-epoch rtol that any chaotic transient would trip.

Usage::

    python scripts/fuzz_torch_parity.py [seed] [n_trials]

Exits nonzero on any divergence. Requires /root/reference (skips cleanly
otherwise).
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from _reference import load_reference_optimizer
from tangram_tpu.models.mapper import Mapper, MapperConstrained


def run(seed: int, n_trials: int) -> int:
    REF = load_reference_optimizer()
    if REF is None:
        print("reference unavailable; nothing to fuzz against")
        return 0
    rng = np.random.default_rng(seed)
    fails = 0
    for trial in range(n_trials):
        c = int(rng.integers(6, 40))
        s = int(rng.integers(5, 30))
        g = int(rng.integers(4, 16))
        epochs = int(rng.integers(20, 80))
        seed_t = int(rng.integers(0, 1000))
        constrained = bool(rng.random() < 0.3)

        S = (rng.poisson(2.0, (c, g)) + 0.1).astype(np.float32)
        G = (rng.poisson(3.0, (s, g)) + 0.1).astype(np.float32)
        d = rng.random(s).astype(np.float32)
        d /= d.sum()

        kwargs = {}
        if constrained:
            kwargs = dict(
                target_count=int(rng.integers(max(1, s // 2), 2 * s)),
                lambda_count=float(rng.uniform(0.2, 1.0)),
                lambda_f_reg=float(rng.uniform(0.2, 1.0)),
                lambda_r=float(rng.choice([0.0, 0.05])),
            )
        else:
            # random λ subset, spatial terms included
            W = (rng.random((s, s)) * (rng.random((s, s)) < 0.5)).astype(
                np.float32
            )
            ct = np.zeros((c, 3), np.float32)
            ct[np.arange(c), rng.integers(0, 3, c)] = 1
            choices = dict(
                lambda_g2=lambda: float(rng.uniform(0.2, 1.0)),
                lambda_r=lambda: float(rng.uniform(1e-4, 0.2)),
                lambda_l1=lambda: float(rng.uniform(1e-4, 0.01)),
                lambda_l2=lambda: float(rng.uniform(1e-4, 0.01)),
                lambda_neighborhood_g1=lambda: float(rng.uniform(0.1, 0.6)),
                lambda_ct_islands=lambda: float(rng.uniform(0.1, 0.6)),
                lambda_getis_ord=lambda: float(rng.uniform(0.1, 0.6)),
                lambda_moran=lambda: float(rng.uniform(0.1, 0.6)),
                lambda_geary=lambda: float(rng.uniform(0.1, 0.6)),
            )
            for key, maker in choices.items():
                if rng.random() < 0.35:
                    kwargs[key] = maker()
            if any(k in kwargs for k in ("lambda_neighborhood_g1",)):
                kwargs["voxel_weights"] = W
            if "lambda_ct_islands" in kwargs:
                kwargs["neighborhood_filter"] = W
                kwargs["ct_encode"] = ct
            if any(k in kwargs for k in
                   ("lambda_getis_ord", "lambda_moran", "lambda_geary")):
                kwargs["spatial_weights"] = W
            if rng.random() < 0.5:
                kwargs["lambda_d"] = float(rng.uniform(0.2, 1.0))

        use_d = constrained or "lambda_d" in kwargs
        label = (f"[{trial}] {'constrained' if constrained else 'cells'} "
                 f"c={c} s={s} g={g} e={epochs} "
                 f"keys={sorted(k for k in kwargs if k.startswith('lambda'))}")
        try:
            if constrained:
                ref = REF.MapperConstrained(
                    S=S, G=G, d=d, random_state=seed_t, **kwargs)
                ref_out, ref_F, ref_hist = ref.train(
                    num_epochs=epochs, learning_rate=0.1, print_each=None)
                ours = MapperConstrained(
                    S=S, G=G, d=d, random_state=seed_t,
                    init_method="numpy", **kwargs)
                out, F, hist = ours.train(
                    num_epochs=epochs, learning_rate=0.1, print_each=None)

                def parse(v):
                    txt = str(v)
                    if "tensor" in txt:
                        txt = txt.split("(", 1)[1].split(",")[0].rstrip(")")
                    return float(txt)

                ref_losses = np.array([parse(x)
                                       for x in ref_hist["total_loss"]])
                np.testing.assert_allclose(F, ref_F, atol=5e-3)
            else:
                ref = REF.Mapper(
                    S=S, G=G, d=d if use_d else None, random_state=seed_t,
                    **kwargs)
                ref_out, ref_hist = ref.train(
                    num_epochs=epochs, learning_rate=0.1, print_each=None)
                ours = Mapper(
                    S=S, G=G, d=d if use_d else None, random_state=seed_t,
                    init_method="numpy", **kwargs)
                out, hist = ours.train(
                    num_epochs=epochs, learning_rate=0.1, print_each=None)
                ref_losses = np.array([float(x)
                                       for x in ref_hist["total_loss"]])
            our_losses = np.array(hist["total_loss"])
            # the reference's CONSTRAINED history stores str(tensor) (ref
            # mapping_optimizer.py:630) — torch reprs carry 4 decimal
            # places, so the parsed trajectory is quantized to ±5e-5
            # absolute; grant that allowance before the relative checks
            # (a ~1e-3 loss otherwise shows a spurious ~3% "error")
            quant = 5.1e-5 if constrained else 0.0
            rel = np.maximum(
                np.abs(our_losses - ref_losses) - quant, 0.0
            ) / np.maximum(np.abs(ref_losses), 1e-9)
            assert rel[0] < 5e-4, f"epoch-0 loss rel {rel[0]:.2e}"
            assert np.median(rel) < 8e-3, f"median rel {np.median(rel):.2e}"
            assert rel[-5:].max() < 2e-2, f"tail rel {rel[-5:].max():.2e}"
            out_err = float(np.abs(np.asarray(out) - np.asarray(ref_out)).max())
            if out_err > 1e-2:
                # Chaos control (same methodology as the tolerance note
                # above): rerun the REFERENCE from an init perturbed by
                # 1e-7 and measure its self-sensitivity on this exact
                # draw. A chaotic trajectory (tiny spot counts + kinked /
                # ratio terms) legitimately lands equally-converged runs
                # at different M outputs; an implementation bug shows a
                # deviation well beyond what the reference does to itself.
                import torch

                torch.manual_seed(987654)
                if constrained:
                    r2 = REF.MapperConstrained(
                        S=S, G=G, d=d, random_state=seed_t, **kwargs)
                else:
                    r2 = REF.Mapper(
                        S=S, G=G, d=d if use_d else None,
                        random_state=seed_t, **kwargs)
                with torch.no_grad():
                    r2.M += 1e-7 * torch.randn_like(r2.M)
                    if constrained:
                        r2.F += 1e-7 * torch.randn_like(r2.F)
                r2_out = r2.train(
                    num_epochs=epochs, learning_rate=0.1, print_each=None
                )[0]
                self_err = float(
                    np.abs(np.asarray(r2_out) - np.asarray(ref_out)).max())
                assert out_err <= max(1e-2, 2.0 * self_err), (
                    f"out maxdiff {out_err:.4f} exceeds 2x the reference's "
                    f"own init-perturbation sensitivity {self_err:.4f}"
                )
                print(f"{label}: ok (chaotic draw: out maxdiff "
                      f"{out_err:.4f} <= 2x ref self-sensitivity "
                      f"{self_err:.4f})", flush=True)
            else:
                print(f"{label}: ok", flush=True)
        except Exception as err:
            fails += 1
            msg = str(err).splitlines()[:4]
            print(f"{label}: FAIL {type(err).__name__}: {' / '.join(msg)}",
                  flush=True)
    print(f"{n_trials} trials, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sys.exit(run(seed, n))
