"""Full training-trajectory parity: JAX Mapper vs the torch reference.

Same N(0,1) numpy init stream, same Adam hyperparameters → the loss histories
and final softmax outputs must agree to float32 accumulation tolerance.
"""

import numpy as np
import pytest

from tangram_tpu.models.mapper import Mapper, MapperConstrained

from _reference import load_reference_optimizer

REF = load_reference_optimizer()

pytestmark = pytest.mark.skipif(REF is None, reason="reference torch optimizer unavailable")


def make_problem(rng, c=15, s=11, g=8):
    S = rng.poisson(2.0, (c, g)).astype(np.float32) + 0.1
    G = rng.poisson(3.0, (s, g)).astype(np.float32) + 0.1
    d = rng.random(s).astype(np.float32)
    d /= d.sum()
    return S, G, d


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(lambda_g2=1.0),
        dict(use_d=True, lambda_d=1.0),
        dict(lambda_r=0.1, lambda_l2=0.01),
    ],
)
def test_mapper_trajectory_matches_reference(rng, kwargs):
    S, G, d = make_problem(rng)
    use_d = kwargs.pop("use_d", False)

    ref = REF.Mapper(S=S, G=G, d=d if use_d else None, random_state=42, **kwargs)
    ref_out, ref_hist = ref.train(num_epochs=60, learning_rate=0.1, print_each=None)

    ours = Mapper(S=S, G=G, d=d if use_d else None, random_state=42, **kwargs)
    out, hist = ours.train(num_epochs=60, learning_rate=0.1, print_each=None)

    ref_losses = np.array([float(x) for x in ref_hist["total_loss"]])
    our_losses = np.array(hist["total_loss"])
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(out, ref_out, atol=2e-3)
    # first-epoch loss (pre-optimization) should match much tighter
    assert hist["total_loss"][0] == pytest.approx(ref_losses[0], rel=2e-4)
    assert hist["main_loss"][-1] == pytest.approx(float(ref_hist["main_loss"][-1]), abs=2e-3)


def test_constrained_trajectory_matches_reference(rng):
    S, G, d = make_problem(rng)

    ref = REF.MapperConstrained(
        S=S, G=G, d=d, target_count=8, lambda_count=0.5, lambda_f_reg=0.3,
        lambda_r=0.05, random_state=7,
    )
    ref_out, ref_F, ref_hist = ref.train(num_epochs=50, learning_rate=0.1, print_each=None)

    ours = MapperConstrained(
        S=S, G=G, d=d, target_count=8, lambda_count=0.5, lambda_f_reg=0.3,
        lambda_r=0.05, random_state=7,
    )
    out, F, hist = ours.train(num_epochs=50, learning_rate=0.1, print_each=None)

    # reference stores history values as str(tensor); parse the floats out
    def parse(v):
        s = str(v)
        if "tensor" in s:
            s = s.split("(", 1)[1].split(",")[0].rstrip(")")
        return float(s)

    ref_losses = np.array([parse(x) for x in ref_hist["total_loss"]])
    np.testing.assert_allclose(np.array(hist["total_loss"]), ref_losses, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(out, ref_out, atol=2e-3)
    np.testing.assert_allclose(F, ref_F, atol=2e-3)


def test_val_history_cadence(rng):
    S, G, d = make_problem(rng)
    ours = Mapper(S=S, G=G, random_state=1)
    _, hist = ours.train(num_epochs=20, learning_rate=0.1, print_each=None, val_each=5)
    assert len(hist["val_gene_sim"]) == 4  # epochs 0, 5, 10, 15
    assert len(hist["total_loss"]) == 20


def test_warm_start_from_adata_map(rng):
    """Warm start (reference declares but raises NotImplemented at
    mapping_optimizer.py:152): resuming from a probability matrix must
    reproduce its loss at epoch 0."""

    class FakeMap:
        pass

    S, G, d = make_problem(rng)
    m1 = Mapper(S=S, G=G, random_state=3)
    out1, hist1 = m1.train(num_epochs=30, learning_rate=0.1, print_each=None)

    fm = FakeMap()
    fm.X = out1
    m2 = Mapper(S=S, G=G, adata_map=fm)
    out2, hist2 = m2.train(num_epochs=1, learning_rate=0.0, print_each=None)
    # epoch-0 loss of the resumed run ≈ the converged loss of run 1
    assert hist2["total_loss"][0] == pytest.approx(hist1["total_loss"][-1], rel=1e-3)
    np.testing.assert_allclose(out2, out1, atol=1e-5)


@pytest.mark.parametrize("seed", range(8))
def test_mapper_trajectory_fuzz_vs_reference(seed):
    """Randomized differential test: random shapes and random λ draws, full
    30-epoch trajectory vs the live torch reference. Regularizers are drawn
    independently so untested combinations (e.g. entropy + neighborhood +
    L1) appear over the seeds."""
    frng = np.random.default_rng(900 + seed)
    c = int(frng.integers(6, 40))
    s = int(frng.integers(5, 30))
    g = int(frng.integers(4, 16))
    S = frng.poisson(2.0, (c, g)).astype(np.float32) + 0.1
    G = frng.poisson(3.0, (s, g)).astype(np.float32) + 0.1

    kwargs = dict(lambda_g1=float(frng.uniform(0.5, 2.0)))
    d = None
    if frng.random() < 0.6:
        d = frng.random(s).astype(np.float32)
        d /= d.sum()
        kwargs["lambda_d"] = float(frng.uniform(0.2, 1.5))
    if frng.random() < 0.5:
        kwargs["lambda_g2"] = float(frng.uniform(0.1, 1.0))
    if frng.random() < 0.4:
        kwargs["lambda_r"] = float(frng.uniform(0.01, 0.2))
    if frng.random() < 0.3:
        kwargs["lambda_l1"] = float(frng.uniform(0.001, 0.02))
    if frng.random() < 0.3:
        kwargs["lambda_l2"] = float(frng.uniform(0.001, 0.01))
    if frng.random() < 0.4:
        W = (frng.random((s, s)) * (frng.random((s, s)) < 0.3)).astype(np.float32)
        kwargs["voxel_weights"] = W
        kwargs["lambda_neighborhood_g1"] = float(frng.uniform(0.1, 0.8))

    seed_init = int(frng.integers(1, 10_000))
    ref = REF.Mapper(S=S, G=G, d=d, random_state=seed_init, **kwargs)
    ref_out, ref_hist = ref.train(num_epochs=30, learning_rate=0.1,
                                  print_each=None)
    ours = Mapper(S=S, G=G, d=d, random_state=seed_init, **kwargs)
    out, hist = ours.train(num_epochs=30, learning_rate=0.1, print_each=None)

    msg = f"c={c} s={s} g={g} seed={seed_init} kwargs={list(kwargs)}"
    ref_losses = np.array([float(x) for x in ref_hist["total_loss"]])
    np.testing.assert_allclose(np.array(hist["total_loss"]), ref_losses,
                               rtol=5e-3, atol=5e-4, err_msg=msg)
    assert hist["total_loss"][0] == pytest.approx(ref_losses[0], rel=3e-4), msg
    np.testing.assert_allclose(out, ref_out, atol=3e-3, err_msg=msg)
