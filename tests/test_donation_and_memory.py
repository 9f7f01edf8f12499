"""Round-3 fixes: buffer donation through the public train API, and
device-memory-derived auto batch sizing.

The public ``Mapper.train`` / ``MapperConstrained.train`` donate the
pre-training logits (they rebind ``self.M`` right after), so the largest
single-chip-trainable shape through ``map_cells_to_space`` matches what the
functional path achieves with manual ``donate=True`` — donation must not
change a single bit of the result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tangram_tpu.models.mapper import (
    Mapper,
    MapperConstrained,
    fit_mapping,
    init_constrained_logits,
)
from tangram_tpu.utils import device_memory_budget


@pytest.fixture
def problem(rng):
    S = (rng.poisson(2.0, (14, 7)) + 0.5).astype(np.float32)
    G = (rng.poisson(3.0, (10, 7)) + 0.5).astype(np.float32)
    d = np.full(10, 1 / 10, np.float32)
    return S, G, d


def test_mapper_train_donates_and_is_bit_identical(problem):
    S, G, d = problem
    m = Mapper(S=S, G=G, d=d, lambda_d=1.0, random_state=3)
    M0 = np.array(m.M)  # host copy survives donation
    live = m.M
    out, hist = m.train(num_epochs=6, learning_rate=0.1, print_each=None)
    # the incoming buffer was consumed by the computation...
    assert live.is_deleted()
    # ...and the result is bitwise equal to the undonated functional path
    params, h = fit_mapping(jnp.asarray(M0), m.data, m.lw, 6, 0.1)
    np.testing.assert_array_equal(out, np.asarray(jax.nn.softmax(params, axis=1)))
    np.testing.assert_array_equal(
        np.asarray(hist["main_loss"]), np.asarray(h["main_loss"])
    )


def test_mapper_train_twice_works_after_donation(problem):
    """self.M is rebound to the trained params, so a second train() call
    continues from them without touching the deleted buffer."""
    S, G, d = problem
    m = Mapper(S=S, G=G, random_state=3)
    m.train(num_epochs=3, learning_rate=0.1, print_each=None)
    out2, _ = m.train(num_epochs=3, learning_rate=0.1, print_each=None)
    np.testing.assert_allclose(out2.sum(axis=1), 1.0, rtol=1e-5)


def test_constrained_train_donates_and_is_bit_identical(problem):
    S, G, d = problem
    mc = MapperConstrained(S=S, G=G, d=d, target_count=8, random_state=3)
    M0, F0 = np.array(mc.M), np.array(mc.F)
    live_M, live_F = mc.M, mc.F
    out, F_out, hist = mc.train(num_epochs=6, learning_rate=0.1, print_each=None)
    assert live_M.is_deleted() and live_F.is_deleted()
    params, h = fit_mapping(
        (jnp.asarray(M0), jnp.asarray(F0)), mc.data, mc.lw, 6, 0.1,
        constrained=True,
    )
    np.testing.assert_array_equal(
        out, np.asarray(jax.nn.softmax(params[0], axis=1))
    )
    np.testing.assert_array_equal(F_out, np.asarray(jax.nn.sigmoid(params[1])))


def test_early_stop_path_donates_and_matches(problem):
    S, G, d = problem
    m = Mapper(S=S, G=G, random_state=5)
    M0 = np.array(m.M)
    out, hist = m.train(
        num_epochs=12, learning_rate=0.1, print_each=None,
        early_stop_tol=0.0, early_stop_window=4,
    )
    epochs_run = len(hist["main_loss"])
    params, h = fit_mapping(jnp.asarray(M0), m.data, m.lw, epochs_run, 0.1)
    np.testing.assert_array_equal(out, np.asarray(jax.nn.softmax(params, axis=1)))


# ---------------------------------------------------------------------------
# device_memory_budget
# ---------------------------------------------------------------------------


class _FakeDevice:
    def __init__(self, platform, stats):
        self.platform = platform
        self._stats = stats

    def memory_stats(self):
        return self._stats


def test_memory_budget_uses_reported_limit():
    dev = _FakeDevice("tpu", {"bytes_limit": 34_089_730_048, "bytes_in_use": 5})
    assert device_memory_budget(dev) == pytest.approx(0.5 * 34_089_730_048)
    assert device_memory_budget(dev, fraction=0.25) == pytest.approx(
        0.25 * 34_089_730_048
    )


def test_memory_budget_fallbacks():
    assert device_memory_budget(_FakeDevice("tpu", None)) == 8e9
    assert device_memory_budget(_FakeDevice("cpu", {})) == 2e9
    # a device whose memory_stats raises also falls back
    class Raising:
        platform = "tpu"

        def memory_stats(self):
            raise RuntimeError("unsupported")

    assert device_memory_budget(Raising()) == 8e9


def test_memory_budget_queries_each_device_once():
    """bytes_limit is static per chip — repeated budget calls (halving
    calls one per rung) must reuse the first query's answer."""
    calls = []

    class Counting:
        platform = "tpu"

        def memory_stats(self):
            calls.append(1)
            return {"bytes_limit": 16e9}

    dev = Counting()
    assert device_memory_budget(dev) == pytest.approx(8e9)
    assert device_memory_budget(dev, fraction=0.25) == pytest.approx(4e9)
    assert len(calls) == 1


def test_memory_budget_survives_hung_backend(monkeypatch):
    """A remote backend whose memory_stats RPC never returns must not hang
    auto batch sizing — the query is bounded and degrades to the constant."""
    import time

    import tangram_tpu.utils as tpu_utils

    class Hanging:
        platform = "tpu"

        def memory_stats(self):
            time.sleep(30)
            return {"bytes_limit": 1}

    real_helper = tpu_utils._memory_stats_with_timeout
    t0 = time.perf_counter()
    assert real_helper(Hanging(), timeout_s=0.2) is None
    assert time.perf_counter() - t0 < 5.0

    # the public entry falls back; shorten the helper's timeout so the
    # test stays fast (the production default is 5 s)
    monkeypatch.setattr(
        tpu_utils, "_memory_stats_with_timeout",
        lambda device: real_helper(device, timeout_s=0.2),
    )
    t0 = time.perf_counter()
    assert device_memory_budget(Hanging()) == 8e9
    assert time.perf_counter() - t0 < 5.0
