"""Verbose-output parity: score lines print live, in the reference's text
format ("Gene-voxel score: 0.123, Cell densities reg: 0.456")."""

import re

import numpy as np
import pytest

from tangram_tpu.models.mapper import Mapper, MapperConstrained

from _reference import load_reference_optimizer

REF = load_reference_optimizer()


@pytest.fixture
def problem(rng):
    S = (rng.poisson(2.0, (12, 8)) + 0.5).astype(np.float32)
    G = (rng.poisson(3.0, (9, 8)) + 0.5).astype(np.float32)
    d = np.full(9, 1 / 9, np.float32)
    return S, G, d


def test_print_lines_format_and_cadence(problem, capsys):
    S, G, d = problem
    mapper = Mapper(S=S, G=G, d=d, lambda_d=1.0, random_state=1)
    mapper.train(num_epochs=25, learning_rate=0.1, print_each=10)
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 3  # epochs 0, 10, 20
    for line in lines:
        assert re.match(
            r"Gene-voxel score: -?\d+\.\d{3}, Cell densities reg: -?\d+\.\d{3}", line
        ), line


@pytest.mark.skipif(REF is None, reason="reference torch optimizer unavailable")
def test_print_text_matches_reference(problem, capsys):
    """First-epoch verbose line is byte-identical to the reference's."""
    S, G, d = problem

    ref = REF.Mapper(S=S, G=G, d=d, lambda_d=1.0, random_state=7)
    ref._loss_fn(verbose=True)
    ref_line = capsys.readouterr().out.strip().splitlines()[0]

    ours = Mapper(S=S, G=G, d=d, lambda_d=1.0, random_state=7)
    ours._loss_fn(verbose=True)
    our_line = capsys.readouterr().out.strip().splitlines()[0]

    assert our_line == ref_line


def test_constrained_print_format(problem, capsys):
    S, G, d = problem
    mapper = MapperConstrained(S=S, G=G, d=d, target_count=5, random_state=1)
    mapper.train(num_epochs=5, learning_rate=0.1, print_each=5)
    out = capsys.readouterr().out
    assert "Score:" in out and "Count reg:" in out and "Lambda f reg:" in out


def test_print_and_val_combined(problem, capsys):
    """print_each chunking + val_each cadence work together."""
    S, G, d = problem
    mapper = Mapper(S=S, G=G, random_state=2)
    out, hist = mapper.train(num_epochs=20, learning_rate=0.1,
                             print_each=10, val_each=4)
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    assert len(hist["val_gene_sim"]) == 5  # epochs 0,4,8,12,16
    assert len(hist["total_loss"]) == 20


def test_print_each_zero_means_no_printing(problem, capsys):
    """print_each=0 must behave like None (the reference fails fast on
    `t % 0`; a zero chunk size must not hang the chunked scan)."""
    S, G, d = problem
    mapper = Mapper(S=S, G=G, random_state=2)
    out, hist = mapper.train(num_epochs=5, learning_rate=0.1, print_each=0)
    assert capsys.readouterr().out == ""
    assert len(hist["total_loss"]) == 5

    mc = MapperConstrained(S=S, G=G, d=d, target_count=6, random_state=2)
    _, _, hist_c = mc.train(num_epochs=3, learning_rate=0.1, print_each=0)
    assert capsys.readouterr().out == ""
    assert len(hist_c["total_loss"]) == 3


def test_zero_epochs_does_not_crash(problem):
    S, G, d = problem
    mapper = Mapper(S=S, G=G, random_state=2)
    out, hist = mapper.train(num_epochs=0, learning_rate=0.1, print_each=10)
    assert hist["total_loss"] == []
    np.testing.assert_allclose(out.sum(axis=1), 1.0, rtol=1e-5)


def test_val_metrics_are_post_step(problem):
    """Validation entries must reflect the reference's order — evaluated
    after optimizer.step() (mapping_optimizer.py:394-403), so the epoch-0
    value differs from metrics of the raw init."""
    from tangram_tpu.ops.losses import val_metrics

    S, G, d = problem
    m = Mapper(S=S, G=G, random_state=2)
    # host copy: train() donates the logits buffer (documented), so the live
    # m.M array is consumed by the computation
    M0 = np.array(m.M)
    out, hist = m.train(num_epochs=3, learning_rate=0.1, print_each=None, val_each=1)
    pre_step = float(val_metrics(M0, m.data.S, m.data.G)["val_gene_sim"])
    post_step = float(val_metrics(m.M, m.data.S, m.data.G)["val_gene_sim"])
    assert hist["val_gene_sim"][0] != pytest.approx(pre_step, abs=1e-9)
    # the last recorded entry is the metric after the final step
    assert hist["val_gene_sim"][-1] == pytest.approx(post_step, rel=1e-5)


def test_sparse_val_cadence_entries_are_finite(problem):
    """With val_each=7 only evaluated epochs survive into the history and
    none of them are the NaN placeholders of skipped epochs."""
    S, G, d = problem
    m = Mapper(S=S, G=G, random_state=2)
    _, hist = m.train(num_epochs=20, learning_rate=0.1, print_each=None, val_each=7)
    assert len(hist["val_gene_sim"]) == 3  # epochs 0, 7, 14
    assert np.isfinite(hist["val_gene_sim"]).all()


def test_constrained_prints_stream_per_chunk(problem, capsys):
    """Constrained score lines appear per print_each chunk (live streaming,
    like the reference loop), and chunking stays bit-exact with one scan."""
    S, G, d = problem
    mc = MapperConstrained(S=S, G=G, d=d, target_count=6, random_state=2)
    out_c, F_c, hist_c = mc.train(num_epochs=20, learning_rate=0.1, print_each=10)
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2  # epochs 0 and 10

    mc2 = MapperConstrained(S=S, G=G, d=d, target_count=6, random_state=2)
    out_1, F_1, hist_1 = mc2.train(num_epochs=20, learning_rate=0.1, print_each=None)
    np.testing.assert_allclose(out_c, out_1, atol=1e-6)
    np.testing.assert_allclose(F_c, F_1, atol=1e-6)
    np.testing.assert_allclose(hist_c["total_loss"], hist_1["total_loss"], rtol=1e-6)


# ---------------------------------------------------------------------------
# mesh-path UX parity: score lines stream live on sharded training too
# ---------------------------------------------------------------------------


def _cell_mesh(n=4):
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:n]).reshape(-1), axis_names=("cell",))


def test_mesh_prints_stream_and_match_single_device(problem, capsys):
    """print_each on a mesh chunks the sharded scan: lines stream per chunk
    and the result matches the single-device run."""
    S, G, d = problem
    m = Mapper(S=S, G=G, d=d, lambda_d=1.0, random_state=2, mesh=_cell_mesh())
    out_m, hist_m = m.train(num_epochs=20, learning_rate=0.1, print_each=10)
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2  # epochs 0 and 10
    assert lines[0].startswith("Gene-voxel score:")

    m1 = Mapper(S=S, G=G, d=d, lambda_d=1.0, random_state=2)
    out_1, hist_1 = m1.train(num_epochs=20, learning_rate=0.1, print_each=None)
    np.testing.assert_allclose(out_m, out_1, atol=2e-5)
    np.testing.assert_allclose(
        hist_m["main_loss"], hist_1["main_loss"], atol=2e-4
    )


def test_mesh_val_cadence_survives_print_chunking(problem):
    """val_each that does not divide print_each: the sharded scan carries
    the absolute epoch index (step_offset), so validation happens at epochs
    0, 7, 14 — not restarting at each chunk boundary."""
    S, G, d = problem
    m = Mapper(S=S, G=G, random_state=2, mesh=_cell_mesh())
    _, hist = m.train(num_epochs=20, learning_rate=0.1, print_each=10,
                      val_each=7)
    assert len(hist["val_gene_sim"]) == 3  # epochs 0, 7, 14
    assert np.isfinite(hist["val_gene_sim"]).all()

    m1 = Mapper(S=S, G=G, random_state=2)
    _, hist1 = m1.train(num_epochs=20, learning_rate=0.1, print_each=None,
                        val_each=7)
    np.testing.assert_allclose(
        hist["val_gene_sim"], hist1["val_gene_sim"], atol=2e-4
    )


def test_mesh_early_stop_any_val_cadence(problem):
    """early_stop_window need not be a multiple of val_each on a mesh
    anymore (round-2 restriction lifted via step_offset)."""
    S, G, d = problem
    m = Mapper(S=S, G=G, random_state=2, mesh=_cell_mesh())
    out, hist = m.train(num_epochs=24, learning_rate=0.1, print_each=None,
                        val_each=3, early_stop_tol=0.0, early_stop_window=10)
    epochs_run = len(hist["main_loss"])
    assert epochs_run <= 24
    vals = np.asarray(hist["val_gene_sim"])
    assert len(vals) == len(range(0, epochs_run, 3))
    assert np.isfinite(vals).all()


def test_constrained_mesh_prints_stream(problem, capsys):
    S, G, d = problem
    mc = MapperConstrained(S=S, G=G, d=d, target_count=6, random_state=2,
                           mesh=_cell_mesh())
    out_c, F_c, hist_c = mc.train(num_epochs=20, learning_rate=0.1,
                                  print_each=10)
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    assert lines[0].startswith("Score:")

    mc1 = MapperConstrained(S=S, G=G, d=d, target_count=6, random_state=2)
    out_1, F_1, _ = mc1.train(num_epochs=20, learning_rate=0.1,
                              print_each=None)
    np.testing.assert_allclose(out_c, out_1, atol=2e-5)
    np.testing.assert_allclose(F_c, F_1, atol=2e-5)


def test_divergence_warning(problem, caplog):
    """A run whose loss goes non-finite warns with the first bad epoch (the
    reference trains through NaNs silently); a healthy run stays silent."""
    import logging

    S, G, d = problem
    # an absurd L2 weight overflows f32 at the first loss evaluation
    with caplog.at_level(logging.WARNING):
        Mapper(S=S, G=G, d=d, lambda_d=1.0, lambda_l2=1e38,
               random_state=0).train(num_epochs=8, learning_rate=1e3,
                                     print_each=None)
    assert any("diverged" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING):
        Mapper(S=S, G=G, d=d, lambda_d=1.0, random_state=0).train(
            num_epochs=8, learning_rate=0.1, print_each=None)
    assert not any("diverged" in r.message for r in caplog.records)
