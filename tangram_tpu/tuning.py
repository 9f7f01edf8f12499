"""Hyperparameter tuning: an on-device population search.

Reference behavior being reproduced (``mapping_parameter_tuning.py``):
``mapping_hyperparameter_tuning(adata_sc, adata_sp, metric, config, ...)``
runs trials over a search space; each trial trains 3 seeded mappers
(``:109-131``) and reports 5 metrics (``:135-139``): three stability metrics
across the repeat runs (``pearson_corr`` ``:42``, ``vote_entropy`` ``:55``,
``consensus_entropy`` ``:71``), gene-expression consistency, and the
validation gene score.

TPU-native redesign: the reference ships dense S/G to a Ray worker process
per trial (``:263-271``, process-level parallelism with no sharing). Here the
loss takes its lambdas as *traced* scalars, so a single compiled
``lax.scan`` training program serves every sampled configuration, and
(config × repeat) batches run as one ``jax.vmap`` on device — the tuner is a
population of mapping problems, not a queue of processes. Sampling uses a
scrambled Sobol sequence (better space coverage than i.i.d. random at equal
sample counts).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

import numpy as np
import pandas as pd

from . import spatial as sw
from .utils import _SweepJournal, one_hot_encoding


from .utils import warn_tp_replication as _warn_tp_replication

__all__ = [
    "uniform",
    "loguniform",
    "choice",
    "pearson_corr",
    "vote_entropy",
    "consensus_entropy",
    "train_multiple_Mapper",
    "mapping_hyperparameter_tuning",
    "TunerResult",
]

TUNABLE_KEYS = [
    "learning_rate",
    # extensions: searchable cosine lr schedule (lr_peak -> lr_end over
    # num_epochs); constant learning_rate remains the default behavior
    "lr_peak",
    "lr_end",
    "num_epochs",
    "lambda_d",
    "lambda_g1",
    "lambda_g2",
    "lambda_neighborhood_g1",
    "lambda_r",
    "lambda_l1",
    "lambda_l2",
    "lambda_ct_islands",
    "lambda_getis_ord",
]
METRIC_KEYS = [
    "cell_map_consistency",
    "cell_map_agreement",
    "cell_map_certainty",
    "gene_expr_consistency",
    "gene_expr_correctness",
]
N_REPEATS = 3  # seeded repeat runs per configuration (reference :109)


# ---------------------------------------------------------------------------
# search-space distributions (ray.tune-compatible duck types accepted too)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class uniform:
    low: float
    high: float

    def from_unit(self, u):
        return self.low + (self.high - self.low) * u


@dataclass(frozen=True)
class loguniform:
    low: float
    high: float

    def from_unit(self, u):
        return float(np.exp(np.log(self.low) + (np.log(self.high) - np.log(self.low)) * u))


@dataclass(frozen=True)
class choice:
    values: tuple

    def __init__(self, values):
        object.__setattr__(self, "values", tuple(values))

    def from_unit(self, u):
        return self.values[min(int(u * len(self.values)), len(self.values) - 1)]


def _coerce_domain(value):
    """Accept our dataclasses, plain constants, ray.tune domains, or optuna
    distributions.

    The reference's tuner takes a dict of ``ray.tune`` distributions
    (``mapping_parameter_tuning.py:14-22``); actual ray objects are accepted
    here structurally (``Float.lower/.upper`` with a log sampler carrying
    ``base``; ``Categorical.categories``) so a reference user's search-space
    dict works unchanged without ray installed. Optuna's
    ``FloatDistribution(.low/.high/.log)``, ``IntDistribution`` and
    ``CategoricalDistribution(.choices)`` are accepted the same way."""
    if isinstance(value, (uniform, loguniform, choice)):
        return value
    if isinstance(value, (int, float)):
        fixed = float(value)
        return uniform(fixed, fixed)
    cls = type(value).__name__.lower()
    if hasattr(value, "categories"):  # ray.tune.choice
        return choice(tuple(value.categories))
    if hasattr(value, "choices"):  # optuna CategoricalDistribution
        return choice(tuple(value.choices))
    if hasattr(value, "lower") and hasattr(value, "upper") and not isinstance(
        value, str
    ):
        # ray.tune.uniform / loguniform / quniform (Float/Integer domains)
        lo, hi = float(value.lower), float(value.upper)
        if "log" in cls or getattr(getattr(value, "sampler", None), "base", None):
            return loguniform(lo, hi)
        return uniform(lo, hi)
    if hasattr(value, "low") and hasattr(value, "high"):
        # optuna Float/Int distributions
        lo, hi = float(value.low), float(value.high)
        if getattr(value, "log", False) or "log" in cls:
            return loguniform(lo, hi)
        return uniform(lo, hi)
    raise ValueError(f"Unsupported search-space value: {value!r}")


# ---------------------------------------------------------------------------
# stability metrics (reference :42-82)
# ---------------------------------------------------------------------------


def _normalized_entropy(probs):
    """Row entropy of a (cells, spots) stochastic matrix, normalized to
    [0, 1] by log(n_spots). Rows are renormalized first (scipy.stats.entropy
    semantics) and 0·log0 := 0."""
    row_sums = probs.sum(axis=-1, keepdims=True)
    p = np.divide(probs, row_sums, out=np.zeros_like(probs), where=row_sums > 0)
    plogp = np.where(p > 0, p * np.log(np.where(p > 0, p, 1.0)), 0.0)
    return -plogp.sum(axis=-1) / np.log(probs.shape[-1])


def pearson_corr(cube):
    """Pairwise Pearson correlation of the flattened mapping matrices across
    the run axis (reference ``mapping_parameter_tuning.py:42-53`` reports the
    strict lower triangle of the run×run correlation matrix, pairs in
    row-major order: (1,0), (2,0), (2,1), ...).

    Computed as the gram matrix of the CENTERED rows: the mean comes from a
    BLAS gemv, the centering is one in-place pass over the f64 copy (no
    second N-sized allocation), and cov = X̃·X̃ᵀ is a BLAS gemm — the heavy
    O(runs · N) work never runs through numpy's generic loops, which the
    tuner would otherwise pay twice per trial. Centering before the gram
    (rather than cov = X·Xᵀ − ssᵀ/N) avoids catastrophic cancellation for
    high-mean/low-variance input. A zero-variance run reports 0
    correlation (np.corrcoef would emit NaN)."""
    p = cube.shape[0]
    flat = cube.reshape(p, -1).astype(np.float64)
    n = flat.shape[1]
    mean = (flat @ np.ones(n, dtype=np.float64)) / n
    flat -= mean[:, None]
    cov = flat @ flat.T
    var = np.maximum(np.diag(cov), 0.0)
    denom = np.sqrt(np.outer(var, var))
    i, j = np.tril_indices(p, -1)
    num, den = cov[i, j], denom[i, j]
    return np.divide(num, den, out=np.zeros_like(num), where=den > 0)


def vote_entropy(pred_probs_cube):
    """Disagreement of the runs' hard assignments (reference ``:55-69``):
    each run votes its argmax spot per cell; the entropy of the vote
    distribution, normalized by log(n_spots), is returned per cell."""
    n_runs, n_cells, n_spots = pred_probs_cube.shape
    votes = pred_probs_cube.argmax(axis=2)  # (runs, cells)
    vote_share = np.zeros((n_cells, n_spots))
    np.add.at(vote_share, (np.arange(n_cells)[None, :], votes), 1.0 / n_runs)
    return _normalized_entropy(vote_share)


def consensus_entropy(pred_probs_cube):
    """Peakedness of the run-averaged (consensus) mapping per cell,
    normalized by log(n_spots) (reference ``:71-82``)."""
    return _normalized_entropy(pred_probs_cube.mean(axis=0))


def _device_metrics(Ps, val_sims, S_val):
    """The 5 reported metrics of one config's repeat cube, on device
    (f32 analogues of :func:`pearson_corr`, :func:`vote_entropy`,
    :func:`consensus_entropy` + the masked-gene val score — the host
    functions remain the reference implementations, parity-pinned by
    tests/test_tuning.py).

    Keeping the (runs × cells × spots) cube on device means only these 5
    scalars ever cross the host boundary per trial, instead of the full
    cube (at the tutorial's cluster scale that is ~3.5 MB per trial of
    transfer plus host-side metric math per trial — the actual wall-clock
    bottleneck of a batched population sweep).

    ``Ps``: (runs, cells, spots) softmaxed maps. ``val_sims``: (runs,).
    ``S_val``: (cells, n_val_genes).
    """
    import jax.numpy as jnp

    p = Ps.shape[0]
    n_spots = Ps.shape[2]
    tri_i, tri_j = np.tril_indices(p, -1)

    def pearson_mean(flat):
        centered = flat - flat.mean(axis=1, keepdims=True)
        # full-f32 multiplies: TPU's default matmul precision is bf16, and
        # ~1e-3 noise here can rank-swap close trials in halving/TPE
        gram = jnp.einsum(
            "pn,qn->pq", centered, centered, precision="highest"
        )
        var = jnp.maximum(jnp.diagonal(gram), 0.0)
        denom = jnp.sqrt(jnp.outer(var, var))
        num, den = gram[tri_i, tri_j], denom[tri_i, tri_j]
        return jnp.where(den > 0, num / den, 0.0).mean()

    def norm_entropy_mean(probs):  # rows renormalized, 0·log0 := 0
        rs = probs.sum(axis=-1, keepdims=True)
        pr = jnp.where(rs > 0, probs / jnp.where(rs > 0, rs, 1.0), 0.0)
        plogp = jnp.where(
            pr > 0, pr * jnp.log(jnp.where(pr > 0, pr, 1.0)), 0.0
        )
        return (-plogp.sum(axis=-1) / jnp.log(n_spots)).mean()

    # vote entropy: Σ over vote groups of −(m/p)·log(m/p) equals a sum over
    # MEMBERS of −(1/p)·log(cnt/p), where cnt is each member's group size —
    # computable from pairwise vote equality without a (cells × spots)
    # scatter
    votes = jnp.argmax(Ps, axis=2)  # (p, cells)
    eq = votes[:, None, :] == votes[None, :, :]  # (p, p, cells)
    cnt = eq.sum(axis=1).astype(jnp.float32)  # (p, cells)
    vote_H = (-(1.0 / p) * jnp.log(cnt / p)).sum(axis=0) / jnp.log(n_spots)

    gene_cube = jnp.einsum("rcs,cg->rgs", Ps, S_val, precision="highest")
    return {
        "cell_map_consistency": pearson_mean(Ps.reshape(p, -1)),
        "cell_map_agreement": 1.0 - vote_H.mean(),
        "cell_map_certainty": 1.0 - norm_entropy_mean(Ps.mean(axis=0)),
        "gene_expr_consistency": pearson_mean(gene_cube.reshape(p, -1)),
        "gene_expr_correctness": val_sims.mean(),
    }


# ---------------------------------------------------------------------------
# traced-lambda loss: one compile for the whole population
# ---------------------------------------------------------------------------


def _tuner_loss(M, lam, data_arrays, active=None):
    """The tunable terms with traced weights, one compiled program per
    population.

    Mathematically identical to :func:`tangram_tpu.ops.losses.compute_loss`
    restricted to the tuner's whitelist (the tuner always builds every weight
    matrix, reference ``:250-255``). The core runs with ``impl='xla'``
    unconditionally: the population is batched with ``jax.vmap``, where the
    Pallas path is untested and unnecessary (per-trial problems small enough
    to batch are small enough for XLA).

    ``active`` (a set of λ keys, or None for "all") statically skips terms
    whose weight is zero across the WHOLE population: with traced λs every
    trial would otherwise pay the dense (spots × spots) W-products —
    ~50 GFLOP/step at real Visium spot counts — even when no spatial λ is
    in the search space. A zero λ makes the skipped term's value and
    gradient exactly zero, so the result is bit-comparable.
    """
    import jax.numpy as jnp

    from .ops.core import graph_matmul, mapper_core
    from .ops.losses import cosine_similarity, kl_div_sum

    (S, G, d, mask, voxel_w, nb_filter, ct_enc, spatial_w, getis_ref) = data_arrays
    if mask is not None:
        S = S * mask[None, :]
        G = G * mask[None, :]
    n_cells = M.shape[0]

    A = jnp.concatenate([S, ct_enc], axis=1)
    w = jnp.full((n_cells,), 1.0 / n_cells, dtype=M.dtype)
    Y, q, h = mapper_core(M, A, w, impl="xla")
    G_pred = Y[:, : S.shape[1]]
    ct_map = Y[:, S.shape[1]:]

    def mmean(v):
        if mask is None:
            return jnp.mean(v)
        return jnp.sum(v * mask) / jnp.sum(mask)

    def on(key):
        return active is None or key in active

    gv_sim = mmean(cosine_similarity(G_pred, G, axis=0))
    vg_sim = jnp.mean(cosine_similarity(G_pred, G, axis=1))
    total = -(lam["lambda_g1"] * gv_sim + lam["lambda_g2"] * vg_sim)
    if on("lambda_d"):
        total = total + lam["lambda_d"] * kl_div_sum(jnp.log(q), d)
    if on("lambda_r"):
        total = total + lam["lambda_r"] * -jnp.sum(h)
    if on("lambda_l1"):
        total = total + lam["lambda_l1"] * jnp.sum(jnp.abs(M))
    if on("lambda_l2"):
        total = total + lam["lambda_l2"] * jnp.sum(M * M)
    if on("lambda_ct_islands"):
        nb_ct = graph_matmul(nb_filter, ct_map)
        ct_penalty = jnp.mean(jnp.maximum(ct_map - nb_ct, 0.0))
        total = total + lam["lambda_ct_islands"] * ct_penalty
    if on("lambda_neighborhood_g1"):
        nb_sim = mmean(
            cosine_similarity(
                graph_matmul(voxel_w, G_pred), graph_matmul(voxel_w, G),
                axis=0,
            )
        )
        total = total - lam["lambda_neighborhood_g1"] * nb_sim
    if on("lambda_getis_ord"):
        getis_pred = graph_matmul(spatial_w, G_pred) / jnp.maximum(
            jnp.sum(G_pred, axis=0), 1e-30
        )
        getis_sim = mmean(cosine_similarity(getis_ref, getis_pred, axis=0))
        total = total - lam["lambda_getis_ord"] * getis_sim
    return total, gv_sim


def _active_lambdas(configs, lam_keys) -> frozenset:
    """λ keys with a nonzero value in ANY of the population's configs —
    everything else is statically zero and its term can be skipped
    (value and gradient exactly zero either way)."""
    return frozenset(
        k for k in lam_keys
        if any(float(cfg.get(k, 0.0)) != 0.0 for cfg in configs)
    )


def _space_active_lambdas(domains, lam_keys) -> frozenset:
    """λ keys that CAN be nonzero under the search space: any distribution
    counts (except a ``choice`` whose values are all zero), a fixed value
    by its literal, anything unrecognized conservatively counts. Derived
    once per tuner call so the active set — and therefore the compiled
    program — is stable across adaptive ask/tell rounds instead of
    flapping with each round's sampled values."""
    active = set()
    for k in lam_keys:
        v = domains.get(k, 0.0)
        if isinstance(v, choice):
            if any(float(x) != 0.0 for x in v.values):
                active.add(k)
        elif isinstance(v, uniform):
            # _coerce_domain renders a FIXED value as uniform(x, x), so a
            # pinned 0.0 arrives here as uniform(0, 0) — inactive
            if float(v.low) != 0.0 or float(v.high) != 0.0:
                active.add(k)
        elif isinstance(v, loguniform):
            active.add(k)
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            if float(v) != 0.0:
                active.add(k)
        else:
            active.add(k)
    return frozenset(active)


def train_multiple_Mapper(config, data):
    """Train N_REPEATS seeded mappers for one config and report the 5 metrics
    (reference ``:86-139``). Kept for API parity; the batched population path
    below is what the tuner itself uses."""
    (S, G, d_source, d, device, print_each, voxel_weights, ct_encode,
     neighborhood_filter, spatial_weights, train_genes_idx, val_genes_idx) = data
    del d_source, device, print_each

    report = _run_population(
        configs=[{k: float(v) for k, v in config.items()}],
        S=S, G=G, d=d,
        voxel_weights=voxel_weights,
        neighborhood_filter=neighborhood_filter,
        ct_encode=ct_encode,
        spatial_weights=spatial_weights,
        train_genes_idx=train_genes_idx,
        val_genes_idx=val_genes_idx,
    )
    return report.iloc[0].to_dict()


class _PopulationSetup:
    """Device arrays + repeat inits shared by every tuner search mode."""

    def __init__(self, S, G, d, voxel_weights, neighborhood_filter,
                 ct_encode, spatial_weights, train_genes_idx, val_genes_idx):
        import jax.numpy as jnp

        from .models.mapper import init_logits

        n_cells, n_spots = S.shape[0], G.shape[0]
        g_all = S.shape[1]
        train_mask = np.zeros(g_all, np.float32)
        train_mask[np.asarray(train_genes_idx)] = 1.0
        self.train_mask = train_mask
        self.val_genes_idx = val_genes_idx
        self.S = S
        # raw (unmasked) S restricted to the val genes — the gene-space
        # stability metrics project each run's map through it on device
        self.S_val_dev = jnp.asarray(
            np.asarray(S)[:, np.asarray(val_genes_idx)]
        )

        self.S_dev = jnp.asarray(S)
        self.G_dev = jnp.asarray(G)
        arrays = (
            self.S_dev,
            self.G_dev,
            jnp.asarray(d, dtype=jnp.float32),
            jnp.asarray(train_mask),
            jnp.asarray(np.asarray(voxel_weights), dtype=jnp.float32),
            jnp.asarray(np.asarray(neighborhood_filter), dtype=jnp.float32),
            jnp.asarray(np.asarray(ct_encode), dtype=jnp.float32),
            jnp.asarray(np.asarray(spatial_weights), dtype=jnp.float32),
        )

        # Getis-Ord reference on the (masked) training genes — computed on
        # device: the (spots × spots) @ (spots × genes) product is ~50
        # GFLOP at real Visium spot counts, a minute of single-core numpy
        # but sub-millisecond on the chip (the weights are uploaded anyway)
        import jax

        Gm = self.G_dev * arrays[3][None, :]
        getis_ref = jax.jit(
            # full-f32 multiplies (TPU default is bf16): this is the loss
            # term's reference vector, computed once
            lambda W, X: jnp.einsum("st,tg->sg", W, X, precision="highest")
            / jnp.maximum(X.sum(axis=0), 1e-30)
        )(arrays[7], Gm)
        self.arrays = arrays + (getis_ref,)

        # Repeat-run inits reproduce the reference stream exactly: run r
        # passes random_state=r to the Mapper
        # (mapping_parameter_tuning.py:121), and random_state=0 is falsy
        # there, so run 0 continues the ambient numpy stream while runs 1, 2
        # reseed — init_logits('numpy') has the same semantics, making the 5
        # stability metrics comparable run-for-run with the reference tuner
        # (tests/test_tuning.py pins this).
        self.M0s = jnp.stack(
            [init_logits(n_cells, n_spots, r, "auto") for r in range(N_REPEATS)]
        )

        self.lam_keys = [
            k for k in TUNABLE_KEYS
            if k not in ("learning_rate", "lr_peak", "lr_end", "num_epochs")
        ]
        self._fit_cache = {}

    def fit_batched(self, num_epochs: int, active: Optional[frozenset] = None):
        """The jitted (configs × repeats) population trainer for a scan
        length and active-λ set, cached per (num_epochs, active) — the
        adaptive search calls this every ask/tell round and must reuse one
        compiled program instead of re-tracing an identical one per
        round."""
        num_epochs = int(num_epochs)
        cache_key = (num_epochs, active)
        if cache_key in self._fit_cache:
            return self._fit_cache[cache_key]

        import jax
        import jax.numpy as jnp
        import optax

        from .models.mapper import make_adam
        from .ops.losses import val_metrics
        from .ops.schedules import cosine_value

        lam_keys = self.lam_keys

        # The data (loss arrays, S/G, gene mask) is threaded as jit
        # ARGUMENTS, not closure captures: a closed-over concrete array is
        # baked into the compiled program as a constant — at real spot
        # counts the three dense (spots × spots) weight matrices alone are
        # ~1 GB of program text (duplicated in HBM next to the live copies,
        # and oversized for remote-compile transports).
        def fit_one(lam_vec, lr_peak, lr_end, M0, arrays, S_dev, G_dev,
                    mask_dev):
            lam = {k: lam_vec[i] for i, k in enumerate(lam_keys)}

            # adam(1.0) scaled by the per-epoch cosine lr is bit-identical
            # to adam(lr) when lr_peak == lr_end (constant — the reference
            # setup)
            optimizer = make_adam(1.0)
            opt_state = optimizer.init(M0)

            def step(carry, t):
                M, opt_state = carry
                lr_t = cosine_value(t, lr_peak, lr_end, num_epochs, xp=jnp)
                grads = jax.grad(
                    lambda m: _tuner_loss(m, lam, arrays, active)[0]
                )(M)
                updates, opt_state = optimizer.update(grads, opt_state, M)
                updates = jax.tree.map(lambda u: u * lr_t, updates)
                return (optax.apply_updates(M, updates), opt_state), None

            (M, _), _ = jax.lax.scan(
                step, (M0, opt_state),
                jnp.arange(num_epochs, dtype=jnp.float32),
            )
            P = jax.nn.softmax(M, axis=1)
            # reference quirk: _val_loss_fn evaluates on the train split
            vm = val_metrics(M, S_dev, G_dev, gene_mask=mask_dev, impl="xla")
            return P, vm["val_gene_sim"]

        data_axes = (None, None, None, None)

        def fit_config(lam_vec, lr_peak, lr_end, M0s, arrays, S_dev, G_dev,
                       mask_dev, S_val):
            Ps, val_sims = jax.vmap(  # repeats
                fit_one, in_axes=(None, None, None, 0) + data_axes,
            )(lam_vec, lr_peak, lr_end, M0s, arrays, S_dev, G_dev, mask_dev)
            return _device_metrics(Ps, val_sims, S_val)

        raw = jax.jit(
            jax.vmap(  # over configs
                fit_config, in_axes=(0, 0, 0, None) + data_axes + (None,),
            )
        )
        mask_dev = jnp.asarray(self.train_mask)

        def fn(lam_mat, lr_peaks, lr_ends, M0s):
            return raw(lam_mat, lr_peaks, lr_ends, M0s, self.arrays,
                       self.S_dev, self.G_dev, mask_dev, self.S_val_dev)

        self._fit_cache[cache_key] = fn
        return fn

    def fit_halving(self, num_epochs: int, active: Optional[frozenset] = None):
        """The jitted resumable (configs × repeats) trainer halving rungs
        use: continues each run for ``steps`` epochs from absolute epoch
        ``start``, carrying Adam state, with the cosine schedule spanning
        the FULL ``num_epochs`` budget (partial training follows the same
        trajectory a full run would). Cached per (num_epochs, active) like
        :meth:`fit_batched` — ``search="adaptive+halving"`` calls this once
        per TPE bracket, and every bracket replays the same rung shapes, so
        the jit trace cache must persist across brackets instead of being
        rebuilt (and recompiled) per `_run_halving` call."""
        num_epochs = int(num_epochs)
        cache_key = ("halving", num_epochs, active)
        if cache_key in self._fit_cache:
            return self._fit_cache[cache_key]

        import jax
        import jax.numpy as jnp
        import optax

        from .models.mapper import make_adam
        from .ops.losses import val_metrics
        from .ops.schedules import cosine_value

        lam_keys = self.lam_keys

        def fit_chunk(lam_vec, lr_peak, lr_end, M, count, mu, nu, start,
                      steps, arrays, S_dev, G_dev, mask_dev):
            # data rides as jit arguments, not closure constants (see
            # fit_batched above)
            lam = {k: lam_vec[i] for i, k in enumerate(lam_keys)}
            optimizer = make_adam(1.0)
            template = optimizer.init(M)
            opt_state = (
                template[0]._replace(count=count, mu=mu, nu=nu),
            ) + tuple(template[1:])

            def step(carry, t):
                M, opt_state = carry
                lr_t = cosine_value(t, lr_peak, lr_end, num_epochs, xp=jnp)
                grads = jax.grad(
                    lambda m: _tuner_loss(m, lam, arrays, active)[0]
                )(M)
                updates, opt_state = optimizer.update(grads, opt_state, M)
                updates = jax.tree.map(lambda u: u * lr_t, updates)
                return (optax.apply_updates(M, updates), opt_state), None

            (M, opt_state), _ = jax.lax.scan(
                step, (M, opt_state),
                start + jnp.arange(steps, dtype=jnp.float32),
            )
            adam = opt_state[0]
            P = jax.nn.softmax(M, axis=1)
            vm = val_metrics(M, S_dev, G_dev, gene_mask=mask_dev, impl="xla")
            return M, adam.count, adam.mu, adam.nu, P, vm["val_gene_sim"]

        data_axes = (None, None, None, None)

        def chunk_config(lam_vec, lr_peak, lr_end, M, count, mu, nu, start,
                         steps, arrays_, S_dev_, G_dev_, mask_dev_, S_val):
            M, count, mu, nu, Ps, val_sims = jax.vmap(  # repeats
                fit_chunk,
                in_axes=(None, None, None, 0, 0, 0, 0, None, None)
                + data_axes,
            )(lam_vec, lr_peak, lr_end, M, count, mu, nu, start, steps,
              arrays_, S_dev_, G_dev_, mask_dev_)
            return M, count, mu, nu, _device_metrics(Ps, val_sims, S_val)

        fit_raw = jax.jit(
            jax.vmap(  # configs
                chunk_config,
                in_axes=(0, 0, 0, 0, 0, 0, 0, None, None) + data_axes
                + (None,),
            ),
            static_argnums=(8,),
        )
        mask_dev = jnp.asarray(self.train_mask)

        def fn(lam_mat_, lr_peaks_, lr_ends_, M_, count_, mu_, nu_, start_,
               steps_):
            return fit_raw(lam_mat_, lr_peaks_, lr_ends_, M_, count_, mu_,
                           nu_, start_, steps_, self.arrays, self.S_dev,
                           self.G_dev, mask_dev, self.S_val_dev)

        self._fit_cache[cache_key] = fn
        return fn

    def lam_matrix(self, configs, idxs):
        import jax.numpy as jnp

        return jnp.asarray(
            [[float(configs[i].get(k, 0.0)) for k in self.lam_keys]
             for i in idxs],
            dtype=jnp.float32,
        )

    def lr_vectors(self, configs, idxs):
        import jax.numpy as jnp

        peaks, ends = [], []
        for i in idxs:
            pk = float(
                configs[i].get("lr_peak", configs[i].get("learning_rate", 0.1))
            )
            peaks.append(pk)
            ends.append(float(configs[i].get("lr_end", pk)))
        return (jnp.asarray(peaks, dtype=jnp.float32),
                jnp.asarray(ends, dtype=jnp.float32))

    def metrics_row(self, cube, val_scores_row):
        """The reference tuner's 5 reported metrics for one trial
        (mapping_parameter_tuning.py:135-139) from its repeat-run cube.

        Host (numpy, f64) reference implementation; the population paths
        compute the same metrics on device (:func:`_device_metrics` —
        equivalence pinned by tests) so the cube never leaves the chip."""
        gene_cube = np.array(
            [self.S[:, np.asarray(self.val_genes_idx)].T @ cube[r]
             for r in range(N_REPEATS)]
        )
        return {
            "cell_map_consistency": float(pearson_corr(cube).mean()),
            "cell_map_agreement": float(1 - vote_entropy(cube).mean()),
            "cell_map_certainty": float(1 - consensus_entropy(cube).mean()),
            "gene_expr_consistency": float(pearson_corr(gene_cube).mean()),
            "gene_expr_correctness": float(np.mean(val_scores_row)),
        }


def _run_population(
    configs,
    S,
    G,
    d,
    voxel_weights,
    neighborhood_filter,
    ct_encode,
    spatial_weights,
    train_genes_idx,
    val_genes_idx,
    population_batch_size: int = 4,
    verbose: bool = False,
    mesh=None,
    setup: Optional[_PopulationSetup] = None,
    active: Optional[frozenset] = None,
):
    import jax

    if setup is None:
        setup = _PopulationSetup(
            S, G, d, voxel_weights, neighborhood_filter, ct_encode,
            spatial_weights, train_genes_idx, val_genes_idx,
        )
    M0s = setup.M0s

    results = []
    # group configs by num_epochs (static scan length)
    by_epochs: dict[int, list[int]] = {}
    for idx, cfg in enumerate(configs):
        by_epochs.setdefault(int(cfg.get("num_epochs", 1000)), []).append(idx)

    # λ keys that are zero across the whole population: their terms are
    # statically skipped (notably the dense W-product spatial terms). The
    # public tuner passes a search-space-derived set so it is identical
    # across adaptive rounds; direct callers fall back to this batch.
    if active is None:
        active = _active_lambdas(configs, setup.lam_keys)

    # Mesh layout mirrors _cross_val_batched: trials ride the axis named
    # "trial" (or the mesh's first axis); any REMAINING axes tensor-shard
    # each trial's cell dimension (hierarchical DP×TP — trial groups in
    # parallel, each group's chips splitting the per-repeat logits and Adam
    # moments by cells).
    if mesh is not None:
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec

        trial_axis = "trial" if "trial" in mesh.axis_names else mesh.axis_names[0]
        trial_axis_size = int(mesh.shape[trial_axis])
        config_sharding = NamedSharding(mesh, PartitionSpec(trial_axis))
        cell_axes = tuple(a for a in mesh.axis_names if a != trial_axis)
        shards = int(np.prod([mesh.shape[a] for a in cell_axes])) if cell_axes else 1
        if cell_axes and M0s.shape[1] % shards == 0:
            spec = cell_axes if len(cell_axes) > 1 else cell_axes[0]
            M0s = _jax.device_put(
                M0s, NamedSharding(mesh, PartitionSpec(None, spec, None))
            )
        elif cell_axes:
            _warn_tp_replication(shards, cell_axes, int(M0s.shape[1]))

    for num_epochs, idxs in by_epochs.items():
        fit_batched = setup.fit_batched(num_epochs, active)

        for start in range(0, len(idxs), population_batch_size):
            chunk = idxs[start : start + population_batch_size]
            lam_mat = setup.lam_matrix(configs, chunk)
            lr_peaks, lr_ends = setup.lr_vectors(configs, chunk)
            if mesh is not None and len(chunk) % trial_axis_size == 0:
                # trial data parallelism: each device trains its own configs
                # (the TPU-native replacement for Ray's process-per-trial)
                lam_mat = jax.device_put(lam_mat, config_sharding)
                lr_peaks = jax.device_put(lr_peaks, config_sharding)
                lr_ends = jax.device_put(lr_ends, config_sharding)
            mets = fit_batched(lam_mat, lr_peaks, lr_ends, M0s)
            mets = {k: np.asarray(v) for k, v in mets.items()}  # (chunk,) each

            for row, i in enumerate(chunk):
                results.append(
                    {"_index": i, **{k: float(v[row]) for k, v in mets.items()}}
                )
            if verbose:
                logging.info("tuner: %d/%d trials done", len(results), len(configs))

    results.sort(key=lambda r: r["_index"])
    df = pd.DataFrame(results).drop(columns="_index")
    return df


def _halving_rungs(n_trials: int, total_epochs: int, eta: int):
    """Cumulative (epoch_target, n_survivors_into_rung) pairs for batched
    successive halving: rung k trains the surviving n/eta^k configs up to
    total/eta^(K-k) epochs, the final rung to the full budget. Total epochs
    spent ≈ (K/eta + 1)·total — a fraction of the n·total a full sweep
    costs."""
    K = 0
    while eta ** (K + 1) <= n_trials:
        K += 1
    rungs = []
    for k in range(K + 1):
        target = max(1, int(round(total_epochs / eta ** (K - k))))
        survivors = max(1, int(np.ceil(n_trials / eta ** k)))
        rungs.append((target, survivors))
    # strictly increasing targets; the last always reaches the full budget
    out = []
    for target, survivors in rungs:
        if out and target <= out[-1][0]:
            continue
        out.append((target, survivors))
    out[-1] = (total_epochs, out[-1][1])
    return out


def _run_halving(
    configs,
    metric,
    setup: _PopulationSetup,
    num_epochs: int,
    eta: int = 3,
    population_batch_size: int = 4,
    verbose: bool = False,
    active: Optional[frozenset] = None,
    mesh=None,
):
    """Batched successive halving with epoch reallocation (the scheduler
    side of the reference's Ray stack — `tune.Tuner` + a pruning scheduler):
    trials train as vmapped programs in rung-sized epoch chunks; after each
    rung only the top 1/eta by the selected metrics keep training.
    Multi-metric selection uses nondomination rank + crowding (the same
    ``pareto_order`` the adaptive TPE split uses, so diverged NaN trials
    are eliminated first).

    ``mesh`` lays each rung out like :func:`_run_population`: trials ride
    the axis named ``"trial"`` (or the first axis) whenever the rung's
    alive count divides it, and any remaining axes tensor-shard the cell
    dimension. Rungs whose survivor count doesn't divide the trial axis
    run replicated — sharding is a placement hint per rung, never a
    correctness condition.

    Memory policy: carrying Adam state across rungs requires the whole
    alive population's (M, mu, nu) resident on device at once — feasible
    only for modest populations. When that footprint exceeds the device
    budget (``utils.device_memory_budget``), rungs instead retrain their
    survivors from scratch in ``population_batch_size``-sized vmapped
    chunks (classic SHA: bounded memory at ≤ eta/(eta−1)× extra compute);
    both paths follow the same cosine-schedule trajectory because partial
    training always spans absolute epochs [0, target).

    Returns a row per trial with the 5 metrics at its last rung plus a
    ``trained_epochs`` column.
    """
    import jax.numpy as jnp

    M0s, lam_keys = setup.M0s, setup.lam_keys
    n = len(configs)
    if active is None:
        active = _active_lambdas(configs, lam_keys)

    fit_batched = setup.fit_halving(num_epochs, active)

    # mesh layout (same rule as _run_population): trials on the "trial"/
    # first axis, cells over the rest. put() shards a leading-trial-axis
    # array when the current extent divides the trial axis, else leaves it
    # replicated — correct either way, parallel when possible.
    cell_spec = None
    if mesh is not None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        trial_axis = "trial" if "trial" in mesh.axis_names else mesh.axis_names[0]
        trial_axis_size = int(mesh.shape[trial_axis])
        cell_axes = tuple(a for a in mesh.axis_names if a != trial_axis)
        shards = int(np.prod([mesh.shape[a] for a in cell_axes])) if cell_axes else 1
        if cell_axes and M0s.shape[1] % shards == 0:
            cell_spec = cell_axes if len(cell_axes) > 1 else cell_axes[0]
            M0s = jax.device_put(
                M0s, NamedSharding(mesh, PartitionSpec(None, cell_spec, None))
            )
        elif cell_axes:
            _warn_tp_replication(shards, cell_axes, int(M0s.shape[1]))

    def put(a, *tail):
        if mesh is None or a.shape[0] % trial_axis_size:
            return a
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.device_put(
            a, NamedSharding(mesh, PartitionSpec(trial_axis, *tail))
        )

    lam_mat = put(setup.lam_matrix(configs, range(n)), None)
    lr_peaks, lr_ends = (
        put(v) for v in setup.lr_vectors(configs, range(n))
    )

    # Carried-state mode needs the whole population's (M, mu, nu) — plus
    # the same again for the jitted call's outputs — live on device at
    # once. Fall back to restart-based rungs when it doesn't fit.
    from .utils import device_memory_budget

    state_bytes = 2 * 3 * 4 * n * int(np.prod(M0s.shape))  # in+out × (M,mu,nu)
    carry = state_bytes <= device_memory_budget()
    chunk_size = max(1, int(population_batch_size))
    if carry:
        M = put(jnp.broadcast_to(M0s[None], (n,) + M0s.shape),
                None, cell_spec, None)
        count = put(jnp.zeros((n, N_REPEATS), jnp.int32), None)
        mu = put(jnp.zeros_like(M), None, cell_spec, None)
        nu = put(jnp.zeros_like(M), None, cell_spec, None)
    elif verbose:
        logging.info(
            "halving: carried state (%.1f GB) exceeds the device budget; "
            "restart-based rungs in chunks of %d", state_bytes / 1e9,
            chunk_size,
        )

    # `alive` holds global trial indices in the same order as the batch
    # arrays' leading axis; eliminations gather the survivor rows in place
    alive = np.arange(n)
    rows = [None] * n
    trained = np.zeros(n, dtype=int)
    done = 0
    for target, survivors in _halving_rungs(n, int(num_epochs), int(eta)):
        keep = min(survivors, len(alive))
        if keep < len(alive):
            order = _select_order(
                np.asarray([[rows[i][m] for m in metric] for i in alive])
            )
            sel = np.sort(order[:keep])  # batch positions of the survivors
            alive = alive[sel]
            sel_dev = jnp.asarray(sel)
            lam_mat, lr_peaks, lr_ends = (
                put(lam_mat[sel_dev], None), put(lr_peaks[sel_dev]),
                put(lr_ends[sel_dev]),
            )
            if carry:
                M = put(M[sel_dev], None, cell_spec, None)
                count = put(count[sel_dev], None)
                mu = put(mu[sel_dev], None, cell_spec, None)
                nu = put(nu[sel_dev], None, cell_spec, None)
        if carry:
            steps = target - done
            M, count, mu, nu, mets = fit_batched(
                lam_mat, lr_peaks, lr_ends, M, count, mu, nu,
                jnp.float32(done), int(steps),
            )
            mets = {k: np.asarray(v) for k, v in mets.items()}
            for row, i in enumerate(alive):
                rows[i] = {k: float(v[row]) for k, v in mets.items()}
        else:
            for start in range(0, len(alive), chunk_size):
                stop = min(start + chunk_size, len(alive))
                M_c = put(
                    jnp.broadcast_to(M0s[None], (stop - start,) + M0s.shape),
                    None, cell_spec, None,
                )
                count_c = put(
                    jnp.zeros((stop - start, N_REPEATS), jnp.int32), None
                )
                zeros_c = put(jnp.zeros_like(M_c), None, cell_spec, None)
                _, _, _, _, mets = fit_batched(
                    put(lam_mat[start:stop], None),
                    put(lr_peaks[start:stop]), put(lr_ends[start:stop]),
                    M_c, count_c, zeros_c, zeros_c,
                    jnp.float32(0), int(target),
                )
                mets = {k: np.asarray(v) for k, v in mets.items()}
                for row in range(stop - start):
                    i = alive[start + row]
                    rows[i] = {k: float(v[row]) for k, v in mets.items()}
        done = target
        trained[alive] = done
        if verbose:
            logging.info(
                "halving: %d configs at %d/%d epochs", len(alive), done,
                num_epochs,
            )

    df = pd.DataFrame(rows)
    df["trained_epochs"] = trained
    return df


def _select_order(Y: np.ndarray) -> np.ndarray:
    """Trial ordering, best first, by the selected (maximized) metrics —
    :func:`tangram_tpu.search.pareto_order` (the same rule the TPE
    sampler's good/bad split uses; diverged trials with NaN metrics sort
    last, so halving eliminates them first)."""
    from .search import pareto_order

    return pareto_order(Y)


# ---------------------------------------------------------------------------
# public tuner
# ---------------------------------------------------------------------------


class _BestResult:
    """Duck-types ``ray.train.Result``: ``.config`` and ``.metrics``
    (values as native Python scalars, like ray reports them)."""

    def __init__(self, row):
        from .utils import _jsonable

        self.config = {
            k.split("/", 1)[1]: _jsonable(row[k])
            for k in row.index if k.startswith("config/")
        }
        self.metrics = {
            k: _jsonable(row[k]) for k in row.index
            if not k.startswith("config/")
        }


class _ResultGrid:
    def __init__(self, df):
        self._df = df

    def get_dataframe(self):
        return self._df

    def get_best_result(self, metric=None, mode="max"):
        """Best trial as a ``ray.train.Result``-shaped object (ray's
        ``ResultGrid.get_best_result``). ``metric`` may be one name or a
        list (multi-objective — the Pareto-best by the same
        :func:`tangram_tpu.search.pareto_order` rule the samplers use);
        ``mode`` is ``"max"`` or ``"min"`` (the 5 tuner metrics are all
        maximized, ray's API still takes a mode)."""
        if metric is None:
            raise ValueError("get_best_result requires `metric`")
        names = [metric] if isinstance(metric, str) else list(metric)
        sign = {"max": 1.0, "min": -1.0}.get(mode)
        if sign is None:
            raise ValueError('mode must be "max" or "min"')
        from .search import pareto_order

        Y = sign * self._df[names].to_numpy(dtype=float)
        best = int(pareto_order(Y)[0])
        if not np.all(np.isfinite(Y[best])):
            # pareto_order sorts NaN (diverged) trials last, so reaching
            # one here means EVERY trial diverged — don't hand back an
            # arbitrary config as "best" silently
            logging.warning(
                "get_best_result: no trial has finite %s metrics (all "
                "trials diverged?); returning an arbitrary trial", names,
            )
        return _BestResult(self._df.iloc[best])


class TunerResult:
    """Duck-types the ray ``Tuner`` the reference returns: call
    ``.get_results().get_dataframe()`` for a row per trial with the 5 metrics
    and ``config/...`` columns."""

    def __init__(self, df):
        self._df = df

    def get_results(self):
        return _ResultGrid(self._df)

    def fit(self):  # already fitted; parity no-op
        return self.get_results()


def mapping_hyperparameter_tuning(
    adata_sc,
    adata_sp,
    metric,
    config,
    tuner_num_samples: int = 2000,
    cv_train_genes=None,
    cv_val_genes=None,
    cluster_label=None,
    device=None,
    density_prior="rna_count_based",
    random_state: Optional[int] = 0,
    population_batch_size: int = 4,
    verbose: bool = False,
    mesh=None,
    search: str = "sobol",
    halving_eta: int = 3,
    resume_path: Optional[str] = None,
) -> TunerResult:
    """Tune mapping hyperparameters (reference ``:141-272``).

    Differences from the reference: trials run as on-device vmapped batches
    instead of Ray worker processes. ``search`` selects the sampler:

    * ``"sobol"`` (default) — scrambled Sobol quasi-random: non-adaptive,
      best-possible space coverage at a fixed trial budget, one compile for
      the whole population.
    * ``"adaptive"`` — multi-objective TPE (the capability the reference
      gets from Ray + ``OptunaSearch``, ``mapping_parameter_tuning.py:
      259-271``): trials run in ``population_batch_size``-sized ask/tell
      rounds, each round's configurations sampled near the Pareto-best
      observed ones (:mod:`tangram_tpu.search`). On narrow optima it
      reaches the best region in a fraction of the Sobol budget
      (tests/test_adaptive_search.py pins ≤ 1/4 on a seeded objective);
      each round is still one vmapped on-device batch.
    * ``"halving"`` — batched successive halving (the scheduler/pruning
      side of the Ray stack): trials train as vmapped programs in
      rung-sized epoch chunks; after each rung only the top
      ``1/halving_eta`` by the selected metrics keep training, so the full
      epoch budget concentrates on promising configurations (total cost
      ≈ (1 + K/eta)·num_epochs instead of n·num_epochs). When the whole
      population's Adam state fits the device budget, rungs continue from
      carried state; otherwise rungs retrain their survivors from scratch
      in ``population_batch_size``-sized chunks (classic SHA — bounded
      memory, ≤ eta/(eta−1)× extra compute). Requires a fixed
      ``num_epochs`` in ``config``; the result gains a ``trained_epochs``
      column. ``mesh`` applies per rung: rungs whose alive count divides
      the trial axis run trial-sharded (cells over any remaining axes),
      the others replicated.
    * ``"adaptive+halving"`` — the two composed, as Ray composes
      ``OptunaSearch`` with a pruning scheduler: TPE asks a bracket of
      configurations, successive halving prunes the bracket, and every
      trial's metrics (full-budget survivors and partial-budget
      eliminations) feed the TPE model for the next bracket. Same fixed
      ``num_epochs`` requirement and ``trained_epochs`` column as
      ``"halving"``.

    ``resume_path`` makes the sweep crash-tolerant (the elastic-recovery
    role Ray's trial fault tolerance / ``Tuner.restore`` plays for the
    reference): every completed population batch / ask-tell round is
    journaled to the file, and re-running with the same arguments skips the
    recorded trials (Sobol) or re-feeds them to the TPE model (adaptive
    modes) and completes only the remainder — a killed sweep loses at most
    one in-flight batch. Plain ``"halving"`` journals only a completed
    sweep (its rung state is global, so a partial sweep restarts). The file
    must belong to the same sweep (search/space/metric/budget/seed —
    validated); note run 0's mapper init continues the ambient numpy stream
    (reference parity), so bit-identical resumed metrics additionally need
    the same ambient seeding the original call had.

    Ray is not required for any mode.
    """
    del device
    if search not in ("sobol", "adaptive", "halving", "adaptive+halving"):
        raise ValueError(
            'search must be "sobol", "adaptive", "halving" or '
            '"adaptive+halving"'
        )
    if "halving" in search and int(halving_eta) < 2:
        raise ValueError("halving_eta must be >= 2")

    if (type(density_prior) is str) and (
        density_prior not in ["rna_count_based", "uniform", None]
    ):
        raise ValueError("Invalid input for density_prior.")

    if not set(["training_genes", "overlap_genes"]).issubset(set(adata_sc.uns.keys())):
        raise ValueError("Missing tangram parameters. Run `pp_adatas()`.")
    if not set(["training_genes", "overlap_genes"]).issubset(set(adata_sp.uns.keys())):
        raise ValueError("Missing tangram parameters. Run `pp_adatas()`.")
    assert list(adata_sp.uns["training_genes"]) == list(adata_sc.uns["training_genes"])

    overlap_genes = adata_sc.uns["overlap_genes"]

    if cv_train_genes is None:
        train_genes_idx = list(range(len(overlap_genes)))
    else:
        if set(cv_train_genes).issubset(set(adata_sc.uns["training_genes"])):
            train_genes_idx = (
                adata_sc[:, overlap_genes].var.index.get_indexer(cv_train_genes)
            )
        else:
            raise ValueError("Given training genes should be subset of two AnnDatas.")

    if cv_val_genes is None:
        val_genes_idx = list(range(len(overlap_genes)))
    else:
        if set(cv_val_genes).issubset(set(adata_sc.uns["training_genes"])):
            val_genes_idx = (
                adata_sc[:, overlap_genes].var.index.get_indexer(cv_val_genes)
            )
        else:
            raise ValueError("Given validation genes should be subset of two AnnDatas.")

    if not set(metric).issubset(set(METRIC_KEYS)):
        raise ValueError(
            'Argument "metric" must be a subset of {}'.format(METRIC_KEYS)
        )
    if not set(config.keys()).issubset(set(TUNABLE_KEYS)):
        raise ValueError(
            'Keys of the argument "config" must be a subset of {}'.format(TUNABLE_KEYS)
        )

    logging.info("Allocate tensors for mapping.")
    from .mapping import _densify

    S = _densify(adata_sc[:, overlap_genes].X)
    G = _densify(adata_sp[:, overlap_genes].X)
    if not S.any(axis=0).all() or not G.any(axis=0).all():
        raise ValueError("Genes with all zero values detected. Run `pp_adatas()`.")

    if isinstance(density_prior, str) and density_prior == "rna_count_based":
        density_prior = adata_sp.obs["rna_count_based_density"]
    elif isinstance(density_prior, str) and density_prior == "uniform":
        density_prior = adata_sp.obs["uniform_density"]
    d = np.asarray(
        density_prior
        if density_prior is not None
        else adata_sp.obs["uniform_density"],
        dtype=np.float32,
    )

    # all weight-matrix variants, unconditionally (reference :250-255)
    voxel_weights = sw.spatial_weights(adata_sp, standardized=True, self_inclusion=True)
    if cluster_label not in adata_sc.obs.keys():
        raise ValueError(
            "cluster_label must be specified for the cell type island extension."
        )
    neighborhood_filter = sw.spatial_weights(
        adata_sp, standardized=False, self_inclusion=False
    )
    ct_encode = one_hot_encoding(adata_sc.obs[cluster_label]).values
    spatial_weights = sw.spatial_weights(adata_sp, standardized=False, self_inclusion=True)

    domains = {k: _coerce_domain(v) for k, v in config.items()}

    setup = _PopulationSetup(
        S, G, d, voxel_weights, neighborhood_filter, ct_encode,
        spatial_weights, train_genes_idx, val_genes_idx,
    )
    population_kwargs = dict(
        S=S,
        G=G,
        d=d,
        voxel_weights=voxel_weights,
        neighborhood_filter=neighborhood_filter,
        ct_encode=ct_encode,
        spatial_weights=spatial_weights,
        train_genes_idx=train_genes_idx,
        val_genes_idx=val_genes_idx,
        population_batch_size=population_batch_size,
        verbose=verbose,
        mesh=mesh,
        setup=setup,
        # derived from the SEARCH SPACE (not the sampled values) so every
        # adaptive round / halving rung reuses one compiled program
        active=_space_active_lambdas(domains, setup.lam_keys),
    )

    journal = stored_trials = None
    if resume_path is not None:
        journal = _SweepJournal(
            resume_path,
            meta=dict(
                search=search, metric=list(metric), keys=sorted(domains),
                tuner_num_samples=int(tuner_num_samples),
                random_state=random_state, halving_eta=int(halving_eta),
            ),
        )
        stored_trials = journal.load()
        if verbose and stored_trials:
            logging.info(
                "tuner: resuming %d recorded trials from %s",
                len(stored_trials), resume_path,
            )

    def from_unit_rows(unit_rows):
        return [
            {k: dom.from_unit(u) for (k, dom), u in zip(domains.items(), row)}
            for row in unit_rows
        ]

    def sobol_unit_rows(n):
        import warnings

        from scipy.stats import qmc

        sampler = qmc.Sobol(
            d=max(len(domains), 1), scramble=True, seed=random_state
        )
        with warnings.catch_warnings():
            # arbitrary trial counts are this API's contract (the reference
            # accepts any tuner_num_samples); scipy's power-of-2 balance
            # advice is noise here
            warnings.filterwarnings(
                "ignore", message=".*balance properties of Sobol.*"
            )
            return sampler.random(n)

    def tpe_ask_tell_rounds(batch, runner, label):
        """The shared TPE ask/tell loop: ask a batch, run it as one vmapped
        on-device program, tell the sampler the selected (maximized)
        ``metric`` columns back. Both adaptive modes differ only in the
        per-round runner (full-budget population vs halving bracket)."""
        from .search import TPESampler

        sampler = TPESampler(
            n_dims=len(domains),
            seed=random_state,
            n_startup=min(16, max(4, tuner_num_samples // 4)),
        )
        configs, frames = [], []
        if stored_trials:
            # resume: re-feed the journaled observations to the TPE model
            # (their metrics are already computed — only the remainder runs)
            units = np.asarray(
                [t["unit"] for t in stored_trials], dtype=np.float64
            )
            frame0 = pd.DataFrame([t["metrics"] for t in stored_trials])
            sampler.tell(units, frame0[list(metric)].to_numpy())
            configs.extend(t["config"] for t in stored_trials)
            frames.append(frame0)
        while len(configs) < tuner_num_samples:
            ask_n = min(batch, tuner_num_samples - len(configs))
            unit_rows = sampler.ask(ask_n)
            round_configs = from_unit_rows(unit_rows)
            frame = runner(round_configs)
            sampler.tell(unit_rows, frame[list(metric)].to_numpy())
            if journal is not None:
                recs = frame.to_dict("records")
                journal.append([
                    {"i": len(configs) + k,
                     "unit": [float(u) for u in unit_rows[k]],
                     "config": round_configs[k], "metrics": recs[k]}
                    for k in range(len(round_configs))
                ])
            configs.extend(round_configs)
            frames.append(frame)
            if verbose:
                logging.info(
                    "%s tuner: %d/%d trials", label, len(configs),
                    tuner_num_samples,
                )
        df = pd.concat(frames, ignore_index=True)
        # an over-full journal (budget lowered between runs is rejected by
        # the meta check; this guards same-meta files with extra lines)
        return (configs[:tuner_num_samples],
                df.iloc[:tuner_num_samples].reset_index(drop=True))

    if search == "adaptive" and domains:
        configs, df = tpe_ask_tell_rounds(
            population_batch_size,
            lambda cfgs: _run_population(configs=cfgs, **population_kwargs),
            "adaptive",
        )
    elif search in ("halving", "adaptive+halving") and domains:
        num_epochs = config.get("num_epochs", 1000)
        if not isinstance(num_epochs, (int, float)) or isinstance(
            num_epochs, bool
        ):
            raise ValueError(
                f'search="{search}" requires a FIXED num_epochs in config — '
                "the halving schedule reallocates epochs itself"
            )
        halving_kw = dict(
            eta=int(halving_eta),
            population_batch_size=population_batch_size,
            verbose=verbose,
            active=population_kwargs["active"],
            mesh=mesh,
        )
        if search == "halving":
            # batched successive halving: Sobol-sample the population, then
            # reallocate the epoch budget to the metric-best survivors
            unit_all = sobol_unit_rows(tuner_num_samples)
            configs = from_unit_rows(unit_all)
            if stored_trials and len(stored_trials) >= tuner_num_samples:
                # rung state is global, so only a COMPLETED sweep is
                # journaled/resumable — return it verbatim
                stored = stored_trials[:tuner_num_samples]
                configs = [t["config"] for t in stored]
                df = pd.DataFrame([t["metrics"] for t in stored])
            else:
                df = _run_halving(
                    configs, list(metric), setup, int(num_epochs),
                    **halving_kw,
                )
                if journal is not None:
                    recs = df.to_dict("records")
                    journal.append([
                        {"i": i, "unit": [float(u) for u in unit_all[i]],
                         "config": configs[i], "metrics": recs[i]}
                        for i in range(len(configs))
                    ])
        else:
            # BOHB-style composition (the reference's Ray stack composes
            # OptunaSearch with a pruning scheduler the same way): TPE asks
            # a bracket of configs, successive halving prunes it, and every
            # trial's metrics — full-budget survivors and partial-budget
            # eliminations alike — feed back into the TPE model. Partial
            # results are the basis halving eliminates on, so they carry
            # the same relative-quality signal (single-model simplification
            # of BOHB's per-budget Parzen models).
            configs, df = tpe_ask_tell_rounds(
                max(int(halving_eta), int(population_batch_size)),
                lambda cfgs: _run_halving(
                    cfgs, list(metric), setup, int(num_epochs), **halving_kw,
                ),
                "adaptive+halving",
            )
    else:
        # scrambled Sobol over the search space, one population
        unit_all = sobol_unit_rows(tuner_num_samples)
        configs = from_unit_rows(unit_all)
        if journal is None:
            df = _run_population(configs=configs, **population_kwargs)
        else:
            # resume: trials are independent under Sobol, so journaled
            # indices are skipped and only the remainder runs (in
            # population_batch_size chunks, each flushed on completion)
            done = {
                int(t["i"]): t["metrics"]
                for t in stored_trials if int(t["i"]) < tuner_num_samples
            }
            pending = [i for i in range(tuner_num_samples) if i not in done]
            for start in range(0, len(pending), int(population_batch_size)):
                chunk = pending[start:start + int(population_batch_size)]
                frame = _run_population(
                    configs=[configs[i] for i in chunk], **population_kwargs
                )
                recs = frame.to_dict("records")
                journal.append([
                    {"i": i, "unit": [float(u) for u in unit_all[i]],
                     "config": configs[i], "metrics": rec}
                    for i, rec in zip(chunk, recs)
                ])
                done.update(zip(chunk, recs))
            df = pd.DataFrame([done[i] for i in range(tuner_num_samples)])

    for k in domains:
        df[f"config/{k}"] = [cfg[k] for cfg in configs]
    return TunerResult(df)
