"""Small shared utilities, plus the compatibility surface of the reference's
``tangram/utils.py``.

The reference keeps preprocessing helpers, annotation transfer, the
deconvolution chain, cross-validation and the AUC metric in one 841-line
module; here they live in focused modules (:mod:`tangram_tpu.deconv`,
:mod:`tangram_tpu.evaluation`) and this module re-exports them so that
``tangram_tpu.utils.<name>`` keeps working for every reference symbol.
"""

from __future__ import annotations

import gzip
import pickle

import numpy as np
import scipy.sparse as sp

from .deconv import (  # noqa: F401
    cell_type_mapping,
    count_cell_annotations,
    create_segment_cell_df,
    deconvolve_cell_annotations,
    df_to_cell_types,
    one_hot_encoding,
    project_cell_annotations,
)
from .evaluation import (  # noqa: F401
    compare_spatial_geneexp,
    cross_val,
    cv_data_gen,
    eval_metric,
    project_genes,
)

__all__ = [
    "device_memory_budget",
    "enable_compilation_cache",
    "read_pickle",
    "annotate_gene_sparsity",
    "get_matched_genes",
    "one_hot_encoding",
    "project_cell_annotations",
    "create_segment_cell_df",
    "count_cell_annotations",
    "deconvolve_cell_annotations",
    "project_genes",
    "compare_spatial_geneexp",
    "cv_data_gen",
    "cross_val",
    "eval_metric",
    "transfer_annotations_prob",
    "transfer_annotations_prob_filter",
    "df_to_cell_types",
    "cell_type_mapping",
]


def _jsonable(v):
    """numpy scalars → native Python for json round-trips."""
    if isinstance(v, np.generic):
        return v.item()
    return v


class _SweepJournal:
    """Crash-tolerant JSONL record of a multi-unit workload sweep — the
    elastic-recovery role Ray Tune's trial fault tolerance / ``Tuner.restore``
    plays in the reference's stack. One meta line, then one line per
    completed unit (a tuner trial or a CV fold), flushed batch-by-batch so a
    killed run loses at most one in-flight batch. Used by
    ``mapping_hyperparameter_tuning(resume_path=...)`` and
    ``cross_val(resume_path=...)``."""

    def __init__(self, path, meta: dict):
        self.path = path
        self.meta = {k: _jsonable(v) for k, v in meta.items()}

    def load(self) -> list:
        """Stored records, in completion order. Raises if the file belongs
        to a different sweep (meta mismatch) — resuming across sweeps would
        mix incomparable results."""
        import json
        import os

        if not os.path.exists(self.path):
            with open(self.path, "w") as f:
                f.write(json.dumps({"kind": "meta", **self.meta}) + "\n")
            return []
        records = []
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if rec.get("kind") == "meta":
                    stored = {k: rec.get(k) for k in self.meta}
                    if stored != self.meta:
                        raise ValueError(
                            f"resume_path {self.path!r} records a different "
                            f"sweep: {stored} != {self.meta}"
                        )
                else:
                    records.append(rec)
        return records

    def append(self, rows: list) -> None:
        import json

        with open(self.path, "a") as f:
            for row in rows:
                f.write(json.dumps(row, default=_jsonable) + "\n")
            f.flush()


def device_memory_budget(device=None, fraction=0.5):
    """Bytes of device memory a batched workload may claim.

    Queries the accelerator's reported capacity
    (``device.memory_stats()["bytes_limit"]``) and returns ``fraction`` of
    it, so auto batch sizing fills a 32 GB v5p chip as readily as a 16 GB
    v5e instead of assuming one fixed size. Backends that report no memory
    stats (CPU, some simulators) fall back to conservative constants:
    8 GB on TPU, 2 GB elsewhere.

    The query runs on a daemon thread with a short timeout: on remote /
    tunneled backends ``memory_stats()`` is an RPC and must never be able
    to hang auto batch sizing — an unresponsive backend degrades to the
    constant fallback instead.
    """
    import jax

    if device is None:
        device = jax.local_devices()[0]
    if device not in _BYTES_LIMIT_CACHE:
        # bytes_limit is a static property of the chip: query it once per
        # device, so a hung backend costs one bounded stall (and one leaked
        # prober thread) total rather than one per call — halving calls
        # this once per rung/bracket
        stats = _memory_stats_with_timeout(device) or {}
        _BYTES_LIMIT_CACHE[device] = stats.get("bytes_limit")
    limit = _BYTES_LIMIT_CACHE[device]
    if limit:
        return fraction * float(limit)
    return 8e9 if device.platform == "tpu" else 2e9


_BYTES_LIMIT_CACHE = {}


def _memory_stats_with_timeout(device, timeout_s=5.0):
    """``device.memory_stats()`` bounded by ``timeout_s``; ``None`` if the
    call raises, returns nothing, or does not come back in time."""
    import threading

    box = {}

    def query():
        try:
            box["stats"] = device.memory_stats()
        except Exception:
            box["stats"] = None

    t = threading.Thread(target=query, daemon=True)
    t.start()
    t.join(timeout_s)
    return box.get("stats")


def enable_compilation_cache(cache_dir=None, min_compile_time_secs=1.0):
    """Turn on JAX's persistent XLA compilation cache.

    The atlas-scale fused training step compiles in tens of seconds; with
    the cache enabled, any repeat run at the same shapes/dtypes (re-running
    a notebook, a CV sweep restarted after a crash, the bench harness) loads
    the compiled executable from disk instead. Safe to call more than once.

    ``cache_dir`` defaults to ``$TANGRAM_COMPILE_CACHE`` or
    ``~/.cache/tangram_tpu/xla``. Programs faster than
    ``min_compile_time_secs`` to compile are not persisted (they are cheaper
    to recompile than to hash and load).
    """
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("TANGRAM_COMPILE_CACHE") or os.path.join(
            os.path.expanduser("~"), ".cache", "tangram_tpu", "xla"
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(min_compile_time_secs),
    )
    return cache_dir


def read_pickle(filename):
    """Unpickle a file, transparently handling gzip compression
    (ref utils.py:26-43)."""
    try:
        with gzip.open(filename, "rb") as f:
            return pickle.load(f)
    except OSError:
        with open(filename, "rb") as f:
            return pickle.load(f)


def annotate_gene_sparsity(adata):
    """Write ``var['sparsity']`` = fraction of observations where each gene
    is zero (ref utils.py:46-61)."""
    X = adata.X
    nonzero_per_gene = (
        np.asarray((X != 0).sum(axis=0)).ravel()
        if sp.issparse(X)
        else np.count_nonzero(np.asarray(X), axis=0)
    )
    adata.var["sparsity"] = 1.0 - nonzero_per_gene / float(adata.n_obs)


def get_matched_genes(prior_genes_names, sn_genes_names, excluded_genes=None):
    """Match two gene-name lists (ref utils.py:64-102).

    Returns (indices into ``prior_genes_names``, indices into
    ``sn_genes_names``, matched names), walking ``sn_genes_names`` in order
    and resolving duplicates in the prior list to their first occurrence.
    """
    excluded = set() if excluded_genes is None else set(excluded_genes)

    first_prior_pos = {}
    for pos, name in enumerate(np.asarray(prior_genes_names)):
        first_prior_pos.setdefault(name, pos)

    prior_idx, sn_idx, names = [], [], []
    for pos, name in enumerate(np.asarray(sn_genes_names)):
        if name in excluded or name not in first_prior_pos:
            continue
        prior_idx.append(first_prior_pos[name])
        sn_idx.append(pos)
        names.append(name)
    return prior_idx, sn_idx, names


# Deprecated in the reference (utils.py:762-787); kept for API parity.
def transfer_annotations_prob(mapping_matrix, to_transfer):
    return mapping_matrix.transpose() @ to_transfer


def transfer_annotations_prob_filter(mapping_matrix, filter, to_transfer):
    return mapping_matrix.transpose() @ (to_transfer * filter[:, np.newaxis])


def warn_tp_replication(shards, cell_axes, n_cells, what="per-trial"):
    """Loud fallback when requested cell sharding can't apply (VERDICT r4
    #8): a user who budgeted per-chip HBM for 1/shards of the logits would
    otherwise learn about the replication only via OOM. Shared by the
    tuner and batched cross-validation."""
    import logging

    pad = -n_cells % shards
    logging.warning(
        "mesh requests %d-way cell sharding over axes %s but n_cells=%d "
        "does not divide evenly; tensor parallelism degrades to "
        "REPLICATION (each chip holds full %s logits + optimizer moments, "
        "%dx the sharded budget). Pad to %d cells to restore sharding.",
        shards, cell_axes, n_cells, what, shards, n_cells + pad,
    )
