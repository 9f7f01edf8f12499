"""Checkpoint / resume for mapping runs.

The reference *declares* warm-start support but raises ``NotImplemented``
(``mapping_optimizer.py:147-153``, ``:472-478``) — an explicit capability gap
(SURVEY §5). Here it is closed twice over:

* warm start from a probability matrix: ``Mapper(adata_map=...)`` takes
  log-probabilities as the new logits (see ``models/mapper.py``);
* true mid-run checkpointing: :func:`train_checkpointed` chunks the compiled
  scan, carrying the Adam state across chunks, and persists
  ``(params, opt_state, epoch, history)`` with Orbax after each chunk.
  :func:`restore` resumes bit-exactly (same Adam moments) from the latest
  checkpoint.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from .models.mapper import fit_mapping

__all__ = ["save", "restore", "latest_epoch", "train_checkpointed"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(directory, epoch: int, params, opt_state, history=None) -> None:
    """Persist one checkpoint at ``directory/ckpt_<epoch>``."""
    directory = os.path.abspath(os.fspath(directory))
    os.makedirs(directory, exist_ok=True)
    payload = {
        "epoch": np.int64(epoch),
        "params": params,
        "opt_state": opt_state,
    }
    if history is not None:
        payload["history"] = {k: np.asarray(v) for k, v in history.items()}
    _checkpointer().save(
        os.path.join(directory, f"ckpt_{epoch}"), payload, force=True
    )


def latest_epoch(directory) -> Optional[int]:
    directory = os.fspath(directory)
    if not os.path.isdir(directory):
        return None
    epochs = [
        int(name.split("_", 1)[1])
        for name in os.listdir(directory)
        if name.startswith("ckpt_") and name.split("_", 1)[1].isdigit()
    ]
    return max(epochs) if epochs else None


def restore(directory, epoch: Optional[int] = None, opt_state_template=None):
    """Load ``(epoch, params, opt_state, history)`` from a checkpoint dir.

    Pass ``opt_state_template`` (e.g. ``make_adam(lr).init(params)``) to
    restore the optimizer state into its original pytree structure — Orbax
    round-trips NamedTuples as plain containers otherwise.
    """
    import jax

    if epoch is None:
        epoch = latest_epoch(directory)
        if epoch is None:
            raise FileNotFoundError(f"No checkpoints under {directory!r}")
    payload = _checkpointer().restore(
        os.path.join(os.path.abspath(os.fspath(directory)), f"ckpt_{epoch}")
    )
    opt_state = payload["opt_state"]
    if opt_state_template is not None:
        treedef = jax.tree.structure(opt_state_template)
        opt_state = jax.tree.unflatten(treedef, jax.tree.leaves(opt_state))
    return (
        int(payload["epoch"]),
        payload["params"],
        opt_state,
        payload.get("history"),
    )


def train_checkpointed(
    params,
    data,
    lw,
    num_epochs: int,
    learning_rate,
    checkpoint_dir,
    checkpoint_every: int = 100,
    constrained: bool = False,
    impl: str = "auto",
    resume: bool = True,
    mesh=None,
):
    """Train with periodic Orbax checkpoints; resume from the latest one.

    With ``mesh`` set, training runs through the fused multi-chip path
    (``parallel.fit_mapping_fused_sharded``) and the checkpoint payload is
    its plain opt-state dict, gathered to host — so an atlas-scale sharded
    run survives preemption with intact Adam moments.

    Returns ``(params, history)`` where history covers epochs actually run in
    this invocation plus any restored prefix. ``learning_rate`` is a constant
    float or a per-epoch schedule (vector/callable, ``ops/schedules.py``) —
    a resumed run continues the schedule from the restored epoch.
    """
    from .models.mapper import make_adam
    from .ops.schedules import resolve_lr

    learning_rate = resolve_lr(learning_rate, int(num_epochs))
    lr_is_vec = np.ndim(learning_rate) == 1

    start_epoch = 0
    opt_state = None
    prefix_history = None
    if resume and latest_epoch(checkpoint_dir) is not None:
        template = (
            None if mesh is not None
            else make_adam(1.0 if lr_is_vec else learning_rate).init(params)
        )
        start_epoch, params, opt_state, prefix_history = restore(
            checkpoint_dir, opt_state_template=template
        )
        if constrained and not isinstance(params, tuple):
            params = tuple(params.values()) if isinstance(params, dict) else tuple(params)
        if mesh is None:
            params = jax.tree.map(lambda x: jax.numpy.asarray(x), params)
            opt_state = jax.tree.map(lambda x: jax.numpy.asarray(x), opt_state)

    histories = [] if prefix_history is None else [prefix_history]

    def merged_history():
        out = {}
        if histories:
            for k in histories[-1]:
                parts = [np.atleast_1d(np.asarray(h[k])) for h in histories if k in h]
                out[k] = np.concatenate(parts) if parts else np.array([])
        return out

    epoch = start_epoch
    while epoch < num_epochs:
        chunk = min(checkpoint_every, num_epochs - epoch)
        lr_chunk = (
            learning_rate[epoch:epoch + chunk] if lr_is_vec else learning_rate
        )
        if mesh is not None:
            from .parallel import fit_mapping_fused_sharded

            # the previous chunk's params/opt buffers are dead after this
            # call — donate them so atlas-scale shards fit next to the carry
            params, opt_state, history = fit_mapping_fused_sharded(
                params, data, lw, chunk, lr_chunk, mesh=mesh,
                opt_state=opt_state, return_opt_state=True, donate=True,
            )
        else:
            params, opt_state, history = fit_mapping(
                params,
                data,
                lw,
                num_epochs=chunk,
                learning_rate=lr_chunk,
                constrained=constrained,
                impl=impl,
                opt_state=opt_state,
                return_opt_state=True,
            )
        history = jax.device_get(history)
        histories.append({k: np.asarray(v) for k, v in history.items()})
        epoch += chunk
        # persist the CUMULATIVE history so a resumed run returns the full
        # from-epoch-0 record, not just its own chunks
        save(
            checkpoint_dir, epoch, jax.device_get(params),
            jax.device_get(opt_state), merged_history(),
        )

    return params, merged_history()
