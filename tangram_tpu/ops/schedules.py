"""Learning-rate schedules for the mapping optimizers.

The reference trains Adam at a constant learning rate (default 0.1,
``mapping_utils.py:148-149,178-180``) and needs ~940 of its 1000 default
epochs to converge on the tutorial workload. That stays the default here —
trajectory parity with the reference is epoch-for-epoch — but every training
entry point (``fit_mapping``, ``Mapper.train``, ``MapperConstrained.train``,
``map_cells_to_space``, the sharded mesh paths) also accepts a *per-epoch
learning-rate vector* or a callable ``epoch -> lr`` through the same
``learning_rate`` argument. A tuned schedule reaches the reference's final
training score an order of magnitude sooner (see ``bench.py``'s
``tuned_lr`` block) while converging at least as high.
"""

import numpy as np

__all__ = ["cosine_lr", "cosine_value", "resolve_lr"]


def cosine_value(t, peak, end, decay_len, xp=np):
    """Cosine-decay value at epoch ``t`` (no warmup): the single source of
    the decay formula shared by :func:`cosine_lr` (vectorized, numpy) and
    the tuner's traced per-step schedule (``xp=jax.numpy``)."""
    phase = xp.clip(t / decay_len, 0.0, 1.0)
    return end + (peak - end) * 0.5 * (1.0 + xp.cos(xp.pi * phase))


def cosine_lr(peak, num_epochs, end=0.0, warmup=0):
    """Per-epoch lr vector: linear warmup to ``peak`` over ``warmup`` epochs,
    then cosine decay to ``end`` over the remainder.

    Returns a float32 array of shape ``(num_epochs,)`` accepted by the
    ``learning_rate`` argument of every training entry point.
    """
    num_epochs = int(num_epochs)
    warmup = int(warmup)
    if not 0 <= warmup <= num_epochs:
        raise ValueError(
            f"warmup must be within [0, num_epochs], got {warmup} vs {num_epochs}"
        )
    t = np.arange(num_epochs, dtype=np.float64)
    if warmup > 0:
        ramp = peak * (t + 1) / warmup
    else:
        ramp = np.full_like(t, peak)
    decay_len = max(num_epochs - warmup, 1)
    decay = cosine_value(t - warmup, peak, end, decay_len)
    return np.where(t < warmup, ramp, decay).astype(np.float32)


def resolve_lr(learning_rate, num_epochs):
    """Normalize a ``learning_rate`` argument.

    * scalar → ``float`` (constant lr, the reference behavior),
    * callable → evaluated at ``0..num_epochs-1`` into a float32 vector,
    * array-like → validated ``(num_epochs,)`` float32 vector.
    """
    num_epochs = int(num_epochs)
    if callable(learning_rate):
        t = np.arange(num_epochs)
        try:
            vec = np.asarray(learning_rate(t), dtype=np.float32)
            if vec.shape != (num_epochs,):
                raise TypeError("not vectorized")
        except (TypeError, ValueError):
            vec = np.asarray(
                [float(learning_rate(int(i))) for i in range(num_epochs)],
                dtype=np.float32,
            )
        return vec
    if np.ndim(learning_rate) == 0:
        try:
            return float(learning_rate)
        except TypeError:
            # a traced scalar (resolve_lr reached from inside jit/vmap):
            # already constant-per-call, pass through untouched
            return learning_rate
    shape = np.shape(learning_rate)
    if shape != (num_epochs,):
        raise ValueError(
            f"learning_rate vector has shape {shape}; expected "
            f"({num_epochs},) — one value per epoch of this call"
        )
    if (type(learning_rate).__module__ or "").startswith("jax"):
        # concrete jax array or tracer of the right shape: avoid a
        # device->host round-trip / tracer leak
        return learning_rate
    return np.asarray(learning_rate, dtype=np.float32)
