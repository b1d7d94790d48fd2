"""Positional encodings for 4D (x, y, z, t) query points.

Matches the reference encoder (sunerf/model/model.py:92-132):
gamma(x) = [x, sin(x * 2^k / s), cos(x * 2^k / s)] for k = 0..n_freqs-1 with
scale factor s (default 2, i.e. a 4*pi box), frequency-major layout so weights
are interchangeable with the reference ordering.
"""
from __future__ import annotations

import jax.numpy as jnp


def _column_mask(d_input: int, n_freqs: int, n_freqs_time) -> 'list[bool]':
    """Frequency-major (k, d) column inclusion. With n_freqs_time set (and a
    4-D x,y,z,t input), the t dimension only gets the lowest n_freqs_time
    bands — high-frequency time features leave the field unconstrained
    between sparsely-sampled observation times (see RESULTS.md)."""
    mask = []
    for k in range(n_freqs):
        for d in range(d_input):
            is_time = (d == d_input - 1) and n_freqs_time is not None
            mask.append(k < n_freqs_time if is_time else True)
    return mask


def encoded_dim(d_input: int, n_freqs: int, n_freqs_time=None) -> int:
    return d_input + 2 * sum(_column_mask(d_input, n_freqs, n_freqs_time))


def positional_encoding(x: jnp.ndarray, n_freqs: int = 10,
                        scale_factor: float = 2.0,
                        log_space: bool = True,
                        n_freqs_time=None) -> jnp.ndarray:
    """Apply sine-cosine positional encoding.

    Args:
        x: [..., D] input points.
        n_freqs: number of frequency bands.
        scale_factor: divides the frequency (2 -> box limit 4*pi).
        log_space: frequencies 2^0..2^(n-1); else linear between the same endpoints.
        n_freqs_time: optional lower band count for the last (time) dimension.

    Returns:
        [..., encoded_dim] with layout [x, sin(f0*x_all_dims),
        sin(f1*x_all_dims), ..., cos(f0*x_all_dims), ...] (frequency-major,
        matching reference model.py:127-131; time columns beyond
        n_freqs_time omitted when set).
    """
    if log_space:
        freq_bands = 2.0 ** jnp.linspace(0.0, n_freqs - 1, n_freqs, dtype=x.dtype)
    else:
        freq_bands = jnp.linspace(2.0 ** 0, 2.0 ** (n_freqs - 1), n_freqs, dtype=x.dtype)
    # [..., F, D]
    scaled = x[..., None, :] * (freq_bands[:, None] / scale_factor)
    batch_shape = x.shape[:-1]
    flat = scaled.reshape(*batch_shape, -1)
    if n_freqs_time is not None:
        import numpy as _np
        cols = _np.where(_column_mask(x.shape[-1], n_freqs, n_freqs_time))[0]
        flat = flat[..., cols]
    return jnp.concatenate([x, jnp.sin(flat), jnp.cos(flat)], axis=-1)


def init_trainable_encoding(d_input: int, n_freqs: int = 20) -> dict:
    """Learnable frequency bands (reference TrainablePositionalEncoding,
    model.py:75-89): frequencies initialized linspace(-3, 9) per input dim."""
    freqs = jnp.stack([jnp.linspace(-3.0, 9.0, n_freqs)
                       for _ in range(d_input)], axis=-1)  # [F, D]
    return {'frequencies': freqs}


def trainable_encoding_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """[N, D] -> [N, 2*F*D]: sin/cos of pi * 2^f * x, normalized by the
    frequency (model.py:83-89)."""
    freqs = jnp.pi * 2.0 ** params['frequencies']       # [F, D]
    encoded = x[:, None, :] * freqs[None]               # [N, F, D]
    n = x.shape[0]
    return jnp.concatenate([
        (jnp.sin(encoded) / freqs[None]).reshape(n, -1),
        (jnp.cos(encoded) / freqs[None]).reshape(n, -1)], axis=-1)
