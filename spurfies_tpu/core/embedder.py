"""NeRF-style sinusoidal positional encoding.

Behavioral spec from the reference ``spurfies/model/embedder.py:5-50``:
include_input, log-sampled frequency bands ``2**0 .. 2**(multires-1)``,
concatenation order ``[x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]``.
"""

import jax.numpy as jnp


def encoding_dim(multires: int, input_dims: int = 3) -> int:
    """Output dim: input + sin/cos per frequency band."""
    return input_dims + 2 * multires * input_dims


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """Encode ``x[..., D] -> [..., D + 2*multires*D]``.

    Matches reference embedder (multires=6 for positions -> 39 dims,
    multires=3 for view dirs -> 21 dims).
    """
    if multires <= 0:
        return x
    freqs = tuple(2.0 ** i for i in range(multires))
    parts = [x]
    for f in freqs:
        parts.append(jnp.sin(x * f))
        parts.append(jnp.cos(x * f))
    return jnp.concatenate(parts, axis=-1)
