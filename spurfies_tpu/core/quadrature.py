"""Volume-rendering quadrature (closed-form transmittance weights).

Behavioral spec from reference ``spurfies/model/pointneus_disent.py:894-908``:
``free_energy = deltas * density``; transmittance is the exp of the negative
cumsum of the one-step-shifted free energy; ``weights = alpha * T``.
"""

import jax.numpy as jnp


def render_weights(deltas: jnp.ndarray, density: jnp.ndarray) -> jnp.ndarray:
    """Compute per-sample rendering weights.

    Args:
      deltas:  ``[R, S]`` distances between consecutive samples (last one may
               be 0; invalid samples must have delta 0 so they are no-ops).
      density: ``[R, S]`` volume density at each sample.

    Returns:
      weights ``[R, S]`` = alpha * transmittance.
    """
    free_energy = deltas * density
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[..., :1]), free_energy[..., :-1]], axis=-1
    )
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    return alpha * transmittance


def composite(weights: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """``sum_s w[r,s] * v[r,s,...]`` along the sample axis."""
    return jnp.sum(weights[..., None] * values, axis=-2)


def expected_depth(weights: jnp.ndarray, z_vals: jnp.ndarray,
                   eps: float = 1e-8) -> jnp.ndarray:
    """Weight-normalized expected depth (reference pointneus_disent.py:791-793)."""
    return jnp.sum(weights * z_vals, axis=-1, keepdims=True) / (
        jnp.sum(weights, axis=-1, keepdims=True) + eps
    )
