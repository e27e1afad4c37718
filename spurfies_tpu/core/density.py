"""SDF -> density transforms (VolSDF Laplace CDF).

Behavioral spec from reference ``spurfies/model/density.py:16-30``:
``density(s) = alpha * (0.5 + 0.5 * sign(s) * expm1(-|s| / beta))`` with
``alpha = 1/beta`` and ``beta = |beta_param| + beta_min``.
"""

import jax.numpy as jnp


def get_beta(beta_param: jnp.ndarray, beta_min: float = 1e-4) -> jnp.ndarray:
    return jnp.abs(beta_param) + beta_min


def laplace_density(sdf: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Laplace CDF density: ``alpha * Laplace(0, beta).cdf(-sdf)``.

    ``beta`` broadcasts against ``sdf`` (the error-bounded sampler passes a
    per-ray beta).
    """
    alpha = 1.0 / beta
    return alpha * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta))


def abs_density(sdf: jnp.ndarray) -> jnp.ndarray:
    """NeRF++-style density (reference AbsDensity, density.py:33-35)."""
    return jnp.abs(sdf)


def simple_density(sdf: jnp.ndarray) -> jnp.ndarray:
    """NeRF-style relu density (reference SimpleDensity, density.py:38-47).

    Train-time noise injection is the caller's responsibility (pass
    ``sdf + noise``); keeping this pure keeps it jit-friendly.
    """
    return jnp.maximum(sdf, 0.0)


def single_variance(variance_param: jnp.ndarray) -> jnp.ndarray:
    """NeuS variance: ``exp(10 * v)`` clipped to [1e-6, 1e6] (reference
    SingleVarianceNetwork.get_variance, density.py:49-66; init the raw
    parameter to ``init_val``)."""
    return jnp.clip(jnp.exp(variance_param * 10.0), 1e-6, 1e6)


def single_variance_forward(x: jnp.ndarray,
                            variance_param: jnp.ndarray) -> jnp.ndarray:
    """Reference SingleVarianceNetwork.forward: a ``[len(x), 1]`` tensor of
    the (unclipped) variance, broadcast per query point (density.py:60-62)."""
    return jnp.ones((x.shape[0], 1), x.dtype) * jnp.exp(variance_param * 10.0)
