"""Image metrics (PSNR here; SSIM/LPIPS live in spurfies_tpu.eval)."""

import jax.numpy as jnp


def psnr(img1: jnp.ndarray, img2: jnp.ndarray,
         mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """PSNR over (optionally masked) pixels.

    Matches reference ``rend_util.get_psnr`` (rend_util.py:14-22) /
    the masked variant in ``train.py:445-451``.
    """
    se = (img1 - img2) ** 2
    if mask is not None:
        mask = jnp.broadcast_to(mask, se.shape)
        mse = jnp.sum(se * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    else:
        mse = jnp.mean(se)
    return -10.0 * jnp.log(mse) / jnp.log(10.0)
