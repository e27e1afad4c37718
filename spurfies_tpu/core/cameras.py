"""Camera geometry: pixel lifting, ray generation, P-matrix decomposition.

Behavioral spec from reference ``spurfies/utils/rend_util.py``:
  * ``lift`` (rend_util.py:143-156): pinhole + skew unprojection.
  * ``get_camera_params`` (rend_util.py:60-95): uv -> normalized world rays.
  * ``load_K_Rt_from_P`` (rend_util.py:36-57): projection-matrix decomposition
    (implemented here with an RQ factorization instead of cv2).
  * ``get_sphere_intersections`` (rend_util.py:200-216).

Device functions are pure jnp and jit/vmap-safe; the P decomposition is
host-side numpy (dataset loading only).
"""

import jax.numpy as jnp
import numpy as np


def lift(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray,
         intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Unproject pixels to homogeneous camera coords.

    Args:
      x, y, z: ``[B, N]`` pixel coords and depth.
      intrinsics: ``[B, 4, 4]`` (or ``[B, 3, 3]``) K matrix with skew.

    Returns:
      ``[B, N, 4]`` homogeneous camera-space points.
    """
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack([x_lift, y_lift, z, jnp.ones_like(z)], axis=-1)


def get_camera_params(uv: jnp.ndarray, pose: jnp.ndarray,
                      intrinsics: jnp.ndarray):
    """Pixel coords -> world-space unit ray directions + camera center.

    Args:
      uv: ``[B, N, 2]`` pixel coordinates (x, y).
      pose: ``[B, 4, 4]`` camera-to-world matrix.
      intrinsics: ``[B, 4, 4]`` or ``[B, 3, 3]``.

    Returns:
      (ray_dirs ``[B, N, 3]`` normalized, cam_loc ``[B, 3]``).
    """
    cam_loc = pose[:, :3, 3]
    x_cam = uv[:, :, 0]
    y_cam = uv[:, :, 1]
    z_cam = jnp.ones_like(x_cam)

    pts_cam = lift(x_cam, y_cam, z_cam, intrinsics)  # [B, N, 4]
    # world = R @ p_cam + t
    world = jnp.einsum("bij,bnj->bni", pose[:, :3, :3], pts_cam[:, :, :3]) + \
        cam_loc[:, None, :]
    ray_dirs = world - cam_loc[:, None, :]
    ray_dirs = ray_dirs / jnp.linalg.norm(ray_dirs, axis=-1, keepdims=True)
    return ray_dirs, cam_loc


def project(world_pts: jnp.ndarray, pose: jnp.ndarray,
            intrinsics: jnp.ndarray):
    """World points -> pixel coords (reference ``get_uv``, rend_util.py:97-130).

    Args:
      world_pts: ``[B, N, 3]``; pose/intrinsics: ``[B, 4, 4]``.
    Returns:
      (x ``[B, N]``, y ``[B, N]``, z_cam ``[B, N]``).
    """
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    rel = world_pts - pose[:, None, :3, 3]
    pts_cam = jnp.einsum("bnj,bji->bni", rel, pose[:, :3, :3])
    x_lift, y_lift, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    y = y_lift / z * fy + cy
    x = x_lift / z * fx + cx - cy * sk / fy + sk * y / fy
    return x, y, z


def get_sphere_intersections(cam_loc: jnp.ndarray, ray_dirs: jnp.ndarray,
                             r: float = 1.0) -> jnp.ndarray:
    """Near/far intersection distances of rays with a sphere of radius r.

    Returns ``[n_rays, 2]`` clamped at 0. The reference hard-exits when a ray
    misses the sphere (rend_util.py:209-211); here misses produce 0s and the
    caller decides (jit-safe).
    """
    ray_cam_dot = jnp.sum(ray_dirs * cam_loc, axis=-1, keepdims=True)
    under_sqrt = ray_cam_dot ** 2 - (
        jnp.sum(cam_loc ** 2, axis=-1, keepdims=True) - r ** 2
    )
    sqrt_term = jnp.sqrt(jnp.maximum(under_sqrt, 0.0))
    ints = sqrt_term * jnp.asarray([-1.0, 1.0]) - ray_cam_dot
    return jnp.maximum(ints, 0.0)


# ---------------------------------------------------------------------------
# Host-side (numpy) camera utilities for dataset loading.
# ---------------------------------------------------------------------------

def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3x4 projection matrix into (intrinsics 4x4, pose 4x4 c2w).

    Same contract as the reference (rend_util.py:36-57) but via RQ
    factorization instead of cv2.decomposeProjectionMatrix.
    """
    P = np.asarray(P, dtype=np.float64)[:3, :4]
    M = P[:, :3]

    # RQ decomposition of M = K R via QR of the flipped transpose.
    flip = np.array([[0, 0, 1], [0, 1, 0], [1, 0, 0]], dtype=np.float64)
    Q_, R_ = np.linalg.qr((flip @ M).T)
    K = flip @ R_.T @ flip
    R = flip @ Q_.T

    # Make diagonal of K positive.
    signs = np.sign(np.diag(K))
    signs[signs == 0] = 1.0
    T_fix = np.diag(signs)
    K = K @ T_fix
    R = T_fix @ R
    if np.linalg.det(R) < 0:
        K = -K
        R = -R

    # Camera center: c = -M^-1 p4 (null space of P).
    c = -np.linalg.solve(M, P[:, 3])

    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T  # world-from-camera rotation
    pose[:3, 3] = c
    return intrinsics.astype(np.float64), pose
