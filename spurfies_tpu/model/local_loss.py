"""Multi-view feature-consistency ("local") loss.

Behavioral spec from reference ``spurfies/feat_utils.py:377-451``
(get_local_loss) + surface localization ``pointneus_disent.py:586-612,
727-763``:
  * surface points = SDF zero-crossing depths along rays (backward-facing
    crossings only), lerped between samples;
  * points are mapped to world mm via ``p/2 * size + center``, projected
    into the reference + 2 source Vis-MVSNet cameras (cam[0]=extrinsic,
    cam[1]=intrinsic), features bilinearly sampled at grid/2 (feature maps
    are at half the camera resolution);
  * loss = mean over (src views x points) of ``|1 - cos(f_ref, f_src)|``
    masked to in-range projections and corr_loss < 0.5.

Dense TPU version: everything stays ``[R]``-shaped with masks (no boolean
indexing); grid_sample is a hand-rolled bilinear gather with zero padding
(align_corners=False semantics).
"""

import jax.numpy as jnp


def find_surface_depth(sdf: jnp.ndarray, z_vals: jnp.ndarray,
                       valid: jnp.ndarray, filler: float = 1000.0):
    """First backward-facing zero crossing per ray, lerped.

    Args:
      sdf: ``[R, S]`` (filler where invalid); z_vals: ``[R, S]``;
      valid: ``[R, S]``.

    Returns:
      (d_surface ``[R]``, mask ``[R]``) — 0 where no crossing.
    """
    ok = valid & (sdf < filler / 2)
    s0, s1 = sdf[:, :-1], sdf[:, 1:]
    pair_ok = ok[:, :-1] & ok[:, 1:]
    crossing = (s0 * s1 < 0) & (s1 < s0) & pair_ok        # [R, S-1]

    has = jnp.any(crossing, axis=-1)
    first = jnp.argmax(crossing, axis=-1)                  # first True
    r = jnp.arange(sdf.shape[0])
    sdf0 = sdf[r, first]
    sdf1 = sdf[r, first + 1]
    d0 = z_vals[r, first]
    d1 = z_vals[r, first + 1]
    denom = sdf0 - sdf1
    d = jnp.where(
        jnp.abs(denom) > 1e-12, (sdf0 * d1 - sdf1 * d0) / denom, d0
    )
    return jnp.where(has, d, 0.0), has


def grid_sample_bilinear(feat: jnp.ndarray, xy: jnp.ndarray):
    """Bilinear sample with zero padding, align_corners=False.

    Args:
      feat: ``[H, W, C]``; xy: ``[N, 2]`` pixel coords (x, y) in feat scale.

    Returns ``[N, C]``.
    """
    h, w, _ = feat.shape
    x = xy[:, 0] - 0.5
    y = xy[:, 1] - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    tx = (x - x0)[:, None]
    ty = (y - y0)[:, None]

    def tap(yy, xx):
        inb = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        v = feat[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(inb[:, None], v, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return (
        v00 * (1 - tx) * (1 - ty)
        + v01 * tx * (1 - ty)
        + v10 * (1 - tx) * ty
        + v11 * tx * ty
    )


def project_mvs(pts_world: jnp.ndarray, cam: jnp.ndarray):
    """World points -> image pixels via a Vis-MVSNet camera pair
    (cam[0]=4x4 extrinsic w2c, cam[1]=4x4 intrinsic;
    reference idx_world2cam/idx_cam2img, feat_utils.py:43-55).

    Returns (xy ``[N, 2]``, z ``[N]``).
    """
    R = cam[0, :3, :3]
    t = cam[0, :3, 3]
    pc = pts_world @ R.T + t
    z = pc[:, 2]
    K = cam[1, :3, :3]
    pi = pc @ K.T
    xy = pi[:, :2] / (pi[:, 2:3] + 1e-9)
    return xy, z


def local_feature_loss(surface_pts, surf_mask, feat_ref, feats_src,
                       cam_ref, cams_src, size, center,
                       feat_scale: float = 0.5):
    """Dense local loss.

    Args:
      surface_pts: ``[R, 3]`` normalized-space surface points.
      surf_mask: ``[R]`` rays with a surface crossing.
      feat_ref: ``[Hf, Wf, C]``; feats_src: ``[V, Hf, Wf, C]``.
      cam_ref: ``[2, 4, 4]``; cams_src: ``[V, 2, 4, 4]`` (hd cams; feature
        maps are at ``feat_scale`` times their resolution —
        reference grid/2, feat_utils.py:417-420).
      size/center: world denormalization (dtu.py:225-226).
    """
    pts_world = surface_pts / 2.0 * size + center

    xy_ref, _ = project_mvs(pts_world, cam_ref)
    f_ref = grid_sample_bilinear(feat_ref, xy_ref * feat_scale)

    h, w, _ = feat_ref.shape

    def in_range(xy):
        # reference normalizes by size then clamps; in-range = |n| <= 1
        gx = xy[:, 0] * feat_scale / w * 2 - 1
        gy = xy[:, 1] * feat_scale / h * 2 - 1
        return (jnp.abs(gx) <= 1) & (jnp.abs(gy) <= 1)

    ref_in = in_range(xy_ref)

    total = 0.0
    n_views = feats_src.shape[0]
    for v in range(n_views):
        xy_s, _ = project_mvs(pts_world, cams_src[v])
        f_src = grid_sample_bilinear(feats_src[v], xy_s * feat_scale)
        valid = ref_in & in_range(xy_s) & surf_mask

        nr = jnp.linalg.norm(f_ref, axis=-1)
        ns = jnp.linalg.norm(f_src, axis=-1)
        corr = jnp.sum(f_ref * f_src, -1) / (
            jnp.maximum(nr, 1e-9) * jnp.maximum(ns, 1e-9)
        )
        corr_loss = jnp.abs(1.0 - corr)
        keep = valid & (corr_loss < 0.5)
        # reference means over all (points x src) elements of the slice
        total = total + jnp.sum(jnp.where(keep, corr_loss, 0.0))

    denom = jnp.maximum(jnp.sum(surf_mask), 1) * n_views
    return total / denom
