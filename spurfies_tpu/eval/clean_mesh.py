"""Mesh cleaning for the DTU Chamfer protocol.

Behavioral spec from reference ``evals/clean_mesh.py``:
  * mask pass (:135-209): project every vertex into all 49 views; a vertex
    is 'seen' if it lands inside the 11px-dilated foreground mask; keep
    faces whose 3 vertices are each seen in >= 1 view.
  * frustum pass (:258-344): drop faces outside every view frustum
    (reference ray-casts with trimesh+pyembree; we use the equivalent
    containment test — a face survives if its vertices project inside some
    image rectangle with positive depth), then keep components with >= 500
    faces.

Host-side numpy/scipy (cv2 only for mask dilation).
"""

import numpy as np


def project_vertices(verts, world_mat):
    """[N, 3] x P(3x4 or 4x4) -> pixel (x, y), depth."""
    P = np.asarray(world_mat)[:3, :4]
    h = np.concatenate([verts, np.ones((len(verts), 1))], -1)
    pix = h @ P.T
    z = pix[:, 2]
    return pix[:, 0] / z, pix[:, 1] / z, z


def clean_mesh_by_masks(verts, faces, world_mats, masks,
                        dilate_px: int = 11):
    """Mask-visibility cleaning (reference clean_mesh_faces_by_mask).

    Args:
      world_mats: list of projection matrices (world_mat @ scale_mat as the
        reference composes, clean_mesh.py:156-168).
      masks: list of [H, W] {0,1} foreground masks.
    """
    import cv2
    seen = np.zeros(len(verts), dtype=bool)
    for P, mask in zip(world_mats, masks):
        m = cv2.dilate(
            mask.astype(np.uint8),
            np.ones((dilate_px, dilate_px), np.uint8),
        )
        hgt, wid = m.shape
        x, y, z = project_vertices(verts, P)
        xi = np.round(x).astype(int)
        yi = np.round(y).astype(int)
        inb = (z > 0) & (xi >= 0) & (xi < wid) & (yi >= 0) & (yi < hgt)
        hit = np.zeros(len(verts), dtype=bool)
        hit[inb] = m[yi[inb], xi[inb]] > 0
        seen |= hit
    keep_face = seen[faces].all(axis=-1)
    return _reindex(verts, faces[keep_face])


def clean_mesh_by_frustum(verts, faces, world_mats, img_res,
                          min_component_faces: int = 500):
    """Frustum culling + small-component removal
    (reference clean_mesh_faces_outside_frustum semantics)."""
    hgt, wid = img_res
    inside = np.zeros(len(verts), dtype=bool)
    for P in world_mats:
        x, y, z = project_vertices(verts, P)
        inside |= (z > 0) & (x >= 0) & (x < wid) & (y >= 0) & (y < hgt)
    keep_face = inside[faces].all(axis=-1)
    verts, faces = _reindex(verts, faces[keep_face])

    if len(faces) == 0:
        return verts, faces
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    n = len(verts)
    rows = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    cols = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    adj = coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    _, labels = connected_components(adj, directed=False)
    fl = labels[faces[:, 0]]
    sizes = np.bincount(fl)
    keep = sizes[fl] >= min_component_faces
    if not keep.any():  # keep largest if everything is small
        keep = fl == sizes.argmax()
    return _reindex(verts, faces[keep])


def _reindex(verts, faces):
    used = np.unique(faces)
    remap = -np.ones(len(verts), dtype=np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[faces]


def clean_mesh_by_visibility(verts, faces, world_mats, img_res,
                             rel_tol: float = 0.03):
    """Drop faces first-hit by NO view — the reference's ray-cast pass
    (clean_mesh_faces_outside_frustum, clean_mesh.py:258-344, trimesh +
    pyembree) re-expressed as a z-buffer visibility test.

    Casting a ray through a pixel and keeping the first hit face is
    exactly a z-buffer query at that pixel.  Per view: scatter-min each
    face's depth at its projected sample pixels (3 vertices + centroid),
    then a face is visible iff one of its samples' depths is within
    ``rel_tol`` of the buffer minimum at that pixel.  Occluded interior
    faces — which containment-style frustum culling keeps and the
    reference drops — are dropped here too.
    """
    hgt, wid = img_res
    if len(faces) == 0:
        return verts, faces
    f = len(faces)
    tri = verts[faces]                                      # [F, 3, 3]

    # fixed barycentric sample grid covering the triangle (vertices, edge
    # midpoints, interior) — a bounded micro-rasterizer per face; sparse
    # sampling alone leaves z-buffer holes when faces span multiple pixels
    bary = np.array([
        [1, 0, 0], [0, 1, 0], [0, 0, 1],
        [.5, .5, 0], [.5, 0, .5], [0, .5, .5],
        [1 / 3, 1 / 3, 1 / 3],
        [2 / 3, 1 / 6, 1 / 6], [1 / 6, 2 / 3, 1 / 6], [1 / 6, 1 / 6, 2 / 3],
        [.5, .25, .25], [.25, .5, .25], [.25, .25, .5],
    ])                                                       # [B, 3]
    nb = len(bary)
    pts = np.einsum("bj,fjc->fbc", bary, tri).reshape(-1, 3)  # [F*B, 3]

    visible = np.zeros(f, dtype=bool)
    for P in world_mats:
        x, y, z = project_vertices(pts, P)
        xi = np.round(x).astype(np.int64)
        yi = np.round(y).astype(np.int64)
        inb = (z > 1e-6) & (xi >= 0) & (xi < wid) & (yi >= 0) & (yi < hgt)
        pix = np.where(inb, yi * wid + xi, 0)
        zbuf = np.full(hgt * wid, np.inf)
        np.minimum.at(zbuf, pix[inb], z[inb])
        front = inb & (z <= zbuf[pix] * (1.0 + rel_tol))
        visible |= front.reshape(f, nb).any(axis=1)

    # ring dilation: grazing-angle faces lose the depth race by a hair;
    # recover faces touching a visible vertex (a fully occluded region is
    # many rings away from any visible face, so the separation survives)
    for _ in range(2):
        vis_verts = np.zeros(len(verts), dtype=bool)
        vis_verts[faces[visible].reshape(-1)] = True
        visible = visible | vis_verts[faces].any(axis=1)
    return _reindex(verts, faces[visible])


def clean_mesh(verts, faces, world_mats, masks, img_res,
               dilate_px: int = 11, min_component_faces: int = 500,
               visibility: bool = True):
    """Full pipeline: mask pass -> visibility (ray-cast-equivalent) pass ->
    frustum + component pass (reference main loop, clean_mesh.py:382-414)."""
    verts, faces = clean_mesh_by_masks(verts, faces, world_mats, masks,
                                       dilate_px)
    if visibility and len(faces):
        verts, faces = clean_mesh_by_visibility(verts, faces, world_mats,
                                                img_res)
    return clean_mesh_by_frustum(verts, faces, world_mats, img_res,
                                 min_component_faces)
