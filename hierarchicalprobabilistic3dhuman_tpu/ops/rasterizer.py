"""Triangle rasterization on TPU: z-buffered barycentric attribute interpolation.

Replaces pytorch3d's C++/CUDA MeshRasterizer (the reference's only hard native
dependency — renderers/pytorch3d_textured_renderer.py:195-204). The TPU has no
scatter-friendly z-buffer primitive, so rasterization is formulated as a
per-pixel min-reduction over faces, streamed in fixed-size face chunks:

  for each chunk of faces:
      edge functions for (pixels x chunk)   -> coverage + barycentrics
      z = sum_i w_i z_i                     -> chunk depth
      winner-take-all vs running z-buffer   -> update depth + attributes

The XLA backend below scans face chunks with `lax.scan` (correct everywhere,
tractable at 256^2 x 13774 faces) and maps over the batch with `lax.map` to
bound memory. A Pallas-tiled variant with the same semantics lives in
ops/rasterizer_pallas.py (used on TPU for speed).

Conventions: verts are in *screen space* — x = column pixels (right), y = row
pixels (down), z = camera depth (smaller = closer, z <= znear culled). Pixel
(r, c) is sampled at (x, y) = (c + 0.5, r + 0.5). Faces covering a pixel with
either winding count (no backface culling, like the reference's settings).
"""


import jax
import jax.numpy as jnp
from jax import lax

_INF = 1e30


def _pad_faces(face_verts, face_attrs, chunk):
    """Pad the face axis to a multiple of chunk with degenerate faces."""
    F = face_verts.shape[0]
    pad = (-F) % chunk
    if pad:
        face_verts = jnp.concatenate(
            [face_verts, jnp.zeros((pad,) + face_verts.shape[1:], face_verts.dtype)], axis=0)
        face_attrs = jnp.concatenate(
            [face_attrs, jnp.zeros((pad,) + face_attrs.shape[1:], face_attrs.dtype)], axis=0)
    return face_verts, face_attrs


def rasterize_one(face_verts, face_attrs, image_hw, znear=1e-3, chunk=256):
    """Rasterize one mesh.

    :param face_verts: (F, 3, 3) per-face corner screen coords [x, y, z]
    :param face_attrs: (F, 3, A) per-face corner attributes
    :param image_hw: (H, W) static
    :param znear: faces with interpolated depth <= znear are culled
    :param chunk: faces processed per scan step (memory/speed knob)
    :return: attrs (H, W, A), depth (H, W) (+inf where empty), mask (H, W) bool
    """
    H, W = image_hw
    A = face_attrs.shape[-1]
    P = H * W
    dtype = face_verts.dtype

    face_verts, face_attrs = _pad_faces(face_verts, face_attrs, chunk)
    n_chunks = face_verts.shape[0] // chunk
    fv = face_verts.reshape(n_chunks, chunk, 3, 3)
    fa = face_attrs.reshape(n_chunks, chunk, 3, A)

    # Pixel centres (P, 1) each.
    cols = (jnp.arange(W, dtype=dtype) + 0.5)
    rows = (jnp.arange(H, dtype=dtype) + 0.5)
    px = jnp.tile(cols[None, :], (H, 1)).reshape(P, 1)
    py = jnp.tile(rows[:, None], (1, W)).reshape(P, 1)

    def body(carry, chunk_data):
        zbuf, attr_buf = carry
        cv, ca = chunk_data           # (C, 3, 3), (C, 3, A)
        x = cv[:, :, 0]               # (C, 3)
        y = cv[:, :, 1]
        z = cv[:, :, 2]

        # Edge functions e_k linear in pixel coords: e_k = a_k*px + b_k*py + c_k
        # e_k is the signed area opposite vertex k.
        def edge(i, j):
            a = y[:, i] - y[:, j]
            b = x[:, j] - x[:, i]
            c = x[:, i] * y[:, j] - y[:, i] * x[:, j]
            return px * a[None, :] + py * b[None, :] + c[None, :]  # (P, C)

        e0 = edge(1, 2)
        e1 = edge(2, 0)
        e2 = edge(0, 1)
        # 2 * signed area, computed from vertex coords directly: summing the
        # edge functions instead would let FMA-contraction noise resurrect
        # exactly-degenerate faces (zero-area slivers at mesh poles).
        denom = ((x[:, 1] - x[:, 0]) * (y[:, 2] - y[:, 0])
                 - (y[:, 1] - y[:, 0]) * (x[:, 2] - x[:, 0]))[None, :]  # (1, C)

        pos = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (denom > 1e-9)
        neg = (e0 <= 0) & (e1 <= 0) & (e2 <= 0) & (denom < -1e-9)
        covered = pos | neg

        inv_denom = 1.0 / jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0)
        w0 = e0 * inv_denom
        w1 = e1 * inv_denom
        w2 = e2 * inv_denom
        # Renormalise: FMA rounding makes w sums drift on sliver faces.
        wsum = w0 + w1 + w2
        inv_wsum = 1.0 / jnp.where(jnp.abs(wsum) > 1e-6, wsum, 1.0)
        w0 = w0 * inv_wsum
        w1 = w1 * inv_wsum
        w2 = w2 * inv_wsum

        zpix = w0 * z[None, :, 0] + w1 * z[None, :, 1] + w2 * z[None, :, 2]
        covered = covered & (zpix > znear)
        zmasked = jnp.where(covered, zpix, _INF)      # (P, C)

        chunk_zmin = jnp.min(zmasked, axis=1)          # (P,)
        better = chunk_zmin < zbuf                     # (P,)
        winner = (zmasked <= chunk_zmin[:, None]) & covered & better[:, None]
        # Break ties deterministically: keep lowest face index.
        first = jnp.cumsum(winner.astype(jnp.int32), axis=1) == 1
        winner = winner & first

        new_attr = ((winner * w0) @ ca[:, 0, :]
                    + (winner * w1) @ ca[:, 1, :]
                    + (winner * w2) @ ca[:, 2, :])     # (P, A)
        attr_buf = jnp.where(better[:, None], new_attr, attr_buf)
        zbuf = jnp.minimum(zbuf, chunk_zmin)
        return (zbuf, attr_buf), None

    zbuf0 = jnp.full((P,), _INF, dtype)
    attr0 = jnp.zeros((P, A), dtype)
    (zbuf, attrs), _ = lax.scan(body, (zbuf0, attr0), (fv, fa))

    mask = zbuf < _INF
    return (attrs.reshape(H, W, A),
            jnp.where(zbuf < _INF, zbuf, jnp.inf).reshape(H, W),
            mask.reshape(H, W))


def gather_face_attrs(vert_attrs, faces):
    """(V, A) per-vertex attrs + (F, 3) faces -> (F, 3, A)."""
    return vert_attrs[faces]


def rasterize(verts_screen, faces, vert_attrs, image_hw, znear=1e-3, chunk=256,
              backend="xla"):
    """Batched rasterization.

    :param verts_screen: (B, V, 3) screen coords [x_pix, y_pix, z]
    :param faces: (F, 3) int32 (shared across batch)
    :param vert_attrs: (B, V, A)
    :param image_hw: (H, W)
    :return: dict attrs (B, H, W, A), depth (B, H, W), mask (B, H, W)
    """
    if backend == "pallas":
        from hierarchicalprobabilistic3dhuman_tpu.ops.rasterizer_pallas import (
            rasterize_batched_pallas)
        return rasterize_batched_pallas(verts_screen, faces, vert_attrs,
                                        image_hw, znear=znear)

    def one(args):
        verts, attrs = args
        fv = verts[faces]                      # (F, 3, 3)
        fa = gather_face_attrs(attrs, faces)   # (F, 3, A)
        return rasterize_one(fv, fa, image_hw, znear=znear, chunk=chunk)

    attrs, depth, mask = lax.map(one, (verts_screen, vert_attrs))
    return {"attrs": attrs, "depth": depth, "mask": mask}
