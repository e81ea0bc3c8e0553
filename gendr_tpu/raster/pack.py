"""Per-face constant packing for the Pallas rasterization kernels.

The reference recomputes barycentric/edge algebra per (pixel, face) thread
(generalized_renderer_cuda_kernel.cu:75-165).  On TPU every per-pair
quantity that is *affine in the pixel coordinate* is instead folded into
per-face constants once, so the inner kernel does 2 FMAs per affine value:

  w_i(x, y)    = inv[3i]x + inv[3i+1]y + inv[3i+2]          (cu:38-43)
  tv_k(x, y)   = (w . a0 - a0[v1]) / den                     (cu:150)
               = tA_k x + tB_k y + tC_k        (a0, den from the Gram matrix)

Two exact identities collapse the rest of the per-pair distance algebra
(cu:75-165) into per-face constants:

* the perpendicular foot vector u(p) = (v_{k+1} - p) + tv(p) e_k vanishes
  on the line w_j = 0 (j = the vertex opposite edge k) and is affine in p,
  so u = w_j * m_k for a constant 2-vector m_k  ->  the *unclamped* squared
  edge distance is d2u_k = w_j^2 * |m_k|^2  (2 VPU ops given w);
* u is perpendicular to e_k, so clamping the edge parameter moves the
  closest point along e_k only:  d2c_k = d2u_k + (clip(tv)-tv)^2 |e_k|^2.

For hard RGB the z-argmin key 1/zp = w . iz is affine too (dz rows).

Row layout of the packed tensor (shape [B, NI, F']; SoA so a face chunk is a
(NI, FC) VMEM block whose rows broadcast against the pixel axis):

   0: xmin   1: xmax   2: ymin   3: ymax          (bbox, pre-margin)
   4-12:  inv (row-major 3x3)
  13-21:  tA0 tB0 tC0 tA1 tB1 tC1 tA2 tB2 tC2
  22-27:  ex_k ey_k for k=0,1,2       (edge-k vector = vertex k - vertex k+1)
  28-30:  |e_k|^2
  31-36:  mx_k my_k                   (u = w_j * m_k, j = (k+2)%3)
  37-39:  |m_k|^2
  40:     frontside flag
  41-43:  iz0 iz1 iz2                 (reciprocal vertex depths)
  44:     fvalid
  45-47:  dzA dzB dzC                 (denom = w . iz as an affine)
  48-..:  tex RGB (surface: 3*TS texel rows) | vertex colors (3x3)
"""

from __future__ import annotations

import jax.numpy as jnp

from gendr_tpu import config as C

NI_BASE = 48

# Surface-texel sampling strategy thresholds, shared with the Pallas
# kernels (pallas_backend re-exports them): up to TEXEL_UNROLL_CAP texels
# the one-hot selection is unrolled; above it, texel rows are streamed
# TEXEL_BLOCK at a time and the packed layout pads them to a TEXEL_BLOCK
# multiple so the kernels' dynamic 3*TEXEL_BLOCK-row slices never leave
# the slab.  Defined HERE so layout and kernels can never desynchronize.
TEXEL_UNROLL_CAP = 36
TEXEL_BLOCK = 8


def num_rows(texture_type, TS, with_tex=True):
    """Packed row count for a texture configuration (8-aligned).

    Surface textures contribute 3*TS texel-color rows (48..); vertex
    textures contribute 9 rows.  with_tex=False packs geometry rows only
    (the streaming XLA backend samples colors from the texture tensor
    directly, so its packed block stays O(1) in TS).

    Above TEXEL_UNROLL_CAP the texel rows are padded to a TEXEL_BLOCK
    multiple (see constants above); padded rows are zeros and are never
    selected (the texel index is clipped to TS-1).
    """
    if not with_tex:
        return NI_BASE
    if texture_type == C.TEXTURE_VERTEX:
        tex_rows = 9
    elif TS > TEXEL_UNROLL_CAP:
        tex_rows = 3 * (-(-TS // TEXEL_BLOCK) * TEXEL_BLOCK)
    else:
        tex_rows = 3 * TS
    n = NI_BASE + tex_rows
    return -(-n // 8) * 8


# minimal layout (TS=1 surface / legacy callers)
NI = 56

# row indices (see module docstring)
R_BBOX = 0
R_INV = 4
R_TV = 13
R_E = 22
R_E2 = 28
R_M = 31
R_MM = 37
R_FRONT = 40
R_IZ = 41
R_FVALID = 44
R_DZ = 45
R_TEX = 48


def pack_faces(face_vertices, textures, fvalid, cfg: C.RenderConfig,
               with_tex=True):
    """face_vertices: [B, F', 9]; textures: [B, F', TS, 3]; fvalid: [F'].

    Returns [B, num_rows(...), F'] float32.
    """
    f = face_vertices
    B, Fp = f.shape[:2]
    TS = textures.shape[2]
    NI = num_rows(cfg.texture_type, TS, with_tex)
    x0, y0, z0 = f[..., 0], f[..., 1], f[..., 2]
    x1, y1, z1 = f[..., 3], f[..., 4], f[..., 5]
    x2, y2, z2 = f[..., 6], f[..., 7], f[..., 8]

    rows = [None] * NI

    rows[R_BBOX + 0] = jnp.minimum(jnp.minimum(x0, x1), x2)
    rows[R_BBOX + 1] = jnp.maximum(jnp.maximum(x0, x1), x2)
    rows[R_BBOX + 2] = jnp.minimum(jnp.minimum(y0, y1), y2)
    rows[R_BBOX + 3] = jnp.maximum(jnp.maximum(y0, y1), y2)

    # barycentric inverse (same det clamp as prep.faces_info / cu:645-657)
    inv_star = [
        y1 - y2, x2 - x1, x1 * y2 - x2 * y1,
        y2 - y0, x0 - x2, x2 * y0 - x0 * y2,
        y0 - y1, x1 - x0, x0 * y1 - x1 * y0,
    ]
    det = x2 * (y0 - y1) + x0 * (y1 - y2) + x1 * (y2 - y0)
    det = jnp.where(det > 0, jnp.maximum(det, C.DET_EPS),
                    jnp.minimum(det, -C.DET_EPS))
    inv = [s / det for s in inv_star]
    for i in range(9):
        rows[R_INV + i] = inv[i]

    # Gram matrix rows (cu:659-665) -> per-edge affine tv coefficients
    xs = (x0, x1, x2)
    ys = (y0, y1, y2)
    zs = (z0, z1, z2)
    sym = [[xs[j] * xs[k] + ys[j] * ys[k] + 1.0 for k in range(3)]
           for j in range(3)]
    for k in range(3):
        v0, v1 = k, (k + 1) % 3
        vj = (k + 2) % 3  # opposite vertex: w_vj == 0 on edge k's line
        a0 = [sym[v0][i] - sym[v1][i] for i in range(3)]
        den = a0[v0] - a0[v1]
        den = jnp.where(jnp.abs(den) < 1e-20,
                        jnp.where(den < 0, -1e-20, 1e-20), den)
        # w_i = inv[3i] x + inv[3i+1] y + inv[3i+2]
        tA = (inv[0] * a0[0] + inv[3] * a0[1] + inv[6] * a0[2]) / den
        tB = (inv[1] * a0[0] + inv[4] * a0[1] + inv[7] * a0[2]) / den
        tC = (inv[2] * a0[0] + inv[5] * a0[1] + inv[8] * a0[2]
              - a0[v1]) / den
        rows[R_TV + 3 * k + 0] = tA
        rows[R_TV + 3 * k + 1] = tB
        rows[R_TV + 3 * k + 2] = tC
        ex = xs[v0] - xs[v1]
        ey = ys[v0] - ys[v1]
        rows[R_E + 2 * k + 0] = ex
        rows[R_E + 2 * k + 1] = ey
        e2 = ex * ex + ey * ey
        rows[R_E2 + k] = e2
        # m_k = u(v_vj) / w_vj(v_vj) has the exact closed form
        #   m_k = det / |e_k|^2 * (-ey_k, ex_k)
        # because u(v_vj) is the perpendicular from vertex vj to edge k's
        # line and cross(e_k, v_{k+1} - v_{k+2}) equals the (cyclic-
        # invariant) triangle determinant.  Computing it directly instead
        # of through the tv/inv chain is far better conditioned for thin
        # triangles (f32 p99.9 rel err 4e-5 vs 2e-2) and keeps the Pallas
        # per-pair distance d2u = w_j^2 |m_k|^2 in lockstep with the XLA
        # backend at CDF support boundaries.
        c_over_e2 = det / jnp.maximum(e2, 1e-20)
        mx = -ey * c_over_e2
        my = ex * c_over_e2
        rows[R_M + 2 * k + 0] = mx
        rows[R_M + 2 * k + 1] = my
        rows[R_MM + k] = mx * mx + my * my

    # Point-degenerate faces (all three projected vertices coincide) have
    # no edge direction: every packed distance term is 0, so without a cull
    # they would cover every pixel with frag = CDF(0).  The reference never
    # reaches them outside bbox+margin (check_border, cu:46-52); mask them
    # out entirely — a point face is a zero-measure renderable.  (Segment-
    # degenerate faces are fine: d2u = (inv_star . p)^2 / |e|^2 is the exact
    # perpendicular distance to the segment's line, det cancels.)
    point_degenerate = (rows[R_E2 + 0] + rows[R_E2 + 1]
                        + rows[R_E2 + 2]) <= 0.0

    # frontside (cu:55-58)
    rows[R_FRONT] = ((y2 - y0) * (x1 - x0)
                     < (y1 - y0) * (x2 - x0)).astype(jnp.float32)

    iz = [1.0 / z for z in zs]
    for i in range(3):
        rows[R_IZ + i] = iz[i]
    # hard-RGB depth key as an affine: denom(p) = sum_i w_i(p) iz_i
    for c in range(3):
        rows[R_DZ + c] = (inv[0 + c] * iz[0] + inv[3 + c] * iz[1]
                          + inv[6 + c] * iz[2])

    fval_f = fvalid.astype(jnp.float32)
    if fval_f.ndim == 1:
        fval_f = fval_f[None, :]
    rows[R_FVALID] = jnp.broadcast_to(fval_f, (B, Fp)) \
        * jnp.where(point_degenerate, 0.0, 1.0)

    if not with_tex:
        zero = jnp.zeros((B, Fp), jnp.float32)
        rows = [zero if r is None else r for r in rows]
        return jnp.stack(rows, axis=1)

    if cfg.texture_type == C.TEXTURE_VERTEX:
        for j in range(3):
            for c in range(3):
                rows[R_TEX + 3 * j + c] = textures[:, :, j, c]
    else:
        for t in range(TS):
            for c in range(3):
                rows[R_TEX + 3 * t + c] = textures[:, :, t, c]

    zero = jnp.zeros((B, Fp), jnp.float32)
    rows = [zero if r is None else r for r in rows]
    return jnp.stack(rows, axis=1)


def cull_margin(cfg, params):
    """Semantically exact tile-cull distance.

    A (pixel, face) pair with coverage <= PROBABILITY_THRESHOLD is skipped
    by the reference for both alpha and RGB (cu:784-786), so any outside
    pixel farther than r_prob — where CDF(-r_prob/tau) == 1e-6 — can be
    culled without changing the result.  Combined with the reference's own
    dist_eps cutoff sqrt(dist_eps * tau) (cu:747), the margin is the min of
    the two.  Heavy-tailed CDFs (cauchy, reciprocal, levy) have no useful
    probability radius; heaviside is exactly its bbox.
    """
    tau = params['dist_scale']
    thr_margin = jnp.sqrt(params['dist_eps'] * tau)
    # u such that CDF(-u) <= 1e-6 (conservative constants)
    U = {
        C.HEAVISIDE: 0.0,
        C.UNIFORM: 1.0,
        C.CUBIC_HERMITE: 1.0,
        C.WIGNER_SEMICIRCLE: 1.0,
        C.GAUSSIAN: 4.80,
        C.LAPLACE: 13.2,
        C.LOGISTIC: 13.9,
        C.GUDERMANNIAN: 14.5,
        C.GUMBEL_MAX: 2.7,
        C.GUMBEL_MIN: 13.9,
    }
    shift = jnp.abs(params['dist_shift'])
    if cfg.dist_func in (C.EXPONENTIAL, C.EXPONENTIAL_REV):
        u = 13.9 + shift
    elif cfg.dist_func in (C.GAMMA, C.GAMMA_REV):
        # exact: saturates at GAMMA_THRESHOLD (cu:304-308)
        u = C.GAMMA_THRESHOLD + shift
    elif cfg.dist_func in U:
        u = U[cfg.dist_func]
    else:  # heavy tails: only the dist_eps cutoff applies
        return thr_margin
    r = u * tau
    if cfg.dist_squared:
        # with dist_squared the CDF input is dis^2 (cu:770-772)
        r = jnp.sqrt(u * tau)
    return jnp.minimum(thr_margin, r)


def tile_grid(image_size, tile_w, tile_h):
    """Static pixel permutation for 2D-tiled rendering.

    Returns (T, TP, perm, inv_perm): flat tiled-order pixel index ->
    row-major image index, and its inverse.  The kernels render in tiled
    order (tight bboxes in both axes); the epilogue un-permutes.
    """
    import numpy as np
    is_ = image_size
    tx_n = is_ // tile_w
    ty_n = is_ // tile_h
    T = tx_n * ty_n
    TP = tile_w * tile_h
    t = np.arange(T)
    l = np.arange(TP)
    ty, tx = t // tx_n, t % tx_n
    lr, lc = l // tile_w, l % tile_w
    rows = ty[:, None] * tile_h + lr[None, :]
    cols = tx[:, None] * tile_w + lc[None, :]
    perm = (rows * is_ + cols).reshape(-1)  # tiled idx -> image idx
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return T, TP, perm, inv


def tile_chunk_mask(packed, image_size, tile_w, tile_h, face_chunk, margin,
                    height=None, row0=0):
    """[B, T, K] int32 mask: does face-chunk k (bbox union + margin) overlap
    2D pixel tile t?  The TPU-native replacement for the reference's
    per-thread early-exit culls (cu:747, 769, 784).

    ``height``/``row0`` restrict the tile grid to a horizontal band of the
    image (rows [row0, row0+height)) for the pixel-sharded multi-chip path;
    NDC coordinates stay global, so a band render is bit-identical to the
    corresponding rows of the full render.  row0 may be traced (it is a
    ``jax.lax.axis_index`` product under shard_map)."""
    B = packed.shape[0]
    Fp = packed.shape[2]
    K = Fp // face_chunk
    is_ = image_size
    height = is_ if height is None else height

    xmin = packed[:, R_BBOX + 0].reshape(B, K, face_chunk)
    xmax = packed[:, R_BBOX + 1].reshape(B, K, face_chunk)
    ymin = packed[:, R_BBOX + 2].reshape(B, K, face_chunk)
    ymax = packed[:, R_BBOX + 3].reshape(B, K, face_chunk)
    fval = packed[:, R_FVALID].reshape(B, K, face_chunk) > 0
    big = jnp.float32(1e30)
    cxmin = jnp.min(jnp.where(fval, xmin, big), axis=-1)   # [B, K]
    cxmax = jnp.max(jnp.where(fval, xmax, -big), axis=-1)
    cymin = jnp.min(jnp.where(fval, ymin, big), axis=-1)
    cymax = jnp.max(jnp.where(fval, ymax, -big), axis=-1)

    tx_n = is_ // tile_w
    ty_n = height // tile_h
    T = tx_n * ty_n
    t_idx = jnp.arange(T)
    ty, tx = t_idx // tx_n, t_idx % tx_n
    c0 = tx * tile_w
    r0 = row0 + ty * tile_h
    tx_min = (2.0 * c0 + 1.0 - is_) / is_
    tx_max = (2.0 * (c0 + tile_w - 1) + 1.0 - is_) / is_
    # y decreases with row index (vertical flip, cu:716-719)
    ty_max = (2.0 * (is_ - 1 - r0) + 1.0 - is_) / is_
    ty_min = (2.0 * (is_ - 1 - (r0 + tile_h - 1)) + 1.0 - is_) / is_

    ov_x = (tx_min[None, :, None] <= cxmax[:, None, :] + margin) & \
           (tx_max[None, :, None] >= cxmin[:, None, :] - margin)
    ov_y = (ty_min[None, :, None] <= cymax[:, None, :] + margin) & \
           (ty_max[None, :, None] >= cymin[:, None, :] - margin)
    return (ov_x & ov_y).astype(jnp.int32)  # [B, T, K]


def untile(arr, image_size, tile_w, tile_h):
    """[B, T*TP, C] in tiled pixel order -> [B, H*W, C] image order, as a
    pure reshape/transpose chain (a gather here costs ~0.5 ms at 256^2)."""
    B = arr.shape[0]
    C = arr.shape[-1]
    is_ = image_size
    ty_n, tx_n = is_ // tile_h, is_ // tile_w
    a = arr.reshape(B, ty_n, tx_n, tile_h, tile_w, C)
    a = a.transpose(0, 1, 3, 2, 4, 5)
    return a.reshape(B, is_ * is_, C)


def tile(arr, image_size, tile_w, tile_h):
    """[B, H*W, C] image order -> [B, T*TP, C] tiled pixel order."""
    B = arr.shape[0]
    C = arr.shape[-1]
    is_ = image_size
    ty_n, tx_n = is_ // tile_h, is_ // tile_w
    a = arr.reshape(B, ty_n, tile_h, tx_n, tile_w, C)
    a = a.transpose(0, 1, 3, 2, 4, 5)
    return a.reshape(B, is_ * is_, C)


def tile_soa(arr, image_size, tile_w, tile_h, height=None):
    """[B, C, H*W] image order -> [B, C, T*TP] tiled pixel order.

    Channel-major throughout: the kernels DMA (C, TP) slabs, and the render
    tensors ([B, 4, H, W] images, [B, 2, H, W] aggregates) are already
    channel-major, so no AoS<->SoA transpose ever materializes.
    ``height`` handles a row band of the image (pixel-sharded path).
    """
    B, C = arr.shape[:2]
    is_ = image_size
    height = is_ if height is None else height
    ty_n, tx_n = height // tile_h, is_ // tile_w
    a = arr.reshape(B, C, ty_n, tile_h, tx_n, tile_w)
    a = a.transpose(0, 1, 2, 4, 3, 5)
    return a.reshape(B, C, height * is_)


def untile_soa(arr, image_size, tile_w, tile_h, height=None):
    """[B, C, T*TP] tiled pixel order -> [B, C, H*W] image order."""
    B, C = arr.shape[:2]
    is_ = image_size
    height = is_ if height is None else height
    ty_n, tx_n = height // tile_h, is_ // tile_w
    a = arr.reshape(B, C, ty_n, tx_n, tile_h, tile_w)
    a = a.transpose(0, 1, 2, 4, 3, 5)
    return a.reshape(B, C, height * is_)


def compact_hits(mask):
    """Compact the [B, T, K] overlap mask into iteration lists.

    Returns (tile_counts [B,T], tile_ids [B,T,K]) listing hit chunk ids per
    tile in ascending order, and (chunk_counts [B,K], chunk_ids [B,K,T])
    listing hit tile ids per chunk — the kernels loop over exactly the hit
    pairs with double-buffered DMA, so misses cost nothing.
    """
    B, T, K = mask.shape
    hit = mask > 0
    # ascending ids first: stable argsort of (1 - hit)
    tile_ids = jnp.argsort(1 - mask, axis=2, stable=True).astype(jnp.int32)
    tile_counts = jnp.sum(hit, axis=2).astype(jnp.int32)
    chunk_ids = jnp.argsort(1 - mask, axis=1, stable=True)
    chunk_ids = jnp.swapaxes(chunk_ids, 1, 2).astype(jnp.int32)  # [B, K, T]
    chunk_counts = jnp.sum(hit, axis=1).astype(jnp.int32)
    return tile_counts, tile_ids, chunk_counts, chunk_ids


# ---------------------------------------------------------------------------
# Per-tile face compaction (octet-granular)
# ---------------------------------------------------------------------------

OCT = 8          # compaction granule: 8 Morton-consecutive faces
OCT_CAP = 16     # octets per tile slab -> OCT_CAP*OCT = 128 slots = 1 chunk


def _tile_rects(image_size, tile_w, tile_h, height=None, row0=0):
    """NDC rectangles of the 2D pixel tiles ([T] each of xmin/xmax/
    ymin/ymax), matching tile_chunk_mask's tile geometry."""
    is_ = image_size
    height = is_ if height is None else height
    tx_n = is_ // tile_w
    ty_n = height // tile_h
    t_idx = jnp.arange(tx_n * ty_n)
    ty, tx = t_idx // tx_n, t_idx % tx_n
    c0 = tx * tile_w
    r0 = row0 + ty * tile_h
    txmin = (2.0 * c0 + 1.0 - is_) / is_
    txmax = (2.0 * (c0 + tile_w - 1) + 1.0 - is_) / is_
    tymax = (2.0 * (is_ - 1 - r0) + 1.0 - is_) / is_
    tymin = (2.0 * (is_ - 1 - (r0 + tile_h - 1)) + 1.0 - is_) / is_
    return txmin, txmax, tymin, tymax


def compact_plan(fv, tex, fvalid, image_size, tile_w, tile_h, margin,
                 n_chunks, face_chunk, height=None, row0=0, slabs=1):
    """Per-tile face compaction plan (3.2-5.5x chunk-iteration cuts).

    fv: [B, Fp, 9] Morton-sorted faces; tex: [B, Fp, TS, 3]; fvalid:
    [B, Fp] (or [Fp]) bool.  Groups faces into octets (OCT Morton-
    consecutive faces) and, per 2D pixel tile, compacts the hit octets
    (octet bbox union + margin overlaps the tile) into up to ``slabs``
    dedicated 128-slot chunks appended after the Fp originals (chunk ids
    n_chunks + t*slabs + j).  Denser scenes want more slabs: at 256^2,
    1280f needs 1 (<=14 octets/tile), 5120f needs 4 (<=35).  Tiles whose
    hit-octet count exceeds slabs*OCT_CAP keep the original chunk-
    granular hit list (a per-tile value-level fallback — no trace-level
    branch), so correctness never depends on the cap.

    Returns a dict:
      slot_fv [B, S, 9], slot_tex [B, S, TS, 3], slot_fvalid [B, S]
          (S = T*slabs*OCT_CAP*OCT): the appended faces; dead slots
          (padding / overflow tiles) have fvalid 0.
      oct_ids [B, T*slabs*OCT_CAP] int32: source octet of each slot group
          (for the backward's slot->face gradient scatter).
      tile_counts [B, T], tile_ids [B, T, Kcap]: forward hit lists —
          compact tiles list their appended chunks, overflow tiles their
          original hit chunks.
      chunk_counts [B, K'], chunk_ids [B, K', T]: backward lists over the
          K' = n_chunks + T*slabs total chunks.
    """
    # an appended slab IS one kernel chunk: its slot count must equal the
    # face-chunk width or the K + t*slabs + j chunk-id addressing breaks
    assert OCT_CAP * OCT == face_chunk, (OCT_CAP, OCT, face_chunk)
    CAP = slabs * OCT_CAP
    B, Fp = fv.shape[:2]
    K = n_chunks
    noct = Fp // OCT
    xs = fv[..., 0::3]
    ys = fv[..., 1::3]
    if fvalid.ndim == 1:
        fvalid = jnp.broadcast_to(fvalid[None, :], (B, Fp))
    big = jnp.float32(1e30)
    fxmin = jnp.where(fvalid, jnp.min(xs, -1), big).reshape(B, noct, OCT)
    fxmax = jnp.where(fvalid, jnp.max(xs, -1), -big).reshape(B, noct, OCT)
    fymin = jnp.where(fvalid, jnp.min(ys, -1), big).reshape(B, noct, OCT)
    fymax = jnp.where(fvalid, jnp.max(ys, -1), -big).reshape(B, noct, OCT)
    oxmin = fxmin.min(-1)
    oxmax = fxmax.max(-1)
    oymin = fymin.min(-1)
    oymax = fymax.max(-1)

    txmin, txmax, tymin, tymax = _tile_rects(image_size, tile_w, tile_h,
                                             height, row0)
    T = txmin.shape[0]
    ov = ((txmin[None, :, None] <= oxmax[:, None, :] + margin)
          & (txmax[None, :, None] >= oxmin[:, None, :] - margin)
          & (tymin[None, :, None] <= oymax[:, None, :] + margin)
          & (tymax[None, :, None] >= oymin[:, None, :] - margin))
    # [B, T, noct] octet-hit mask
    n_oct = ov.sum(-1).astype(jnp.int32)                      # [B, T]
    overflow = n_oct > CAP
    active = (n_oct > 0) & (~overflow)
    # slabs actually needed per tile: ceil(n_oct / OCT_CAP), 0 if inactive
    nslab = jnp.where(active,
                      -(-jnp.minimum(n_oct, CAP) // OCT_CAP), 0)

    # first CAP hit octets per tile, ascending Morton order
    oct_sort = jnp.argsort(1 - ov.astype(jnp.int32), axis=2,
                           stable=True).astype(jnp.int32)
    oct_ids = oct_sort[:, :, :CAP]                            # [B, T, CAP]
    oct_slot_valid = (jnp.arange(CAP)[None, None, :] < n_oct[..., None]) \
        & active[..., None]                                   # [B, T, CAP]

    # gather the slot faces/textures octet-wise (contiguous 8-face slices)
    flat_ids = oct_ids.reshape(B, T * CAP)
    fv_o = fv.reshape(B, noct, OCT * 9)
    slot_fv = jnp.take_along_axis(fv_o, flat_ids[..., None], axis=1) \
        .reshape(B, T * CAP * OCT, 9)
    TS = tex.shape[2]
    tex_o = tex.reshape(B, noct, OCT * TS * 3)
    slot_tex = jnp.take_along_axis(tex_o, flat_ids[..., None], axis=1) \
        .reshape(B, T * CAP * OCT, TS, 3)
    fval_o = fvalid.reshape(B, noct, OCT)
    slot_fvalid = jnp.take_along_axis(fval_o, flat_ids[..., None], axis=1)
    slot_fvalid = slot_fvalid \
        & oct_slot_valid.reshape(B, T * CAP)[..., None]
    slot_fvalid = slot_fvalid.reshape(B, T * CAP * OCT)

    # forward hit lists: chunk-granular for overflow tiles, the tile's
    # nslab appended chunks otherwise.  Capacity max(K, slabs)+1 covers
    # both list shapes.
    chunk_mask = _chunk_mask_from_octets(ov, face_chunk)      # [B, T, K]
    orig_sorted = jnp.argsort(1 - chunk_mask, axis=2,
                              stable=True).astype(jnp.int32)
    orig_counts = chunk_mask.sum(-1).astype(jnp.int32)
    Kcap = max(K, slabs) + 1
    ids_over = jnp.concatenate(
        [orig_sorted,
         jnp.zeros((B, T, Kcap - K), jnp.int32)], axis=2)
    slot_chunk0 = K + jnp.arange(T, dtype=jnp.int32) * slabs  # [T]
    ids_compact = slot_chunk0[None, :, None] \
        + jnp.arange(Kcap, dtype=jnp.int32)[None, None, :]
    ids_compact = jnp.broadcast_to(ids_compact, (B, T, Kcap))
    tile_ids = jnp.where(overflow[..., None], ids_over, ids_compact)
    tile_counts = jnp.where(overflow, orig_counts, nslab)

    # backward lists over K' = K + T*slabs chunks: original chunks serve
    # only overflow tiles; appended chunk K + t*slabs + j serves tile t
    # when active and j < nslab(t)
    mask_oo = chunk_mask * overflow[..., None].astype(jnp.int32)
    mask_oo_t = jnp.swapaxes(mask_oo, 1, 2)                   # [B, K, T]
    orig_tiles = jnp.argsort(1 - mask_oo_t, axis=2,
                             stable=True).astype(jnp.int32)
    orig_tcounts = mask_oo_t.sum(-1).astype(jnp.int32)
    slot_tiles = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None, :, None, None],
        (B, T, slabs, T)).reshape(B, T * slabs, T)
    slot_counts = (jnp.arange(slabs, dtype=jnp.int32)[None, None, :]
                   < nslab[..., None]).astype(jnp.int32) \
        .reshape(B, T * slabs)
    chunk_ids = jnp.concatenate([orig_tiles, slot_tiles], axis=1)
    chunk_counts = jnp.concatenate([orig_tcounts, slot_counts], axis=1)

    return dict(slot_fv=slot_fv, slot_tex=slot_tex,
                slot_fvalid=slot_fvalid, oct_ids=flat_ids,
                tile_counts=tile_counts, tile_ids=tile_ids,
                chunk_counts=chunk_counts, chunk_ids=chunk_ids)


def _chunk_mask_from_octets(ov, face_chunk):
    """[B, T, noct] octet-hit mask -> [B, T, K] chunk-hit mask (a chunk is
    hit iff any of its octets is)."""
    B, T, noct = ov.shape
    opc = face_chunk // OCT
    return ov.reshape(B, T, noct // opc, opc).any(-1).astype(jnp.int32)


def scatter_slots(slot_vals, oct_ids, noct):
    """Deterministic slot->face gradient scatter.

    slot_vals: [B, S, C] per-slot values in slot order (S = T*OCT_CAP*OCT);
    oct_ids: [B, T*OCT_CAP] source octet per slot group.  Returns
    [B, noct*OCT, C]: per-face sums over every tile that compacted the
    face.  segment_sum is deterministic, and slots are octet-contiguous so
    the reduction runs over T*OCT_CAP rows, not T*OCT_CAP*OCT.
    """
    import jax
    B, S, Cc = slot_vals.shape
    G = oct_ids.shape[1]
    v = slot_vals.reshape(B, G, OCT * Cc)
    out = jax.vmap(lambda vv, ss: jax.ops.segment_sum(
        vv, ss, num_segments=noct))(v, oct_ids)
    return out.reshape(B, noct * OCT, Cc)


def morton_order(packed, fvalid):
    """Spatial (Morton/Z-curve) face ordering: [B, F'] permutation.

    Sorting faces by interleaved bbox-center bits makes face chunks
    spatially tight, which is what gives the tile x chunk mask its
    selectivity.  Padding faces sort to the end.
    """
    cx = 0.5 * (packed[:, R_BBOX + 0] + packed[:, R_BBOX + 1])
    cy = 0.5 * (packed[:, R_BBOX + 2] + packed[:, R_BBOX + 3])
    qx = jnp.clip(((cx + 1.0) * 0.5 * 1024.0), 0, 1023).astype(jnp.int32)
    qy = jnp.clip(((cy + 1.0) * 0.5 * 1024.0), 0, 1023).astype(jnp.int32)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    key = spread(qx) | (spread(qy) << 1)
    key = jnp.where(fvalid[None, :], key, jnp.int32(0x7FFFFFFF))
    return jnp.argsort(key, axis=1)
