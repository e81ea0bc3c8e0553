"""Pallas TPU rasterization kernels (production hot path).

Re-design of the reference's CUDA render kernels (forward cu:680-862,
backward cu:866-1065) for the TPU execution model:

* grid = (batch, pixel-tile, face-chunk); the face-chunk axis is innermost
  and sequential, so the per-pixel aggregation state lives in VMEM scratch
  across chunk steps (the standard TPU accumulation pattern) — the CUDA
  per-thread serial face loop becomes a vectorized (TP x FC) tile.
* per-face algebra is pre-folded into affine pixel coefficients
  (``pack.pack_faces``) so the inner loop is almost pure FMA.
* the reference's per-thread early-exits (bbox cull cu:747, distance cull
  cu:769) become a tile x chunk bbox mask, scalar-prefetched into SMEM;
  misses skip the whole (tile, chunk) program body via ``pl.when``.
* the alpha t-conorm fold across the chunk's lane axis is a butterfly
  (``pltpu.roll``) reduction — valid because t-conorms are associative and
  commutative with identity 0.
* gradients accumulate in VMEM scratch over pixel tiles and are written once
  per face chunk: deterministic, no atomics (unlike cu:1054-1063).
* hard-RGB color/texture work runs IN-KERNEL for vertex textures and small
  surface textures (the winner's color is carried per lane; its texture
  gradient is a winner-id-masked column sum) — measured on a v5e, the
  alternative XLA epilogues (a 65k-pixel gather + segment-sum) cost ~2.2 ms
  at 256², dwarfing the kernels themselves.  For LARGE surface textures
  (TS > HARD_INKERNEL_TS_CAP) the kernel emits only the winning face index
  and the gather/segment-sum epilogues take over, which is what lifts the
  texture-size cap for hard RGB.  Softmax RGB samples in-kernel: vertex
  textures and surface TS<=36 unroll the texel one-hot; larger surface
  textures stream texel blocks through a fori_loop (dynamic block range)
  up to SOFTMAX_TS_CAP=1024, beyond which the config falls back to the
  XLA backend (see fallback_reason).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gendr_tpu import config as C
from gendr_tpu.ops import distributions as D
from gendr_tpu.ops import tconorms as T
from gendr_tpu.raster import pack
from gendr_tpu.raster import xla_backend as X
from gendr_tpu.raster.pairmath import (
    P_SCALE, P_SHAPE, P_SHIFT, P_THR, P_TCP, P_EPS, P_GAMMA, P_NEAR,
    P_FAR, P_GINV1, P_GINV, P_BG0, P_BG1, P_BG2, P_ROW0, NPAR,
    _params_vec, _pair_math)

NEG_INF = -1e30
BIG_DEPTH = X.BIG_DEPTH

# Above this surface-texture size the per-pair one-hot texel selection in
# the chunk loops (~4·TS VPU ops per (pixel, face) pair) costs more than the
# deferred winner-id XLA epilogues (~2.2 ms flat at 256² on a v5e: a 65k-
# pixel gather forward + a segment-sum backward), so hard RGB switches to
# the deferred path — which also removes any texture-size cap.
HARD_INKERNEL_TS_CAP = 25
# surface-texture one-hot sampling: unroll up to this many texels; above
# it, stream TEXEL_BLOCK texels per fori_loop step (code size O(1) in TS).
# Defined in pack.py (single source of truth — the packed slab layout and
# the kernels' dynamic texel-row slices must agree on both values).
TEXEL_UNROLL_CAP = pack.TEXEL_UNROLL_CAP
TEXEL_BLOCK = pack.TEXEL_BLOCK
# softmax-RGB surface textures beyond this fall back to the XLA scan
# (VMEM slab budget; texture_res 32 = 4x the reference's load_obj max)
SOFTMAX_TS_CAP = 1024

# The compacted hit lists are scalar-prefetched into SMEM (fast path), but
# SMEM is ~1 MB and the table is B*T_tiles*K*4 bytes (e.g. 512^2 x 20480
# faces: 2048*160*4 = 1.3 MB -> Mosaic "would exceed memory").  Above this
# cap the ids move to HBM and each program DMAs its row into an SMEM
# scratch instead (row capacity padded to IDS_ALIGN, the 1-D i32 HBM
# tiling, so the dynamic slice stays tile-aligned).  Tests monkeypatch the
# cap to 0 to force the HBM path on small scenes.
IDS_SMEM_CAP_BYTES = 256 * 1024
IDS_ALIGN = 1024


def _tex_blocked(cfg: C.RenderConfig, TS):
    """True when surface texel rows use the blocked streaming layout (texel
    rows padded to a TEXEL_BLOCK multiple; backward texture grads start at
    an 8-aligned accumulator row)."""
    return (cfg.texture_type == C.TEXTURE_SURFACE
            and TS > TEXEL_UNROLL_CAP)


def _hard_inkernel(cfg: C.RenderConfig, TS):
    """True when hard-RGB color sampling + texture grads run in-kernel
    (winner color carried per lane; grads winner-masked per pair) instead
    of via the deferred XLA epilogues."""
    return (cfg.channels != 'alpha' and cfg.aggr_rgb_func == C.RGB_HARD
            and (cfg.texture_type == C.TEXTURE_VERTEX
                 or TS <= HARD_INKERNEL_TS_CAP))


def _bwd_pix_layout(cfg: C.RenderConfig, TS=1):
    """Pixel-space columns the backward kernel actually reads for a config,
    as (n_cols, colmap): colmap keys are 'gr' (grad rgb base, 3 cols), 'ga'
    (grad alpha), 'fr' (final rgb base, 3), 'fa' (final alpha), 'a0'/'a1'
    (aggrs).  Shipping only live columns halves the per-tile DMA slab for
    the alpha-only and hard-RGB configs (8 sublanes instead of 16)."""
    if cfg.channels == 'alpha' or (cfg.aggr_rgb_func == C.RGB_HARD
                                   and not _hard_inkernel(cfg, TS)):
        # big-texture hard RGB reads the same slab as alpha-only: its
        # texture grads are a deferred XLA segment-sum (_hard_tex_grad)
        cm = dict(ga=0, fa=1)
        n = 2
    elif cfg.aggr_rgb_func == C.RGB_HARD:
        # in-kernel hard RGB: texture grads are routed by comparing each
        # pair's global face id against the pixel's winner id (a1)
        cm = dict(gr=0, ga=3, fa=4, a1=5)
        n = 6
    else:
        cm = dict(gr=0, ga=3, fr=4, fa=7, a0=8, a1=9)
        n = 10
    npixc = -(-n // 8) * 8  # DMA sublane dim must be a multiple of 8
    return n, npixc, cm

def _tconorm_butterfly(tid, frag, p):
    """All-lane t-conorm reduction on the (TP, FC) minor axis."""
    fc = frag.shape[-1]
    h = 1
    while h < fc:
        frag = T.fold_step(tid, frag, pltpu.roll(frag, h, axis=1), p)
        h *= 2
    return frag[:, :1]


def _texel_block_range(ti, care, TS):
    """Dynamic texel-block bounds [b0, b1) covering every texel index that a
    pair the caller CARES about selects.  Pairs outside ``care`` contribute
    nothing downstream (their blend weight / gradient coefficient is zero),
    so blocks only they touch can be skipped; when a tile sees a small part
    of a face's texel grid (large faces, high texture_res) this collapses
    the block loop to the observed range.  Cost: two masked full-tile
    reductions per chunk iteration."""
    TB = TEXEL_BLOCK
    timin = jnp.min(jnp.where(care, ti, TS))
    timax = jnp.max(jnp.where(care, ti, -1))
    # all-miss chunks give b0 = nblk, b1 = 0 -> the fori_loop runs 0 times
    return timin // TB, timax // TB + 1


def _colors(row, q, cfg: C.RenderConfig, TS=1, rowblk=None, care=None):
    """Per-pair colors for in-kernel RGB (forward_sample_texture,
    cu:175-191): vertex = barycentric blend; surface = folded R x R texel
    grid, selected by a one-hot sum over the packed texel rows (Mosaic has
    no per-lane gather — tpu.dynamic_gather only addresses one vreg, 8
    sublanes, along the gather axis).  Small TS unrolls the one-hot; TS
    above TEXEL_UNROLL_CAP streams TEXEL_BLOCK texels at a time through a
    ``fori_loop`` with dynamic sublane slices of the packed slab
    (``rowblk``), which bounds the Mosaic program size at O(1) in TS while
    keeping the whole softmax-RGB path in-kernel for texture_res up to 16+
    (reference load_obj.py:33-106 supports texture_res 16 -> TS=256).
    ``care`` (optional bool mask) tightens the streamed loop to the texel
    range actually selected by contributing pairs (_texel_block_range)."""
    if cfg.texture_type == C.TEXTURE_VERTEX:
        w = q['wcn']
        return [w[0] * row(pack.R_TEX + c) + w[1] * row(pack.R_TEX + 3 + c)
                + w[2] * row(pack.R_TEX + 6 + c) for c in range(3)]
    if TS == 1:
        return [row(pack.R_TEX + c) for c in range(3)]
    ti = _texel_index(q, TS)
    if TS <= TEXEL_UNROLL_CAP or rowblk is None:
        cols = [jnp.zeros_like(q['frag']) for _ in range(3)]
        for t in range(TS):
            m = ti == t
            for c in range(3):
                cols[c] = jnp.where(m, row(pack.R_TEX + 3 * t + c), cols[c])
        return cols

    TB = TEXEL_BLOCK
    nblk = -(-TS // TB)
    zero = jnp.zeros_like(q['frag'])
    if care is not None:
        b0, b1 = _texel_block_range(ti, care, TS)
    else:
        b0, b1 = 0, nblk

    def blk_body(b, acc):
        # (3*TB, FC) texel-color rows of this block; pack pads the texel
        # rows to a TB multiple, so the slice never leaves the slab, and
        # ti is clipped to TS-1, so padded texels are never selected
        rows = rowblk(pack.R_TEX + 3 * TB * b, 3 * TB)
        out = list(acc)
        for u in range(TB):
            m = ti == b * TB + u
            for c in range(3):
                out[c] = jnp.where(m, rows[3 * u + c][None, :], out[c])
        return tuple(out)

    return list(jax.lax.fori_loop(b0, b1, blk_body, (zero, zero, zero)))


def _texel_index_from_w(w0, w1, TS):
    """surface_texel_index (cu:178-185), elementwise on any shape."""
    R = int(round(TS ** 0.5))
    w_x = jnp.floor(w0 * R).astype(jnp.int32)
    w_y = jnp.floor(w1 * R).astype(jnp.int32)
    lower = (w0 + w1) * R - w_x.astype(jnp.float32) \
        - w_y.astype(jnp.float32) <= 1.0
    idx = jnp.where(lower, w_y * R + w_x,
                    (R - 1 - w_y) * R + (R - 1 - w_x))
    return jnp.clip(idx, 0, TS - 1)


def _texel_index(q, TS):
    """surface_texel_index on the (TP, FC) tile."""
    return _texel_index_from_w(q['wcn'][0], q['wcn'][1], TS)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_out_cols(cfg: C.RenderConfig, TS=1):
    """Forward output columns: [alpha] for the silhouette-only fast path,
    [alpha, depth, fidx, r, g, b] for in-kernel hard RGB, [alpha, depth,
    fidx] for big-texture hard RGB (color is the epilogue gather keyed on
    fidx), else [alpha, ssum, smax, r, g, b] for softmax RGB."""
    if cfg.channels == 'alpha':
        return 1
    if cfg.aggr_rgb_func == C.RGB_HARD:
        return 6 if _hard_inkernel(cfg, TS) else 3
    return 6


def _lane_deferred_alpha(tid):
    """True when the alpha fold can run entirely in per-lane space: the
    chunk loop then performs ONE elementwise op per (pixel, face) pair and
    the cross-lane reduction happens once per tile in the epilogue.  Holds
    for folds with a per-lane sufficient statistic: max (max), product of
    (1-b) (probabilistic), sum of log((1-b)/(1+b)) (einstein), and the hard
    threshold (a max)."""
    return tid in (C.ALPHA_HARD, C.MAX_TCN, C.PROBABILISTIC_TCN,
                   C.EINSTEIN_TCN)


def _lane_prod(x):
    """Cross-lane product via a roll butterfly (runs once per tile)."""
    fc = x.shape[-1]
    h = 1
    while h < fc:
        x = x * pltpu.roll(x, h, axis=1)
        h *= 2
    return x[:, :1]


def _fwd_kernel(*refs, cfg: C.RenderConfig, TP, FC, is_,
                T_tiles, K, tile_w, tile_h, tx_n, TS, ids_in_hbm=False):
    """One program per pixel tile; in-kernel loop over the tile's compacted
    hit-chunk list with double-buffered HBM->VMEM DMA (misses are never
    touched — the TPU-native replacement for the reference's per-thread
    early exits).  (Tried: whole packed array VMEM-resident with dynamic
    lane slicing instead of the DMA loop — zero runtime change at 1280
    faces (double buffering already hides the copies) and a 13x Mosaic
    compile-time blowup at 20480 faces.  The DMA loop stays.)

    Aggregation state is carried PER LANE (TP, FC) wherever the fold admits
    a per-lane sufficient statistic, so the chunk loop is purely elementwise
    — no cross-lane reductions, no transcendentals for the common t-conorms
    — and a single epilogue reduction after the loop produces the pixel
    values.  The hard-RGB z-argmin (cu:815-822) carries per-lane
    (best-denom, chunk-id, rgb) and resolves the cross-lane winner (with
    the reference's first-face tie-break) once at the end.

    ``ids_in_hbm``: hit-list placement (see IDS_SMEM_CAP_BYTES) — False:
    ids are scalar-prefetched (ids_ref in SMEM); True: ids live in HBM
    (row capacity K padded to IDS_ALIGN) and this program DMAs its row
    into the ids_smem scratch before the chunk loop."""
    if ids_in_hbm:
        (count_ref, par_ref, ids_hbm, packed_hbm, out_ref,
         buf_ref, sem_ref, ids_smem, ids_sem) = refs
    else:
        (count_ref, ids_ref, par_ref, packed_hbm, out_ref,
         buf_ref, sem_ref) = refs
    b = pl.program_id(0)
    t = pl.program_id(1)

    n = count_ref[b * T_tiles + t]
    par = tuple(par_ref[i] for i in range(NPAR))

    lidx = jax.lax.broadcasted_iota(jnp.int32, (TP, 1), 0)
    lr = lidx // tile_w
    lc = lidx - lr * tile_w
    ty = t // tx_n
    tx = t - ty * tx_n
    prow = ty * tile_h + lr  # band-local row; global = prow + par[P_ROW0]
    pcol = tx * tile_w + lc
    xp = (2.0 * pcol.astype(jnp.float32) + 1.0 - is_) / is_
    yp = (2.0 * (is_ - 1 - prow).astype(jnp.float32) + 1.0 - is_) / is_ \
        - 2.0 * par[P_ROW0] / is_
    lane = jax.lax.broadcasted_iota(jnp.int32, (TP, FC), 1)

    tid = cfg.aggr_alpha_func
    lane_alpha = _lane_deferred_alpha(tid)
    hard_rgb = cfg.channels != 'alpha' and cfg.aggr_rgb_func == C.RGB_HARD
    hard_ink = hard_rgb and _hard_inkernel(cfg, TS)
    softmax_rgb = cfg.channels != 'alpha' \
        and cfg.aggr_rgb_func == C.RGB_SOFTMAX

    if ids_in_hbm:
        def chunk_id(j):
            return ids_smem[j]
    else:
        def chunk_id(j):
            return ids_ref[(b * T_tiles + t) * K + j]

    def start_dma(slot, j):
        cid = chunk_id(j)
        pltpu.make_async_copy(
            packed_hbm.at[b, :, pl.ds(cid * FC, FC)],
            buf_ref.at[slot], sem_ref.at[slot]).start()

    def wait_dma(slot):
        pltpu.make_async_copy(
            packed_hbm.at[b, :, pl.ds(0, FC)],
            buf_ref.at[slot], sem_ref.at[slot]).wait()

    # ---- empty-tile short-circuit ----
    # 61% of tiles have no hit chunks on a typical headline scene; their
    # init + epilogue (six (TP, FC) carries + six cross-lane reductions)
    # is a constant — write it directly and skip everything.  The values
    # mirror the epilogue applied to the untouched init state: alpha 0 for
    # every fold, no winner (BIG_DEPTH depth, -1 id, zero rgb), empty
    # streaming softmax (ssum 0, smax -inf, zero rgb).
    empty_vals = [0.0]
    if cfg.channels != 'alpha':
        if hard_rgb:
            empty_vals += [BIG_DEPTH, -1.0] + ([0.0] * 3 if hard_ink else [])
        else:
            empty_vals += [0.0, NEG_INF, 0.0, 0.0, 0.0]

    @pl.when(n == 0)
    def _empty():
        out_ref[0, :, :] = jnp.concatenate(
            [jnp.full((1, TP), val, jnp.float32) for val in empty_vals],
            axis=0)

    def _fwd_tile_body():
        if ids_in_hbm:
            # fetch this tile's id row first (chunk_id(0) feeds the packed
            # DMA's address); ~K*4 bytes, negligible vs the chunk loop
            idcp = pltpu.make_async_copy(
                ids_hbm.at[pl.ds((b * T_tiles + t) * K, K)], ids_smem,
                ids_sem)
            idcp.start()
            idcp.wait()
        start_dma(0, 0)

        # ---- loop carry: per-lane sufficient statistics ----
        zTF = jnp.zeros((TP, FC), jnp.float32)
        zT1 = jnp.zeros((TP, 1), jnp.float32)
        init = []
        if lane_alpha:
            init.append(jnp.ones((TP, FC), jnp.float32)
                        if tid == C.PROBABILISTIC_TCN else zTF)
        else:
            init.append(zT1)  # generic fold: (TP, 1) running alpha
        if hard_rgb:
            init += [jnp.full((TP, FC), NEG_INF, jnp.float32),  # best denom
                     jnp.full((TP, FC), -1.0, jnp.float32)]     # its chunk id
            if hard_ink:
                init += [zTF, zTF, zTF]                          # its rgb
        elif softmax_rgb:
            init += [zT1, jnp.full((TP, 1), NEG_INF, jnp.float32),
                     zT1, zT1, zT1]  # ssum, smax, rgb

        def body(j, carry):
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < n)
            def _():
                start_dma(jax.lax.rem(j + 1, 2), j + 1)

            wait_dma(slot)
            cid = chunk_id(j)

            def row(i):
                return buf_ref[slot, i, :].reshape(1, FC)

            def rowblk(start, nrows):
                # (nrows, FC) slab rows at a traced 8-aligned start (blocked
                # texel streaming, see _colors)
                return buf_ref[slot, pl.ds(start, nrows), :]

            # in-kernel color paths need normalized barycentrics for vertex
            # blending / texel indexing; for hard RGB the pair math hands back
            # the raw barycentrics (winners are inside-loose, where raw ==
            # clipped-normalized), so hard_ink never pays the divides
            need_wcn = (softmax_rgb or hard_ink) \
                and (cfg.texture_type == C.TEXTURE_VERTEX or TS > 1)
            q = _pair_math(row, xp, yp, par, cfg, need_wcn=need_wcn,
                           fwd_only=True, need_depth=cfg.channels != 'alpha')
            frag = q['frag']
            out = []
            it = iter(carry)

            # -- alpha (cu:791-801): one elementwise op per pair for the
            # deferred folds; generic parametric folds butterfly per chunk
            a = next(it)
            if tid == C.ALPHA_HARD:
                out.append(jnp.maximum(a, jnp.where(frag > 0.5, 1.0, 0.0)))
            elif tid == C.MAX_TCN:
                out.append(jnp.maximum(a, frag))
            elif tid == C.PROBABILISTIC_TCN:
                out.append(a * (1.0 - frag))
            elif tid == C.EINSTEIN_TCN:
                out.append(a + jnp.log1p(-frag) - jnp.log1p(frag))
            else:
                chunk = _tconorm_butterfly(tid, frag, par[P_TCP])
                out.append(T.fold_step(tid, a, chunk, par[P_TCP]))

            if hard_rgb:
                # z-argmin as a per-lane denom argmax (zp = 1/denom for
                # inside-loose pixels, see _pair_math); strict > keeps the
                # earlier (lower-id) chunk on ties, matching cu:815-822.
                # Small textures (hard_ink) carry the winner's color per lane;
                # big ones resolve only the id and sample in the XLA epilogue
                dbest, cidb = next(it), next(it)
                hmask = q['valid'] & q['zvalid'] & q['in_loose'] & q['front_ok']
                dm = jnp.where(hmask, q['denom'], NEG_INF)
                better = dm > dbest
                cidf = cid.astype(jnp.float32)
                out += [jnp.where(better, dm, dbest),
                        jnp.where(better, cidf, cidb)]
                if hard_ink:
                    cr, cg, cb = next(it), next(it), next(it)
                    color = _colors(row, q, cfg, TS, rowblk=rowblk)
                    out += [jnp.where(better, color[0], cr),
                            jnp.where(better, color[1], cg),
                            jnp.where(better, color[2], cb)]
            elif softmax_rgb:
                # streaming softmax (cu:824-839)
                ssum, smax, sr, sg, sb = next(it), next(it), next(it), \
                    next(it), next(it)
                gamma = par[P_GAMMA]
                cmask = q['valid'] & q['zvalid'] & q['front_ok']
                zp_norm = (par[P_FAR] - q['zp']) / (par[P_FAR] - par[P_NEAR])
                zn = jnp.where(cmask, zp_norm, NEG_INF)
                mc = jnp.max(zn, axis=1, keepdims=True)
                m_new = jnp.maximum(smax, mc)
                scale_old = jnp.exp((smax - m_new) / gamma)
                wexp = jnp.where(cmask, frag * jnp.exp((zn - m_new) / gamma),
                                 0.0)
                cols = _colors(row, q, cfg, TS, rowblk=rowblk,
                               care=cmask & (frag > 0.0))
                out += [ssum * scale_old + jnp.sum(wexp, axis=1, keepdims=True),
                        m_new,
                        sr * scale_old + jnp.sum(wexp * cols[0], axis=1,
                                                 keepdims=True),
                        sg * scale_old + jnp.sum(wexp * cols[1], axis=1,
                                                 keepdims=True),
                        sb * scale_old + jnp.sum(wexp * cols[2], axis=1,
                                                 keepdims=True)]
            return tuple(out)

        final = jax.lax.fori_loop(0, n, body, tuple(init))

        # ---- epilogue: one cross-lane reduction per tile ----
        it = iter(final)
        a = next(it)
        if tid in (C.ALPHA_HARD, C.MAX_TCN):
            alpha = jnp.max(a, axis=1, keepdims=True)
        elif tid == C.PROBABILISTIC_TCN:
            alpha = 1.0 - _lane_prod(a)
        elif tid == C.EINSTEIN_TCN:
            u = jnp.exp(jnp.sum(a, axis=1, keepdims=True))
            alpha = (1.0 - u) / (1.0 + u)
        else:
            alpha = a

        if cfg.channels == 'alpha':
            cols = [alpha]
        elif hard_rgb:
            dbest, cidb = next(it), next(it)
            dmax = jnp.max(dbest, axis=1, keepdims=True)
            any_v = dmax > NEG_INF
            gid = cidb * FC + lane.astype(jnp.float32)
            tie = dbest == dmax
            gsel = jnp.min(jnp.where(tie, gid, 3e30), axis=1, keepdims=True)

            cols = [alpha,
                    jnp.where(any_v, 1.0 / dmax, BIG_DEPTH),
                    jnp.where(any_v, gsel, -1.0)]
            if hard_ink:
                win = tie & (gid == gsel)

                def wsel(x):
                    return jnp.sum(jnp.where(win, x, 0.0), axis=1,
                                   keepdims=True)

                cols += [wsel(next(it)), wsel(next(it)), wsel(next(it))]
        else:
            ssum, smax, sr, sg, sb = next(it), next(it), next(it), next(it), \
                next(it)
            cols = [alpha, ssum, smax, sr, sg, sb]

        # emit channel-major (NO_F, TP): one VMEM transpose per tile keeps the
        # whole epilogue SoA (no [P, C] <-> [C, P] relayout ever materializes)
        # (Tried: folding background+finalize in-kernel here — measured ~6%
        # SLOWER end-to-end than the SoA XLA epilogue; the per-tile concat +
        # transpose of finalized columns costs more than it saves.)
        out_ref[0, :, :] = jnp.transpose(jnp.concatenate(cols, axis=1), (1, 0))

    pl.when(n > 0)(_fwd_tile_body)


def fallback_reason(cfg, textures):
    """Why this config is outside the pallas kernels' envelope (or None):
    extreme surface textures on the SOFTMAX color path (every face
    contributes, so sampling must happen in-kernel: TS <= 36 unrolls the
    one-hot, larger TS streams texel blocks through a fori_loop up to
    SOFTMAX_TS_CAP=1024 — 4x the reference's load_obj texture_res max of
    16 -> TS=256; hard RGB has no limit at all: its sampling is an
    epilogue gather keyed on the winner id), or an image size with no
    128-aligned pixel tiling (Mosaic DMA alignment; only constrains real
    TPUs)."""
    if (cfg.channels != 'alpha' and cfg.aggr_rgb_func == C.RGB_SOFTMAX
            and cfg.texture_type == C.TEXTURE_SURFACE
            and textures.shape[2] > SOFTMAX_TS_CAP):
        return (f'surface texture_res {int(round(textures.shape[2]**0.5))} '
                f'(TS={textures.shape[2]} texels/face > {SOFTMAX_TS_CAP}) '
                f'with softmax RGB')
    if not _interpret() and not _tiles_feasible(
            cfg.image_size,
            _tile_want(cfg, textures.shape[2], cfg.image_size,
                       cfg.image_size,
                       Fp=-(-textures.shape[1]
                            // _align_fc(cfg.face_chunk))
                       * _align_fc(cfg.face_chunk))):
        return (f'image_size {cfg.image_size} has no 128-aligned pixel '
                f'tiling on TPU (use a multiple of 128, e.g. 128/256/768)')
    return False


def _xla_fallback(cfg, textures):
    """True if this render routes to the XLA backend instead of the pallas
    kernels; honors cfg.on_fallback ('silent' | 'warn' | 'error')."""
    reason = fallback_reason(cfg, textures)
    if not reason:
        return False
    if cfg.on_fallback == 'error':
        raise ValueError(
            f'backend="pallas" cannot run this config ({reason}) and '
            f'on_fallback="error"; pass on_fallback="warn"/"silent" to '
            f'accept the XLA streaming-scan backend instead')
    if cfg.on_fallback == 'warn':
        import warnings
        warnings.warn(f'pallas backend falling back to the XLA streaming '
                      f'scan: {reason}', RuntimeWarning, stacklevel=3)
    return True


_COMPACT_ALPHA = None  # set below (C constants)


def _compact_eligible(cfg: C.RenderConfig, allow_compact):
    """Static gate for per-tile face compaction (see config.RenderConfig.
    compact).  Restrictions and why:
      * deferred alpha families only — the parametric fold families
        (frank &c.) aggregate through the 128-lane butterfly whose tree
        positions the XLA twin mirrors exactly; re-laning faces into
        per-tile slots would re-shape that tree and re-open the
        saturation-amplified parity gap the r5 fixes closed.  The
        deferred families are order-exact (max/hard) or already
        order-reassociated (probabilistic/einstein per-lane statistics).
      * single-shard renders only (allow_compact=False under fp sharding
        / external fvalid): appended slot ids grow each shard's id space
        past its face count, which would break the contiguous
        base_offset partitioning of winner ids across shards.
      * scene-shape slab budget + memory cap: see _compact_slabs.
    """
    if cfg.compact != 'auto' or not allow_compact:
        return False
    return cfg.aggr_alpha_func in (C.ALPHA_HARD, C.MAX_TCN,
                                   C.PROBABILISTIC_TCN, C.EINSTEIN_TCN)


def _compact_slabs(cfg, TS, T_tiles, Fp):
    # How many 128-slot slabs each tile's compacted chunk set gets
    # (0 = compaction off for this scene shape).  The density ratio
    # Fp/(8*T) estimates hit octets per active tile (measured: 1280f at
    # 256 tiles -> max 14 octets/tile, 5120f -> 35, 20480f at 512^2 ->
    # 49); each slab holds OCT_CAP=16 octets, and tiles that still
    # overflow fall back per tile (value-level).  Beyond S=4 the overflow
    # fraction and appended memory outgrow the win (20480f at 256^2: S=4
    # leaves 43/93 tiles overflowed — measured slower than the chunk
    # path), so denser scenes keep the chunk-granular lists.  Appended
    # rows capped at 128 MB (write-once HBM traffic in the prepass).
    if (cfg.texture_type == C.TEXTURE_SURFACE
            and TS > pack.TEXEL_UNROLL_CAP):
        # big streamed surface textures: the texel block loop dominates
        # (11.7 ms at TS=256 — see the r4 roofline note), compaction's
        # iteration cut is noise there, and the appended texel rows blow
        # the packed array up to the point Mosaic's compile helper falls
        # over (observed at TS=256 with 824-row slabs)
        return 0
    if Fp is None:
        return 1
    if T_tiles <= 0:  # band smaller than one 256-pixel tile
        return 0
    r = Fp / (8.0 * T_tiles)
    if r <= 1.0:
        S = 1
    elif r <= 4.0:
        # two slabs/tile: measured 1.44 vs 1.75 ms at 256^2/5120f; S=4
        # regressed (2.13) — the backward grid grows by T*S programs and
        # the appended gather doubles, so more slabs lose what fewer
        # iterations gain
        S = 2
    else:
        return 0
    if S > 1 and T_tiles * S > 1024:
        # the backward runs one program per chunk: T*S appended chunks at
        # 512^2 (2048+) cost more in per-program fixed work + slot-grad
        # scatter than the iteration cut saves (measured 9.9 vs 7.7 ms at
        # 512^2/20480f)
        return 0
    NI = pack.num_rows(cfg.texture_type, TS)
    if T_tiles * S * 128 * NI * 4 > 128 * 1024 * 1024:
        return 0
    # a slab holds OCT_CAP octets = one chunk's worth of faces; more slabs
    # than chunks is meaningless (and would over-slice the octet table)
    return min(S, max(1, Fp // 128))


def _prepass(face_vertices, textures, cfg: C.RenderConfig, params: Dict,
             fvalid_in=None, row_band=None, allow_compact=True):
    """Sort, pack, and build cull lists once; shared by fwd and bwd.
    ``row_band=(row0, height)`` builds the cull lists for that image row
    band only (pixel-sharded path).  When compaction is eligible
    (_compact_eligible), each tile's hit faces are gathered octet-wise
    into a dedicated 128-slot chunk appended after the Fp originals and
    the hit lists point tiles at their own chunk — the kernels are
    unchanged (they just follow the lists)."""
    B, F = face_vertices.shape[:2]
    is_ = cfg.image_size
    row0, hb = row_band if row_band is not None else (0, is_)
    FC = _align_fc(cfg.face_chunk)
    Fp_pad = -(-F // FC) * FC
    tile_w, tile_h = _pick_tile2d(
        is_, _tile_want(cfg, textures.shape[2], is_, hb, allow_compact,
                        Fp_pad), hb)
    fv, tex, fvalid, Fp, K, perm = _sorted_faces(face_vertices, textures,
                                                 F, FC, cfg, fvalid_in)
    margin = pack.cull_margin(cfg, params)
    TS = textures.shape[2]
    # band-independent slab choice (see _tile_want): a band render must
    # build the same per-tile slot layout as the full render
    T_full = (is_ * is_) // (tile_w * tile_h)
    slabs = _compact_slabs(cfg, TS, T_full, Fp_pad)
    use_compact = (FC == 128 and fvalid_in is None and slabs > 0
                   and _compact_eligible(cfg, allow_compact))
    aux_extra = {}
    if use_compact:
        plan = pack.compact_plan(fv, tex, fvalid, is_, tile_w, tile_h,
                                 margin, K, FC, height=hb, row0=row0,
                                 slabs=slabs)
        fv = jnp.concatenate([fv, plan['slot_fv']], axis=1)
        tex = jnp.concatenate([tex, plan['slot_tex']], axis=1)
        fvalid_full = jnp.concatenate(
            [jnp.broadcast_to(fvalid[None, :], (B, Fp)),
             plan['slot_fvalid']], axis=1)
        packed = pack.pack_faces(fv, tex, fvalid_full, cfg)
        tile_counts, tile_ids = plan['tile_counts'], plan['tile_ids']
        chunk_counts, chunk_ids = plan['chunk_counts'], plan['chunk_ids']
        # compaction-ness is NOT stored as a flag: aux travels through the
        # custom-VJP residual pytree where a Python bool would turn into a
        # traced leaf; consumers detect it statically via
        # packed.shape[2] > perm.shape[1]
        aux_extra = dict(oct_ids=plan['oct_ids'])
    else:
        packed = pack.pack_faces(fv, tex, fvalid, cfg)
        mask = pack.tile_chunk_mask(packed, is_, tile_w, tile_h, FC,
                                    margin, height=hb, row0=row0)
        (tile_counts, tile_ids, chunk_counts,
         chunk_ids) = pack.compact_hits(mask)
    # inverse permutation via scatter (an argsort here would re-sort every
    # backward step); iperm[b, perm[b, i]] = i
    Fp = perm.shape[1]
    iperm = jnp.zeros_like(perm).at[
        jnp.arange(B)[:, None], perm].set(
            jnp.broadcast_to(jnp.arange(Fp, dtype=perm.dtype)[None, :],
                             perm.shape))
    return dict(packed=packed, perm=perm, iperm=iperm,
                tile_counts=tile_counts, tile_ids=tile_ids,
                chunk_counts=chunk_counts, chunk_ids=chunk_ids,
                **aux_extra)


def forward(face_vertices, textures, finfo, cfg: C.RenderConfig,
            params: Dict):
    """Same contract as xla_backend.forward."""
    del finfo  # the Pallas path uses its own packed constants
    soft, aggrs, _ = forward_with_aux(face_vertices, textures, cfg, params)
    return soft, aggrs


def forward_with_aux(face_vertices, textures, cfg: C.RenderConfig,
                     params: Dict, aux=None):
    B, F = face_vertices.shape[:2]
    if _xla_fallback(cfg, textures):
        soft, aggrs = X.forward(face_vertices, textures, None, cfg, params)
        return soft, aggrs, None

    out, aux = _fwd_kernel_out(face_vertices, textures, cfg, params, aux)
    soft_colors, aggrs_info = _finalize_soa(out, cfg, params, aux['packed'],
                                            TS=textures.shape[2])
    return soft_colors, aggrs_info, aux


def _pix_coords(is_, height=None, row0=0):
    """Row-major pixel-center NDC coords ([P], [P]) — identical to the
    kernels' in-tile formula after untiling (cu:716-719).  ``height``/
    ``row0`` select an image row band; NDC stays global (row0 may be
    traced)."""
    h = is_ if height is None else height
    ii = jnp.arange(is_, dtype=jnp.float32)
    jj = row0 + jnp.arange(h, dtype=jnp.float32)
    xp1 = (2.0 * ii + 1.0 - is_) / is_
    yp1 = (2.0 * (is_ - 1.0 - jj) + 1.0 - is_) / is_
    return jnp.tile(xp1, (h,)), jnp.repeat(yp1, is_)


def _gather_rows(packed, r0, nr, idx):
    """packed[:, r0:r0+nr, :][..., idx] per batch -> [B, nr, P] f32."""
    B, P = idx.shape
    rows = packed[:, r0:r0 + nr, :].astype(jnp.float32)
    return jnp.take_along_axis(
        rows, jnp.broadcast_to(idx[:, None, :], (B, nr, P)), axis=2)


def _winner_bary(packed, idx, is_, height=None, row0=0):
    """Barycentrics of each pixel's hard-RGB winner face ([B, P] x3).
    Winners are inside-loose (cu:815-822), where the raw affine
    barycentrics are already clipped and normalized."""
    rows = _gather_rows(packed, pack.R_INV, 9, idx)
    xp, yp = _pix_coords(is_, height, row0)
    w0 = rows[:, 0] * xp + rows[:, 1] * yp + rows[:, 2]
    w1 = rows[:, 3] * xp + rows[:, 4] * yp + rows[:, 5]
    return w0, w1, 1.0 - w0 - w1


def _hard_rgb_sample(packed, fidx, cfg, TS, is_, height=None, row0=0):
    """Deferred hard-RGB texture sampling (forward_sample_texture,
    cu:175-191) as an XLA epilogue: the kernel emits only the winning face
    id per pixel ([B, P] float, -1 = none); the color is gathered from the
    packed texel rows here.  Callers mask by ``fidx >= 0``."""
    B, P = fidx.shape
    Fp = packed.shape[2]
    idx = jnp.clip(fidx.astype(jnp.int32), 0, Fp - 1)
    if cfg.texture_type == C.TEXTURE_VERTEX:
        w0, w1, w2 = _winner_bary(packed, idx, is_, height, row0)
        tex = _gather_rows(packed, pack.R_TEX, 9, idx)  # [B, 9, P]
        return jnp.stack([w0 * tex[:, c] + w1 * tex[:, 3 + c]
                          + w2 * tex[:, 6 + c] for c in range(3)], axis=1)
    if TS == 1:
        return _gather_rows(packed, pack.R_TEX, 3, idx)
    # surface TS > 1: per-pixel texel row id — one flat gather per channel
    w0, w1, _ = _winner_bary(packed, idx, is_, height, row0)
    ti = _texel_index_from_w(w0, w1, TS)
    NI = packed.shape[1]
    flat = packed.reshape(B, NI * Fp).astype(jnp.float32)
    lin0 = (pack.R_TEX + 3 * ti) * Fp + idx
    return jnp.stack([jnp.take_along_axis(flat, lin0 + c * Fp, axis=1)
                      for c in range(3)], axis=1)


def _hard_tex_grad(packed, fidx, grad_rgb, cfg, TS, is_, height=None,
                   row0=0):
    """Deferred hard-RGB texture gradient (backward_sample_texture,
    cu:194-214 routed by the winner id, cu:998-1004): a deterministic
    segment-sum of grad_rgb over (winner face, sampled texel) — the
    backward kernel never touches textures for hard RGB.

    fidx: [B, P] float LOCAL sorted-space winner ids (-1 = none);
    grad_rgb: [B, 3, P].  Returns grads in sorted space [B, Fp, TS, 3]
    (vertex: [B, Fp, 3, 3]).

    Under face sharding the per-pixel winner may belong to ANOTHER shard:
    after the base_offset shift its local id is negative or >= Fp — both
    must be masked, not clipped (each shard credits only its own faces,
    exactly like the old in-kernel id comparison)."""
    B, P = fidx.shape
    Fp = packed.shape[2]
    win = (fidx >= 0) & (fidx < Fp)
    idx = jnp.clip(fidx.astype(jnp.int32), 0, Fp - 1)
    gr = grad_rgb.transpose(0, 2, 1)  # [B, P, 3]
    if cfg.texture_type == C.TEXTURE_VERTEX:
        w0, w1, w2 = _winner_bary(packed, idx, is_, height, row0)
        seg = jnp.where(win, idx, Fp)  # one dump row for non-winners
        vals = jnp.concatenate(
            [w[..., None] * gr for w in (w0, w1, w2)], axis=-1)  # [B,P,9]
        out = jax.vmap(lambda v, s: jax.ops.segment_sum(
            v, s, num_segments=Fp + 1))(vals, seg)[:, :Fp]
        return out.reshape(B, Fp, 3, 3)
    if TS == 1:
        ti = jnp.zeros_like(idx)
    else:
        w0, w1, _ = _winner_bary(packed, idx, is_, height, row0)
        ti = _texel_index_from_w(w0, w1, TS)
    seg = jnp.where(win, idx * TS + ti, Fp * TS)
    out = jax.vmap(lambda v, s: jax.ops.segment_sum(
        v, s, num_segments=Fp * TS + 1))(gr, seg)[:, :Fp * TS]
    return out.reshape(B, Fp, TS, 3)


def _finalize_soa(out, cfg: C.RenderConfig, params: Dict, packed=None,
                  TS=1):
    """Background fold + finalize on the channel-major kernel output
    ([B, NO_F, P]) — semantics of X.background_carry + X.merge_carries +
    X.finalize, without ever leaving SoA layout (the final [B, 4, H, W] is
    a pure reshape)."""
    B, _, P = out.shape
    is_ = cfg.image_size
    bg = jnp.asarray(params['background_color'],
                     jnp.float32).reshape(1, 3, 1)
    alpha = out[:, 0:1]  # [B, 1, P]
    if cfg.channels == 'alpha':
        rgb_final = jnp.broadcast_to(bg, (B, 3, P))
        aggr0 = jnp.full((B, 1, P), BIG_DEPTH, jnp.float32)
        aggr1 = jnp.full((B, 1, P), -1.0, jnp.float32)
    elif cfg.aggr_rgb_func == C.RGB_HARD:
        depth = out[:, 1:2]
        fidx = out[:, 2:3]
        has_winner = fidx >= 0
        if _hard_inkernel(cfg, TS):
            rgb = out[:, 3:6]
        else:
            rgb = _hard_rgb_sample(packed, out[:, 2], cfg, TS, is_)
        rgb_final = jnp.where(has_winner, rgb, bg)
        aggr0, aggr1 = depth, fidx
    else:
        eps = params['aggr_rgb_eps']
        gamma = params['aggr_rgb_gamma']
        ssum_k, smax_k = out[:, 1:2], out[:, 2:3]
        # streaming-softmax merge with the background state
        # (smax_bg = eps, ssum_bg = exp(eps / gamma), rgb_bg = bg * ssum_bg)
        m = jnp.maximum(eps, smax_k)
        sa = jnp.exp((eps - m) / gamma)
        sb = jnp.exp((smax_k - m) / gamma)
        ssum = jnp.exp(eps / gamma) * sa + ssum_k * sb
        rgb = bg * (jnp.exp(eps / gamma) * sa) + out[:, 3:6] * sb
        rgb_final = rgb / ssum
        aggr0, aggr1 = ssum, m
    h = P // is_  # band height (== is_ for a full render)
    soft_colors = jnp.concatenate([rgb_final, alpha], axis=1) \
        .reshape(B, 4, h, is_)
    aggrs_info = jnp.concatenate([aggr0, aggr1], axis=1) \
        .reshape(B, 2, h, is_)
    return soft_colors, aggrs_info


def forward_partial(face_vertices, textures, cfg: C.RenderConfig,
                    params: Dict, aux=None, base_offset=0, fvalid=None,
                    row_band=None):
    """Run the forward kernel and return the per-pixel aggregation carry
    WITHOUT the background fold — an ``xla_backend.empty_carry``-compatible
    partial state, mergeable with ``X.merge_carries``.  This is what the
    face-sharded path (gendr_tpu.parallel.sharding) calls per fp shard.

    ``base_offset`` globally offsets the recorded hard-RGB winner ids (they
    stay in this shard's Morton-sorted space plus the offset); ``fvalid``
    ([F] bool) marks externally-padded faces; ``row_band=(row0, height)``
    restricts the render to that image row band (pixel-sharded path).
    Returns (carry, aux).
    """
    # Compaction must stay off under fp sharding (base_offset != 0 — it
    # may also be a traced axis-index product — or an external fvalid):
    # appended slot ids would outgrow this shard's face count and collide
    # with the next shard's base_offset id range.
    allow_compact = (isinstance(base_offset, int) and base_offset == 0
                     and fvalid is None)
    out, aux = _fwd_kernel_out(face_vertices, textures, cfg, params, aux,
                               fvalid, row_band, allow_compact=allow_compact)
    alpha = out[:, 0]
    if cfg.channels == 'alpha':
        # silhouette-only: identity state everywhere but alpha
        carry = (alpha, jnp.full_like(alpha, NEG_INF),
                 jnp.zeros_like(alpha), jnp.zeros(alpha.shape + (3,),
                                                  jnp.float32),
                 jnp.full_like(alpha, BIG_DEPTH),
                 jnp.full_like(alpha, -1).astype(jnp.int32))
    elif cfg.aggr_rgb_func == C.RGB_HARD:
        depth = out[:, 1]
        # NOTE: winner ids stay in Morton-sorted space throughout the pallas
        # pipeline (aux['perm'] maps them to input order if ever needed);
        # base_offset makes them globally unique across fp shards
        fidx = out[:, 2].astype(jnp.int32)
        row0, hb = row_band if row_band is not None else (0, None)
        if _hard_inkernel(cfg, textures.shape[2]):
            rgb = out[:, 3:6].transpose(0, 2, 1)  # X carries AoS rgb
        else:
            rgb = _hard_rgb_sample(aux['packed'], out[:, 2], cfg,
                                   textures.shape[2], cfg.image_size, hb,
                                   row0)
            rgb = rgb.transpose(0, 2, 1)
            # mask the gather's clamped id-0 color on no-winner pixels
            rgb = jnp.where((fidx >= 0)[..., None], rgb, 0.0)
        if base_offset is not None:
            fidx = jnp.where(fidx >= 0, fidx + base_offset, fidx)
        carry = (alpha, jnp.full_like(alpha, NEG_INF),
                 jnp.zeros_like(alpha), rgb, depth, fidx)
    else:
        ssum, smax = out[:, 1], out[:, 2]
        rgb = out[:, 3:6].transpose(0, 2, 1)
        carry = (alpha, smax, ssum, rgb,
                 jnp.full_like(alpha, BIG_DEPTH),
                 jnp.full_like(alpha, -1).astype(jnp.int32))
    return carry, aux


def _fwd_kernel_out(face_vertices, textures, cfg: C.RenderConfig,
                    params: Dict, aux=None, fvalid=None, row_band=None,
                    allow_compact=True):
    """Run the forward kernel; returns (out [B, NO_F, P] channel-major in
    row-major pixel order, aux).  ``row_band=(row0, height)`` renders only
    that image row band (pixel-sharded path); P = height * image_size."""
    B, F = face_vertices.shape[:2]
    TS = textures.shape[2]
    is_ = cfg.image_size
    row0, hb = row_band if row_band is not None else (0, is_)
    P = is_ * hb
    FC = _align_fc(cfg.face_chunk)
    tile_w, tile_h = _pick_tile2d(
        is_, _tile_want(cfg, TS, is_, hb, allow_compact,
                        -(-F // FC) * FC), hb)
    TP = tile_w * tile_h
    T_tiles = P // TP
    tx_n = is_ // tile_w

    if aux is None:
        aux = _prepass(face_vertices, textures, cfg, params, fvalid,
                       row_band, allow_compact)
    packed = aux['packed']
    tile_counts, tile_ids = aux['tile_counts'], aux['tile_ids']
    Fp = packed.shape[2]
    NI = packed.shape[1]
    # K here is the per-tile hit-list CAPACITY (the ids-row stride), which
    # under compaction is K_orig+1, not the chunk count Fp//FC
    K = tile_ids.shape[2]
    par = _params_vec(params, row0, cfg)
    NO_F = _fwd_out_cols(cfg, TS)

    ids_in_hbm = B * T_tiles * K * 4 > IDS_SMEM_CAP_BYTES
    Kc = -(-K // IDS_ALIGN) * IDS_ALIGN if ids_in_hbm else K
    kernel = functools.partial(_fwd_kernel, cfg=cfg, TP=TP, FC=FC, is_=is_,
                               T_tiles=T_tiles, K=Kc, tile_w=tile_w,
                               tile_h=tile_h, tx_n=tx_n, TS=TS,
                               ids_in_hbm=ids_in_hbm)
    out_spec = pl.BlockSpec((1, NO_F, TP), lambda b, t, *_: (b, 0, t))
    scratch = [
        pltpu.VMEM((2, NI, FC), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if ids_in_hbm:
        ids_flat = jnp.pad(tile_ids, ((0, 0), (0, 0), (0, Kc - K))
                           ).reshape(-1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, T_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # hit-list ids in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # packed stays in HBM
            ],
            out_specs=out_spec,
            scratch_shapes=scratch + [pltpu.SMEM((Kc,), jnp.int32),
                                      pltpu.SemaphoreType.DMA],
        )
        args = (tile_counts.reshape(-1), par, ids_flat, packed)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, T_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # packed stays in HBM
            ],
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        args = (tile_counts.reshape(-1), tile_ids.reshape(-1), par, packed)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NO_F, P), jnp.float32),
        interpret=_interpret(),
    )(*args)
    # tiled pixel order -> row-major image order (reshapes, no gather)
    return pack.untile_soa(out, is_, tile_w, tile_h, hb), aux


def _interpret():
    return jax.devices()[0].platform not in ('tpu',)


def _sorted_faces(face_vertices, textures, F, FC, cfg, fvalid_in=None):
    """Pad to a chunk multiple and Morton-sort faces by projected bbox
    center (tight chunk bboxes make the tile x chunk cull selective).

    Returns (fv, tex, fvalid, Fp, K, perm) where sorted[i] = orig[perm[i]].
    Deterministic given the inputs, so forward and backward compute the
    identical permutation.  Note: face *order* only affects exact-tie
    resolution in the hard-RGB z-argmin (cu:816's strict <); sorted order
    resolves such ties by Morton rank instead of input rank.

    ``fvalid_in`` ([F] bool, optional) marks externally-padded faces (the
    face-sharded path pads globally before slicing per shard); they sort to
    the end like local padding and contribute nothing.
    """
    B = face_vertices.shape[0]
    Fp = -(-F // FC) * FC
    fv = jnp.asarray(face_vertices, jnp.float32)
    tex = jnp.asarray(textures, jnp.float32)
    if Fp != F:
        fv = jnp.pad(fv, ((0, 0), (0, Fp - F), (0, 0)))
        tex = jnp.pad(tex, ((0, 0), (0, Fp - F), (0, 0), (0, 0)))
    fvalid = jnp.arange(Fp) < F
    if fvalid_in is not None:
        fvalid = fvalid & jnp.pad(jnp.asarray(fvalid_in, bool),
                                  (0, Fp - F))

    xs = fv[..., 0::3]
    ys = fv[..., 1::3]
    cx = 0.5 * (jnp.min(xs, -1) + jnp.max(xs, -1))
    cy = 0.5 * (jnp.min(ys, -1) + jnp.max(ys, -1))
    qx = jnp.clip((cx + 1.0) * 512.0, 0, 1023).astype(jnp.int32)
    qy = jnp.clip((cy + 1.0) * 512.0, 0, 1023).astype(jnp.int32)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    key = spread(qx) | (spread(qy) << 1)
    key = jnp.where(fvalid[None, :], key, jnp.int32(0x7FFFFFFF))
    perm = jnp.argsort(key, axis=1)  # [B, Fp]

    fv = jnp.take_along_axis(fv, perm[..., None], axis=1)
    tex = jnp.take_along_axis(tex, perm[..., None, None], axis=1)
    if fvalid_in is not None:
        # validity must travel with the sort when invalid faces can sit in
        # the middle of the input (per-batch sorted order)
        fvalid = jnp.take_along_axis(
            jnp.broadcast_to(fvalid[None, :], (B, Fp)), perm, axis=1)
    # stop XLA from fusing the sort-gather into every consumer of the
    # packed constants (it re-materializes the gather per row, which blows
    # joint compile time up by ~50x)
    fv, tex, perm = jax.lax.optimization_barrier((fv, tex, perm))
    K = Fp // FC
    return fv, tex, fvalid, Fp, K, perm


def _tile_want(cfg: C.RenderConfig, TS, is_, hb, allow_compact=True,
               Fp=None):
    """Resolve the pixel-tile size budget (cfg.pixel_tile; 0 = auto).

    Auto: 256 (16x16 tiles) when per-tile face compaction will be active
    for this family — the compacted slab makes the per-tile loop ~1
    iteration, so bigger tiles amortize program overhead (measured 0.841
    vs 1.076 ms on the 256^2/1280f headline); 128 (16x8, the hardware
    minimum) otherwise, where finer tiles cull better."""
    if cfg.pixel_tile:
        return cfg.pixel_tile
    if (allow_compact and cfg.compact == 'auto'
            and cfg.aggr_alpha_func in (C.ALPHA_HARD, C.MAX_TCN,
                                        C.PROBABILISTIC_TCN,
                                        C.EINSTEIN_TCN)):
        # the slab ladder must be BAND-INDEPENDENT: a row-band render has
        # fewer tiles, and letting that change S (or the tile size) would
        # re-lane the per-tile slots and break the bitwise band == full
        # contract of the pixel-sharded path.  Always gate on the full
        # image's tile count.
        T = (is_ * is_) // 256
        if _compact_slabs(cfg, TS, T, Fp) > 0:
            return 256
    return 128


def _pick_tile2d(is_, want, height=None):
    """2D pixel tiles (tight bboxes in both axes).  Returns (tile_w,
    tile_h) with tile_w dividing the image WIDTH and tile_h the rendered
    band HEIGHT (the full image size unless pixel-sharded), with
    tile_w*tile_h <= want.

    On real TPUs the backward kernel DMAs a (NPIXC, TP) pixel slab whose
    minor dim must be 128-aligned, so TP = tile_w*tile_h must be a multiple
    of 128 (Mosaic rejects it otherwise); ``_tiles_feasible`` gates the
    pallas path on that.  Interpret mode (tests) has no such constraint but
    uses the same tiling so CPU tests exercise the TPU configuration."""
    h = is_ if height is None else height
    tw = is_
    for cand in (16, 32, 8):
        if is_ % cand == 0 and cand <= is_:
            tw = cand
            break
    th = max(1, min(want // tw, h))
    while h % th:
        th -= 1
    if (tw * th) % 128 != 0:
        # prefer the largest feasible th <= want//tw, then any feasible one
        cands = [t for t in range(h, 0, -1)
                 if h % t == 0 and (tw * t) % 128 == 0]
        if cands:
            under = [t for t in cands if tw * t <= max(want, 128)]
            th = under[0] if under else cands[-1]
    return tw, th


def _tiles_feasible(is_, want, height=None):
    h = is_ if height is None else height
    tw, th = _pick_tile2d(is_, want, h)
    return (tw * th) % 128 == 0 and (is_ * h) % (tw * th) == 0


def _align_fc(fc):
    """Face-chunk size actually used by the kernels: the packed-constants
    DMA slices the minor (face) dim by FC, which must be 128-aligned on
    real TPUs.  Interpret mode keeps the requested chunk so CPU tests can
    exercise multi-chunk logic with small meshes."""
    if _interpret():
        return fc
    return -(-fc // 128) * 128


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

# bwd per-face output columns: 9 vertex grads + texture grads
def _n_tex_cols(cfg, TS=1):
    if cfg.texture_type == C.TEXTURE_VERTEX:
        return 9
    if _tex_blocked(cfg, TS):
        # padded to a whole number of TEXEL_BLOCK texel blocks so the
        # kernel's dynamic accumulator slices stay 8-aligned
        return 3 * TEXEL_BLOCK * (-(-TS // TEXEL_BLOCK))
    return 3 * TS


def _bwd_col_layout(cfg, TS=1):
    """Columns the backward kernel actually emits, as (NO_B, has_z,
    has_tex, tex0).  Layout: [x0 y0 x1 y1 x2 y2] + [z0 z1 z2 if has_z] +
    tex starting at row tex0 (== 16 for blocked big-TS surface textures so
    the kernel's per-block dynamic accumulator writes land 8-aligned; rows
    9..15 are unused zeros there).
    Vertex z-grads exist only on the softmax-depth path (cu:1026-1029);
    in-kernel texture grads on the softmax color path and on small-texture
    hard RGB (winner-id-masked); big-texture hard RGB routes them through
    the deferred winner-id segment-sum and alpha-only has none — the
    silhouette trainer and the big-texture hard-RGB config both emit 6
    live columns instead of 12+."""
    softmax = cfg.channels != 'alpha' \
        and cfg.aggr_rgb_func == C.RGB_SOFTMAX
    has_z = softmax
    has_tex = softmax or _hard_inkernel(cfg, TS)
    tex0 = 9 if has_z else 6
    if has_tex and _tex_blocked(cfg, TS):
        tex0 = 16
    no_b = tex0 + (_n_tex_cols(cfg, TS) if has_tex else 0)
    return no_b, has_z, has_tex, tex0


def _bwd_kernel(*refs, cfg: C.RenderConfig, TP, FC,
                is_, T_tiles, K, NO_B, tile_w, tile_h, tx_n, TS, CM,
                ids_in_hbm=False):
    """One program per face chunk; in-kernel loop over the chunk's compacted
    hit-tile list, double-buffering the pixel-space columns HBM->VMEM.
    Gradients accumulate in VMEM — deterministic, no atomics
    (cu:1054-1063's atomicAdd is the non-deterministic part we replace).

    ``ids_in_hbm``: hit-list placement (see IDS_SMEM_CAP_BYTES) — False:
    tile ids are scalar-prefetched; True: they live in HBM (row capacity
    T_tiles padded to IDS_ALIGN) and each program DMAs its row into the
    ids_smem scratch first."""
    if ids_in_hbm:
        (count_ref, par_ref, packed_ref, pix_hbm, ids_hbm, out_ref,
         acc_ref, buf_ref, sem_ref, ids_smem, ids_sem) = refs
    else:
        (count_ref, ids_ref, par_ref, packed_ref, pix_hbm, out_ref,
         acc_ref, buf_ref, sem_ref) = refs
    b = pl.program_id(0)
    k = pl.program_id(1)
    cm = dict(CM)  # static column map of the compacted pixel slab

    # grad accumulator is (NO_B, FC) — lane-major like every (TP, FC)
    # colsum below, so the per-tile accumulate is a plain sublane stack
    # with no lanes->sublanes relayout inside the loop
    acc_ref[:, :] = jnp.zeros((NO_B, FC), jnp.float32)

    n = count_ref[b * K + k]
    par = tuple(par_ref[i] for i in range(NPAR))
    gamma = par[P_GAMMA]
    lidx = jax.lax.broadcasted_iota(jnp.int32, (TP, 1), 0)
    lr = lidx // tile_w
    lc = lidx - lr * tile_w

    if ids_in_hbm:
        def tile_id(j):
            return ids_smem[j]
    else:
        def tile_id(j):
            return ids_ref[(b * K + k) * T_tiles + j]

    def start_dma(slot, j):
        tid = tile_id(j)
        # pix columns are SoA [B, 10, P]: the copied (10, TP) slab has an
        # aligned minor dim (a (TP, 10) slab crashes the Mosaic compiler)
        pltpu.make_async_copy(
            pix_hbm.at[b, :, pl.ds(tid * TP, TP)],
            buf_ref.at[slot], sem_ref.at[slot]).start()

    def wait_dma(slot):
        pltpu.make_async_copy(
            pix_hbm.at[b, :, pl.ds(0, TP)],
            buf_ref.at[slot], sem_ref.at[slot]).wait()

    @pl.when(n > 0)
    def _prefetch():
        if ids_in_hbm:
            idcp = pltpu.make_async_copy(
                ids_hbm.at[pl.ds((b * K + k) * T_tiles, T_tiles)],
                ids_smem, ids_sem)
            idcp.start()
            idcp.wait()
        start_dma(0, 0)

    def row(i):
        return packed_ref[0, i, :].reshape(1, FC)

    def rowblk(start, nrows):
        return packed_ref[0, pl.ds(start, nrows), :]

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n)
        def _():
            start_dma(jax.lax.rem(j + 1, 2), j + 1)

        wait_dma(slot)
        t = tile_id(j)
        ty = t // tx_n
        tx = t - ty * tx_n
        prow = ty * tile_h + lr  # band-local; global = prow + par[P_ROW0]
        pcol = tx * tile_w + lc
        xp = (2.0 * pcol.astype(jnp.float32) + 1.0 - is_) / is_
        yp = (2.0 * (is_ - 1 - prow).astype(jnp.float32) + 1.0 - is_) / is_ \
            - 2.0 * par[P_ROW0] / is_

        # one lanes->sublanes transpose per tile load
        pix_t = jnp.transpose(buf_ref[slot, :, :], (1, 0))  # (TP, NPIXC)

        def pcolm(i):
            # pixel-space column i as (TP, 1)
            return pix_t[:, i:i + 1]

        # Beyond the coverage chain the kernel computes: softmax color
        # grads (geometry + texture), or winner-id-masked texture grads for
        # in-kernel hard RGB (hard RGB contributes no geometry gradient,
        # cu:997).  Big-texture hard RGB defers its texture gradient to the
        # winner-id segment-sum (_hard_tex_grad) outside the kernel.
        softmax = (cfg.channels != 'alpha'
                   and cfg.aggr_rgb_func == C.RGB_SOFTMAX)
        hard_ink = (cfg.channels != 'alpha'
                    and cfg.aggr_rgb_func == C.RGB_HARD
                    and _hard_inkernel(cfg, TS))
        need_wcn = softmax or (hard_ink
                               and (cfg.texture_type == C.TEXTURE_VERTEX
                                    or TS > 1))
        q = _pair_math(row, xp, yp, par, cfg, need_wcn=need_wcn,
                       need_depth=softmax or hard_ink)
        frag, valid = q['frag'], q['valid']

        gA = pcolm(cm['ga'])
        if cfg.aggr_alpha_func == C.ALPHA_HARD:
            c_grad_xy = jnp.broadcast_to(gA, frag.shape)
        else:
            c_grad_xy = gA * T.aggregate_backward(
                cfg.aggr_alpha_func, pcolm(cm['fa']), frag, par[P_TCP])
        c_grad_xy = jnp.where(valid, c_grad_xy, 0.0)

        gz = None
        gtex_coef = None
        if hard_ink:
            # texture grad flows only to the pixel's winning face
            # (cu:998-1004): compare each pair's global sorted-space face
            # id against the recorded winner id (a1, exact small int in
            # f32; no-winner pixels carry -1 and never match)
            lane = jax.lax.broadcasted_iota(jnp.int32, (TP, FC), 1)
            gidx = k * FC + lane
            win = q['valid'] & q['zvalid'] \
                & (pcolm(cm['a1']).astype(jnp.int32) == gidx)
            gtex_coef = [jnp.where(win, pcolm(cm['gr'] + c), 0.0)
                         for c in range(3)]
        elif softmax:
            cmask = valid & q['zvalid'] & q['front_ok']
            zp_norm = (par[P_FAR] - q['zp']) / (par[P_FAR] - par[P_NEAR])
            zp_softmax = jnp.where(
                cmask,
                frag * jnp.exp((jnp.where(cmask, zp_norm, NEG_INF)
                                - pcolm(cm['a1'])) / gamma)
                / pcolm(cm['a0']), 0.0)
            care = cmask & (frag > 0.0)
            cols = _colors(row, q, cfg, TS, rowblk=rowblk, care=care)
            c_xyz = (pcolm(cm['gr']) * (cols[0] - pcolm(cm['fr']))
                     + pcolm(cm['gr'] + 1) * (cols[1] - pcolm(cm['fr'] + 1))
                     + pcolm(cm['gr'] + 2)
                     * (cols[2] - pcolm(cm['fr'] + 2))) * zp_softmax
            gtex_coef = [zp_softmax * pcolm(cm['gr'] + c) for c in range(3)]
            c_grad_xy = c_grad_xy + jnp.where(
                cmask, c_xyz / jnp.where(cmask, frag, 1.0), 0.0)
            c_z = c_xyz / gamma / (par[P_NEAR] - par[P_FAR]) \
                * q['zp'] * q['zp']
            # w_clip_j / z_j^2 == wcn_j * iz_j^2 (cu:1027-1029)
            gz = [jnp.where(cmask,
                            c_z * q['wcn'][j] * (row(pack.R_IZ + j) ** 2),
                            0.0)
                  for j in range(3)]

        pdf_v = D.pdf(cfg.dist_func, q['sign'], q['dis'], par[P_SCALE],
                      par[P_SHAPE], par[P_SHIFT], gamma_inv=par[P_GINV])
        c_grad_xy = jnp.where(valid, c_grad_xy * pdf_v, 0.0)

        # closest-point weights tw from the selected edge (tv, ksel)
        tv, ksel = q['tv'], q['ksel']
        tw = []
        for i in range(3):
            # vertex i weight: tv if i == ksel, 1-tv if i == ksel+1 (mod 3),
            # 0 otherwise
            wv = jnp.where(ksel == i, tv,
                           jnp.where(ksel == (i + 2) % 3, 1.0 - tv, 0.0))
            tw.append(wv)

        if cfg.dist_squared:
            coef = 2.0 * q['sign'] * c_grad_xy
        else:
            # |(dis_x, dis_y)| == dis by construction: the selected feature's
            # distance vector is either w_j m_k (|.|^2 = w_j^2 |m_k|^2 = d2u)
            # or w_j m_k + dd e_k with m_k _|_ e_k (|.|^2 = d2u + dd^2 |e|^2
            # = d2c), exactly the quantity dis was drawn from — so the
            # direction normalization reuses the rsqrt that produced dis
            # (cu:1046-1050's normalization without its per-pair divide)
            coef = q['sign'] * c_grad_xy * q['rdis']

        # accumulate per-face grads: reduce over the pixel (sublane) axis
        # (tried: ones-vector MXU matmul instead — no measurable gain,
        # Mosaic's native sublane reduction is already efficient)
        def colsum(x):  # (TP, FC) -> (FC,)
            return jnp.sum(x, axis=0)

        cx = coef * q['dis_x']
        cy = coef * q['dis_y']
        updates = []
        for i in range(3):
            updates += [colsum(cx * tw[i]),  # (FC,)
                        colsum(cy * tw[i])]
        if gz is not None:
            updates += [colsum(gz[i]) for i in range(3)]
        blocked = gtex_coef is not None and _tex_blocked(cfg, TS)
        if gtex_coef is not None and not blocked:
            if cfg.texture_type == C.TEXTURE_VERTEX:
                for j in range(3):
                    for c in range(3):
                        updates.append(colsum(q['wcn'][j] * gtex_coef[c]))
            elif TS == 1:
                for c in range(3):
                    updates.append(colsum(gtex_coef[c]))
            else:
                # route to the sampled texel (backward_sample_texture,
                # cu:197-207)
                ti = _texel_index(q, TS)
                for t in range(TS):
                    m = ti == t
                    for c in range(3):
                        updates.append(colsum(
                            jnp.where(m, gtex_coef[c], 0.0)))
        if not blocked:
            acc_ref[:, :] = acc_ref[:, :] + jnp.stack(updates, axis=0)
            return 0

        # blocked big-TS texture grads: geometry rows 0..8 (padded to an
        # 8-aligned 16-row block), then one dynamic 8-aligned accumulator
        # write of 3*TEXEL_BLOCK rows per texel block (code size O(1) in
        # TS; backward_sample_texture semantics unchanged, cu:197-207)
        zero_row = jnp.zeros((FC,), jnp.float32)
        while len(updates) < 16:
            updates.append(zero_row)
        acc_ref[0:16, :] = acc_ref[0:16, :] + jnp.stack(updates, axis=0)

        ti = _texel_index(q, TS)
        TB = TEXEL_BLOCK
        # pairs outside ``care`` have gtex_coef == 0 (zp_softmax carries the
        # cmask and a frag factor), so the block loop only needs to visit
        # the texel range contributing pairs actually select
        bb0, bb1 = _texel_block_range(ti, care, TS)

        def blk_body(bb, _):
            rows = []
            for u in range(TB):
                m = ti == bb * TB + u
                for c in range(3):
                    rows.append(colsum(jnp.where(m, gtex_coef[c], 0.0)))
            r0 = 16 + 3 * TB * bb
            acc_ref[pl.ds(r0, 3 * TB), :] = \
                acc_ref[pl.ds(r0, 3 * TB), :] + jnp.stack(rows, axis=0)
            return 0

        jax.lax.fori_loop(bb0, bb1, blk_body, 0)
        return 0

    jax.lax.fori_loop(0, n, body, 0)
    out_ref[0, 0, :, :] = acc_ref[:, :]


def backward(face_vertices, textures, finfo, soft_colors, aggrs_info,
             grad_soft_colors, cfg: C.RenderConfig, params: Dict,
             base_offset=0, fvalid=None, row_band=None):
    """Same contract as xla_backend.backward."""
    del finfo
    return backward_from_aux(face_vertices, textures, None, soft_colors,
                             aggrs_info, grad_soft_colors, cfg, params,
                             base_offset, fvalid, row_band)


def backward_from_aux(face_vertices, textures, aux, soft_colors,
                      aggrs_info, grad_soft_colors, cfg: C.RenderConfig,
                      params: Dict, base_offset=0, fvalid=None,
                      row_band=None):
    B, F = face_vertices.shape[:2]
    TS = textures.shape[2]
    if _xla_fallback(cfg, textures):
        return X.backward(face_vertices, textures, None, soft_colors,
                          aggrs_info, grad_soft_colors, cfg, params,
                          base_offset, row_band)

    is_ = cfg.image_size
    row0, hb = row_band if row_band is not None else (0, is_)
    P = is_ * hb
    FC = _align_fc(cfg.face_chunk)
    bwd_allow_compact = (isinstance(base_offset, int) and base_offset == 0
                         and fvalid is None)
    tile_w, tile_h = _pick_tile2d(
        is_, _tile_want(cfg, TS, is_, hb, bwd_allow_compact,
                        -(-F // FC) * FC), hb)
    TP = tile_w * tile_h
    T_tiles = P // TP
    tx_n = is_ // tile_w

    if aux is None:
        aux = _prepass(face_vertices, textures, cfg, params, fvalid,
                       row_band,
                       allow_compact=(isinstance(base_offset, int)
                                      and base_offset == 0
                                      and fvalid is None))
    packed, perm = aux['packed'], aux['perm']
    chunk_counts, chunk_ids = aux['chunk_counts'], aux['chunk_ids']
    Fp = packed.shape[2]
    NI = packed.shape[1]
    K = Fp // FC
    iperm = aux['iperm']  # orig face id -> sorted position
    par = _params_vec(params, row0, cfg)

    # pixel-space tensor: only the columns this config's kernel reads (see
    # _bwd_pix_layout), kept channel-major end to end — the image tensors
    # arrive [B, C, H, W] and the kernel DMAs (C, TP) slabs, so no
    # AoS<->SoA transpose ever materializes.  aggrs winner ids are in
    # Morton-sorted space + base_offset; shift them back to this shard's
    # local sorted space so the in-kernel winner comparison stays
    # offset-free.
    g = grad_soft_colors.reshape(B, 4, P)
    fin = soft_colors.reshape(B, 4, P)
    ag = aggrs_info.reshape(B, 2, P)
    if cfg.aggr_rgb_func == C.RGB_HARD and base_offset is not None:
        # winner ids are exact small ints in float32; non-winner pixels just
        # shift to another out-of-range id
        ag = jnp.concatenate(
            [ag[:, :1], ag[:, 1:] - jnp.float32(base_offset)], axis=1)
    n_cols, NPIXC, cm = _bwd_pix_layout(cfg, TS)
    if cfg.channels == 'alpha' or (cfg.aggr_rgb_func == C.RGB_HARD
                                   and not _hard_inkernel(cfg, TS)):
        pix_cols = jnp.concatenate([g[:, 3:4], fin[:, 3:4]], axis=1)
    elif cfg.aggr_rgb_func == C.RGB_HARD:
        # [gr(3), ga, fa, a1] — the winner id routes in-kernel tex grads
        pix_cols = jnp.concatenate([g, fin[:, 3:4], ag[:, 1:2]], axis=1)
    else:
        pix_cols = jnp.concatenate([g, fin, ag], axis=1)
    pix_cols = pack.tile_soa(pix_cols, is_, tile_w, tile_h, hb)
    # sublane dim of the DMA'd slab must be a multiple of 8
    pix_cols = jnp.pad(pix_cols, ((0, 0), (0, NPIXC - n_cols), (0, 0)))

    NO_B, has_z, has_tex, tex0 = _bwd_col_layout(cfg, TS)
    ids_in_hbm = B * K * T_tiles * 4 > IDS_SMEM_CAP_BYTES
    Tc = -(-T_tiles // IDS_ALIGN) * IDS_ALIGN if ids_in_hbm else T_tiles
    kernel = functools.partial(_bwd_kernel, cfg=cfg, TP=TP, FC=FC, is_=is_,
                               T_tiles=Tc, K=K, NO_B=NO_B,
                               tile_w=tile_w, tile_h=tile_h, tx_n=tx_n,
                               TS=TS, CM=tuple(sorted(cm.items())),
                               ids_in_hbm=ids_in_hbm)
    in_specs = [
        pl.BlockSpec((1, NI, FC), lambda b, k, *_: (b, 0, k)),
        pl.BlockSpec(memory_space=pl.ANY),  # pix cols stay in HBM
    ]
    out_spec = pl.BlockSpec((1, 1, NO_B, FC), lambda b, k, *_: (b, k, 0, 0))
    scratch = [
        pltpu.VMEM((NO_B, FC), jnp.float32),
        pltpu.VMEM((2, NPIXC, TP), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if ids_in_hbm:
        ids_flat = jnp.pad(chunk_ids, ((0, 0), (0, 0), (0, Tc - T_tiles))
                           ).reshape(-1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, K),
            in_specs=in_specs + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=scratch + [pltpu.SMEM((Tc,), jnp.int32),
                                      pltpu.SemaphoreType.DMA],
        )
        args = (chunk_counts.reshape(-1), par, packed, pix_cols, ids_flat)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, K),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        args = (chunk_counts.reshape(-1), chunk_ids.reshape(-1), par,
                packed, pix_cols)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, NO_B, FC), jnp.float32),
        interpret=_interpret(),
    )(*args)

    # one XLA relayout for the whole tensor (the kernel keeps grads
    # lane-major; transposing per tile iteration inside the loop costs more)
    out = out.transpose(0, 1, 3, 2).reshape(B, Fp, NO_B)
    Fp_o = perm.shape[1]
    if Fp > Fp_o:  # compacted: fold the appended per-tile slot gradients
        # back onto their source faces (deterministic octet segment-sum)
        out = out[:, :Fp_o] + pack.scatter_slots(
            out[:, Fp_o:], aux['oct_ids'], Fp_o // pack.OCT)
    # un-permute: grad for original face j sits at sorted position iperm[j]
    out = jnp.take_along_axis(out, iperm[..., None], axis=1)[:, :F]
    # re-inflate the suppressed all-zero columns (see _bwd_col_layout):
    # [x0 y0 x1 y1 x2 y2] (+ [z0 z1 z2]) (+ tex) -> [B, F, 9] + tex grads
    gxy = out[..., :6].reshape(B, F, 3, 2)
    if has_z:
        gzv = out[..., 6:9, None]  # [B, F, 3(vertex), 1]
    else:
        gzv = jnp.zeros((B, F, 3, 1), jnp.float32)
    grad_faces = jnp.concatenate([gxy, gzv], axis=-1).reshape(B, F, 9)
    if has_tex:  # softmax RGB: in-kernel texture grads (start at tex0)
        if cfg.texture_type == C.TEXTURE_VERTEX:
            grad_tex = out[..., tex0:tex0 + 9].reshape(B, F, 3, 3)
        else:
            grad_tex = out[..., tex0:tex0 + 3 * TS].reshape(B, F, TS, 3)
    elif cfg.channels != 'alpha':  # hard RGB: deferred winner segment-sum
        gt_sorted = _hard_tex_grad(packed, ag[:, 1], g[:, :3], cfg, TS, is_,
                                   hb, row0)
        gt_sorted = gt_sorted.reshape(B, Fp, -1)
        if Fp > Fp_o:  # compacted: fold slot texture grads onto faces
            gt_sorted = gt_sorted[:, :Fp_o] + pack.scatter_slots(
                gt_sorted[:, Fp_o:], aux['oct_ids'], Fp_o // pack.OCT)
        grad_tex = jnp.take_along_axis(
            gt_sorted, iperm[..., None], axis=1)[:, :F] \
            .reshape((B, F) + textures.shape[2:])
    else:
        grad_tex = jnp.zeros(textures.shape, jnp.float32)
    return grad_faces, grad_tex
