"""On-device Pallas vs XLA backend validation.

CPU tests run the Pallas kernels in interpret mode; this script runs the
*compiled* Mosaic kernels on the real chip and cross-checks forward outputs
and gradients against the XLA backend for a spread of configs.

    python tools/tpu_selfcheck.py              # config spread + path pins
    python tools/tpu_selfcheck.py --matrix    # full 18-dist x 10-t-conorm
                                               # zoo as compiled Mosaic

The --matrix mode compiles every branch of the reference kernel's function
zoo (distribution ids cu:217-239, t-conorm ids cu:462-470) on the real
chip — 180 configs, forward + gradient agreement vs the XLA backend, one
seed at 64^2.  The same matrix runs in interpret mode on CPU in
tests/test_pallas.py's exhaustive tier; this pins the compiled Mosaic
lowering of each branch.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

# Persistent compilation cache: --matrix compiles 360 programs through the
# tunnel; caching makes a re-run at the same commit (e.g. the end-of-round
# evidence run after a trial run) near-free.  Harmless no-op if the backend
# rejects it.  Override the location with GENDR_TPU_COMPILE_CACHE=; set it
# empty to disable.
_cache_dir = os.environ.get('GENDR_TPU_COMPILE_CACHE',
                            '/tmp/gendr_tpu_jax_cache')
if _cache_dir:
    try:
        jax.config.update('jax_compilation_cache_dir', _cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception:
        pass

import jax.numpy as jnp

from gendr_tpu import data
from gendr_tpu.geometry import core, transforms as T
from gendr_tpu.raster.render import render


def scene(B=2, level=2, seed=0):
    rng = np.random.RandomState(seed)
    v, f = data.icosphere(level)
    verts = jnp.asarray(v)[None] * 0.8 + jnp.asarray(
        rng.randn(B, 1, 3) * 0.1, jnp.float32)
    eyes = T.get_points_from_angles(
        jnp.full((B,), 2.732), jnp.asarray(rng.rand(B) * 60, jnp.float32),
        jnp.asarray(rng.rand(B) * 360, jnp.float32))
    verts = T.perspective(T.look_at(verts, eyes), 30.0)
    fv = core.face_vertices(verts, jnp.tile(jnp.asarray(f)[None],
                                            (B, 1, 1)))
    fv = fv.reshape(B, -1, 9)
    tex = jnp.asarray(rng.rand(B, fv.shape[1], 1, 3), jnp.float32)
    return fv, tex


CONFIGS = [
    dict(dist_func='uniform', aggr_alpha_func='probabilistic',
         aggr_rgb_func='hard', dist_scale=1e-2),
    dict(dist_func='logistic', aggr_alpha_func='probabilistic',
         aggr_rgb_func='softmax', dist_scale=3e-3),
    dict(dist_func='gaussian', aggr_alpha_func='einstein',
         aggr_rgb_func='hard', dist_scale=1e-2, dist_squared=True),
    dict(dist_func='hard', aggr_alpha_func='hard', aggr_rgb_func='hard',
         dist_scale=1e-4),
    dict(dist_func='cauchy', aggr_alpha_func='yager',
         aggr_alpha_t_conorm_p=2.0, aggr_rgb_func='softmax',
         dist_scale=1e-3),
    dict(dist_func='gamma', dist_shape=2.0, aggr_alpha_func='probabilistic',
         aggr_rgb_func='hard', dist_scale=1e-2),
    dict(dist_func='uniform', aggr_alpha_func='probabilistic',
         aggr_rgb_func='softmax', dist_scale=1e-2, _ts=4),
    dict(dist_func='uniform', aggr_alpha_func='probabilistic',
         aggr_rgb_func='softmax', dist_scale=1e-2, _vertex=True),
    # exotic-distribution samples (full matrix runs on CPU in
    # tests/test_pallas.py; these pin the compiled Mosaic paths)
    dict(dist_func='wigner_semicircle', aggr_alpha_func='yager',
         aggr_alpha_t_conorm_p=2.0, aggr_rgb_func='hard', dist_scale=1e-2),
    dict(dist_func='gudermannian', aggr_alpha_func='hamacher',
         aggr_alpha_t_conorm_p=0.5, aggr_rgb_func='softmax',
         dist_scale=3e-3),
    dict(dist_func='exponential_rev', aggr_alpha_func='probabilistic',
         aggr_rgb_func='hard', dist_scale=1e-2, dist_shift=0.05),
    dict(dist_func='levy', aggr_alpha_func='probabilistic',
         aggr_rgb_func='softmax', dist_scale=1e-4, dist_shift=0.1),
    dict(dist_func='gamma', dist_shape=0.5, aggr_alpha_func='einstein',
         aggr_rgb_func='softmax', dist_scale=1e-2),
    # big surface texture on hard RGB: the deferred winner-id sampling +
    # segment-sum texture-grad epilogues (no in-kernel texel cap)
    dict(dist_func='uniform', aggr_alpha_func='probabilistic',
         aggr_rgb_func='hard', dist_scale=1e-2, _ts=49),
    # big surface texture on softmax RGB: the blocked texel-streaming
    # path (fori_loop over TEXEL_BLOCK slices; dynamic 8-aligned
    # accumulator writes in the backward) — previously an XLA fallback
    dict(dist_func='logistic', aggr_alpha_func='probabilistic',
         aggr_rgb_func='softmax', dist_scale=3e-3, _ts=49),
    # max t-conorm: winner detection by exact float equality (cu:574-575)
    # — the shared pair math (raster/pairmath.py) makes both backends'
    # coverages bitwise-equal on hardware, so this must agree exactly
    dict(dist_func='logistic', aggr_alpha_func='max', aggr_rgb_func='hard',
         dist_scale=3e-3),
    # The four historically-failing matrix configs (r4 verdict), pinned in
    # the DEFAULT selfcheck so a regression in any of them fails the
    # standard gate, not just the full 36-minute matrix.  Root causes and
    # fixes (r5): reciprocal's multi-divide CDF chain and gamma's Kummer
    # series compiled to different roundings under Mosaic vs XLA until the
    # params optimization_barrier + single-divide reciprocal (frag skew
    # flipped exact-equality max winners); frank x compact-support
    # amplified fold-tree rounding differences at CDF saturation until the
    # XLA chunk reduce mirrored the kernel butterfly with exact-zero
    # identities (ops/tconorms._zero_identity).
    dict(dist_func='cubic_hermite', aggr_alpha_func='frank',
         aggr_alpha_t_conorm_p=2.0, aggr_rgb_func='hard', dist_scale=5e-2),
    dict(dist_func='wigner_semicircle', aggr_alpha_func='frank',
         aggr_alpha_t_conorm_p=2.0, aggr_rgb_func='hard', dist_scale=5e-2),
    dict(dist_func='reciprocal', aggr_alpha_func='max',
         aggr_rgb_func='hard', dist_scale=5e-2),
    dict(dist_func='gamma_rev', dist_shape=2.0, aggr_alpha_func='max',
         aggr_rgb_func='hard', dist_scale=5e-2),
]


def _report(name, ok, detail):
    print(f'[{"OK  " if ok else "FAIL"}] {name}: {detail}', flush=True)
    return 0 if ok else 1


def band_and_offset_checks():
    """Hardware-pin the sharded path's per-shard semantics on ONE chip.

    (a) Row bands (sp axis): forward_partial(row_band=(r0, h)) must be
        BITWISE equal to the same rows of a full render — same faces, same
        Morton order, same per-pixel fold order, global NDC coords; the
        only difference is which tiles run.  Checked for hard RGB
        (in-kernel TS=1 and deferred TS=49 epilogues) and softmax RGB.
    (b) Band backward: per-band gradients (each band fed its row slice of
        the cotangent) summed over bands must match the full backward to
        fp tolerance (the pixel-reduction grouping differs, so not
        bitwise).
    (c) fp base_offset: two half-face shards merged via merge_carries with
        base_offset winner ids must reproduce the full render to fp
        tolerance (per-half Morton fold order differs from the full sort).
    """
    from gendr_tpu import config as C
    from gendr_tpu.raster import pallas_backend as PB
    from gendr_tpu.raster import xla_backend as X

    failures = 0
    rng = np.random.RandomState(7)
    v, f = data.icosphere(3)  # 1280 faces = 10 chunks of 128 on hardware
    B = 1
    verts = jnp.asarray(v)[None] * 0.8
    eyes = T.get_points_from_angles(jnp.full((B,), 2.732),
                                    jnp.full((B,), 20.0),
                                    jnp.full((B,), 30.0))
    verts = T.perspective(T.look_at(verts, eyes), 30.0)
    fv = core.face_vertices(verts, jnp.asarray(f)[None]).reshape(B, -1, 9)
    F = fv.shape[1]
    is_, hb = 256, 128
    Ppix = is_ * is_
    bg = np.array([0.15, 0.25, 0.1], np.float32)

    specs = [
        ('hard TS=1', dict(aggr_rgb_func='hard'), 1),
        ('hard TS=49 (deferred epilogues)', dict(aggr_rgb_func='hard'), 49),
        ('softmax', dict(aggr_rgb_func='softmax'), 1),
    ]
    for name, spec, ts in specs:
        tex = jnp.asarray(rng.rand(B, F, ts, 3), jnp.float32)
        cfg = C.RenderConfig.create(image_size=is_, dist_func='logistic',
                                    aggr_alpha_func='probabilistic',
                                    backend='pallas', **spec)
        params = dict(dist_scale=3e-3, dist_shape=0.0, dist_shift=0.0,
                      dist_eps=1e4, aggr_alpha_t_conorm_p=0.0,
                      aggr_rgb_eps=1e-3, aggr_rgb_gamma=1e-3,
                      near=1.0, far=100.0, background_color=bg)

        def finalize_with_bg(carries, P_loc, bg_rows):
            merged = X.background_carry(B, P_loc, bg_rows, cfg, params)
            for c in carries:
                merged = X.merge_carries(merged, c, cfg, params)
            return X.finalize(merged, cfg)

        bg_full = jnp.broadcast_to(bg.reshape(1, 1, 3), (B, Ppix, 3))

        @jax.jit
        def run_full(fv, tex):
            carry, _ = PB.forward_partial(fv, tex, cfg, params)
            return finalize_with_bg([carry], Ppix, bg_full)

        @jax.jit
        def run_bands(fv, tex):
            softs = []
            for r0 in (0, hb):
                carry, _ = PB.forward_partial(fv, tex, cfg, params,
                                              row_band=(r0, hb))
                soft, _ = finalize_with_bg([carry], is_ * hb,
                                           bg_full[:, :is_ * hb])
                softs.append(soft)
            return jnp.concatenate(softs, axis=2)

        full_soft, full_aggr = jax.block_until_ready(run_full(fv, tex))
        band_soft = jax.block_until_ready(run_bands(fv, tex))
        nbit = int((np.asarray(full_soft) != np.asarray(band_soft)).sum())
        failures += _report(
            f'row-band forward [{name}]', nbit == 0,
            f'{nbit} / {full_soft.size} values differ (bitwise demand)')

        # (b) band backward vs full backward
        g = jnp.asarray(rng.rand(*full_soft.shape), jnp.float32)

        @jax.jit
        def bwd_full(fv, tex, g):
            return PB.backward(fv, tex, None, full_soft, full_aggr, g,
                               cfg, params)

        @jax.jit
        def bwd_bands(fv, tex, g):
            acc = None
            for r0 in (0, hb):
                sl = slice(r0, r0 + hb)
                carry, _ = PB.forward_partial(fv, tex, cfg, params,
                                              row_band=(r0, hb))
                soft, aggr = finalize_with_bg([carry], is_ * hb,
                                              bg_full[:, :is_ * hb])
                gf, gt = PB.backward(fv, tex, None, soft, aggr,
                                     g[:, :, sl], cfg, params,
                                     row_band=(r0, hb))
                acc = (gf, gt) if acc is None else (acc[0] + gf,
                                                    acc[1] + gt)
            return acc

        gf_f, gt_f = jax.block_until_ready(bwd_full(fv, tex, g))
        gf_b, gt_b = jax.block_until_ready(bwd_bands(fv, tex, g))
        fa = np.isclose(np.asarray(gf_f), np.asarray(gf_b),
                        atol=1e-5, rtol=1e-4).mean()
        ta = np.isclose(np.asarray(gt_f), np.asarray(gt_b),
                        atol=1e-5, rtol=1e-4).mean()
        failures += _report(
            f'row-band backward [{name}]', fa > 0.9999 and ta > 0.9999,
            f'grad_agree={fa:.5f} texgrad_agree={ta:.5f}')

        # (c) fp split with base_offset winner ids
        half = F // 2

        @jax.jit
        def run_split(fv, tex):
            ca, _ = PB.forward_partial(fv[:, :half], tex[:, :half], cfg,
                                       params, base_offset=0)
            cb, _ = PB.forward_partial(fv[:, half:], tex[:, half:], cfg,
                                       params, base_offset=half)
            return finalize_with_bg([ca, cb], Ppix, bg_full)

        split_soft, _ = jax.block_until_ready(run_split(fv, tex))
        agree = np.isclose(np.asarray(full_soft), np.asarray(split_soft),
                           atol=2e-3, rtol=1e-3).mean()
        err = np.abs(np.asarray(full_soft) - np.asarray(split_soft))
        failures += _report(
            f'fp base_offset split [{name}]', agree > 0.999,
            f'agree={agree:.5f} max_err={err.max():.2e}')
    return failures


ALL_DISTS = ['hard', 'uniform', 'cubic_hermite', 'wigner_semicircle',
             'gaussian', 'laplace', 'logistic', 'gudermannian', 'cauchy',
             'reciprocal', 'gumbel_max', 'gumbel_min', 'exponential',
             'exponential_rev', 'gamma', 'gamma_rev', 'levy', 'levy_rev']

# the 9 reference t-conorms (ids cu:462-470) + the hard threshold, with a
# valid parameter where the family needs one (hamacher p>=0, frank p>0 !=1,
# yager/aczel_alsina/dombi p>0, schweizer_sklar p<0)
ALL_TCONORMS = [('hard', 0.0), ('max', 0.0), ('probabilistic', 0.0),
                ('einstein', 0.0), ('hamacher', 0.5), ('frank', 2.0),
                ('yager', 2.0), ('aczel_alsina', 1.5), ('dombi', 1.0),
                ('schweizer_sklar', -2.0)]

# per-distribution continuous params (gamma needs a shape; asymmetric dists
# exercised with a nonzero shift, cu:302-307) — mirrors the CPU matrix in
# tests/test_pallas.py
DIST_PARAMS = {
    'gamma': dict(dist_shape=2.0),
    'gamma_rev': dict(dist_shape=2.0),
    'levy': dict(dist_shift=0.1),
    'levy_rev': dict(dist_shift=0.1),
    'exponential': dict(dist_shift=0.05),
    'gumbel_max': dict(dist_shift=0.05),
}


def matrix_check():
    """Full function-zoo matrix as compiled Mosaic on the chip: 18 dists x
    10 alpha t-conorms, fwd + grad agreement vs the XLA backend (hard RGB
    so the gradient chain runs CDF-PDF x aggregate-inverse throughout)."""
    fv, tex = scene(B=1, level=2)
    failures = total = 0
    for dist in ALL_DISTS:
        for tcn, p in ALL_TCONORMS:
            total += 1
            kw = dict(image_size=64, dist_func=dist, aggr_alpha_func=tcn,
                      aggr_alpha_t_conorm_p=p, aggr_rgb_func='hard',
                      dist_scale=5e-2, **DIST_PARAMS.get(dist, {}))

            def loss(v, t, backend):
                img = render(v, t, backend=backend, **kw)
                return jnp.sum(img[:, 3] ** 2) * 0.5 \
                    + jnp.sum(img[:, :3]) * 0.1

            def run(backend, tries=3):
                # one fused jit per backend (img + grad) — halves the
                # compile count of the 180-config sweep vs two programs
                @jax.jit
                def both(a_, b_):
                    img = render(a_, b_, backend=backend, **kw)
                    g = jax.grad(lambda x_, y_: loss(x_, y_, backend),
                                 argnums=0)(a_, b_)
                    return img, g

                for a in range(tries):
                    try:
                        img, g = both(fv, tex)
                        return np.asarray(img), np.asarray(g)
                    except Exception as e:
                        if a == tries - 1:
                            raise
                        print(f'  retry {backend} after {type(e).__name__}',
                              flush=True)

            ix, gx = run('xla')
            ip, gp = run('pallas')
            img_err = np.abs(ix - ip).max()
            gclose = np.isclose(gx, gp, atol=5e-4, rtol=5e-3).mean()
            # winner-aware diagnostics (r4 verdict demand #7): the alpha
            # channel separates "coverage/frag skew" (which flips the max
            # t-conorm's exact-equality winner and frank's saturation
            # conditioning) from "wrong gradient arithmetic" — a FAIL with
            # alpha bitwise-equal is a backward bug; a FAIL with alpha
            # bit-diffs is a forward coverage divergence.
            nbit = int((ix[:, 3].view(np.uint32)
                        != ip[:, 3].view(np.uint32)).sum())
            ok = bool(img_err < 2e-3 and gclose > 0.99)
            failures += 0 if ok else 1
            diag = f' alpha_bitdiff={nbit}'
            if not ok:
                diag += (' [forward frag/fold divergence]' if nbit
                         else ' [backward-only divergence]')
            print(f'[{"OK  " if ok else "FAIL"}] {dist} x {tcn}'
                  f'{f"(p={p})" if p else ""}: img_err={img_err:.2e} '
                  f'grad_agree={gclose:.4f}{diag}', flush=True)
    print(f'matrix: {total - failures}/{total} configs green',
          flush=True)
    print('selfcheck:', 'PASS' if failures == 0 else f'{failures} FAILURES')
    return failures


def main():
    fv, tex1 = scene()
    failures = 0
    rng = np.random.RandomState(42)
    for i, spec in enumerate(CONFIGS):
        spec = dict(spec)
        ts = spec.pop('_ts', 1)
        vertex = spec.pop('_vertex', False)
        if vertex:
            tex = jnp.asarray(rng.rand(*tex1.shape[:2], 3, 3), jnp.float32)
            kw = dict(image_size=64, texture_type='vertex', **spec)
        else:
            tex = tex1 if ts == 1 else jnp.asarray(
                rng.rand(*tex1.shape[:2], ts, 3), jnp.float32)
            kw = dict(image_size=64, **spec)

        def loss(v, t, backend):
            img = render(v, t, backend=backend, **kw)
            return jnp.sum(img[:, 3] ** 2) * 0.5 + jnp.sum(img[:, :3]) * 0.1

        def run(backend):
            img = jax.jit(lambda a, b: render(
                a, b, backend=backend, **kw))(fv, tex)
            g = jax.jit(jax.grad(
                lambda a, b: loss(a, b, backend), argnums=(0, 1)))(fv, tex)
            return (np.asarray(img), np.asarray(g[0]), np.asarray(g[1]))

        def run_retry(backend, tries=3):
            # the tunneled compile service occasionally 500s; retry
            for a in range(tries):
                try:
                    return run(backend)
                except Exception as e:
                    if a == tries - 1:
                        raise
                    print(f'  retry {backend} after {type(e).__name__}',
                          flush=True)

        ix, gx, tx = run_retry('xla')
        ip, gp, tp_ = run_retry('pallas')
        img_err = np.abs(ix - ip).max()
        # tiny coverage (fp-ulp) flips can shift a few gradient entries;
        # demand bulk agreement + small median error
        gclose = np.isclose(gx, gp, atol=5e-4, rtol=5e-3).mean()
        tclose = np.isclose(tx, tp_, atol=5e-4, rtol=5e-3).mean()
        ok = img_err < 2e-3 and gclose > 0.99 and tclose > 0.99
        status = 'OK  ' if ok else 'FAIL'
        print(f'[{status}] {spec}: img_err={img_err:.2e} '
              f'grad_agree={gclose:.4f} texgrad_agree={tclose:.4f}',
              flush=True)
        failures += 0 if ok else 1

    failures += band_and_offset_checks()

    # HBM hit-list path pin: at 512^2 x 20480 faces the per-(tile, chunk)
    # hit table exceeds IDS_SMEM_CAP_BYTES, so both kernels must route ids
    # via HBM + per-program SMEM DMA (the SMEM-prefetch table would not
    # even compile); forward and gradients must still match the XLA
    # backend.  This is the one selfcheck config big enough to take that
    # branch on hardware.
    vb5, fb5 = data.icosphere(5)
    verts5 = jnp.asarray(vb5)[None] * 0.8
    eyes5 = T.get_points_from_angles(jnp.full((1,), 2.732),
                                     jnp.full((1,), 20.0),
                                     jnp.full((1,), 30.0))
    verts5 = T.perspective(T.look_at(verts5, eyes5), 30.0)
    fv5 = core.face_vertices(verts5, jnp.asarray(fb5)[None]).reshape(1, -1, 9)
    tex5 = jnp.asarray(np.random.RandomState(11).rand(
        1, fv5.shape[1], 1, 3), jnp.float32)
    kw5 = dict(image_size=512, dist_func='logistic',
               aggr_alpha_func='probabilistic', aggr_rgb_func='hard',
               dist_scale=3e-3)

    def loss5(v, t, backend):
        img = render(v, t, backend=backend, **kw5)
        return jnp.sum(img[:, 3] ** 2) * 0.5 + jnp.sum(img[:, :3]) * 0.1

    def run5(backend, tries=3):
        for a in range(tries):
            try:
                img = jax.jit(lambda a_, b_: render(
                    a_, b_, backend=backend, **kw5))(fv5, tex5)
                g = jax.jit(jax.grad(
                    lambda a_, b_: loss5(a_, b_, backend),
                    argnums=0))(fv5, tex5)
                return np.asarray(img), np.asarray(g)
            except Exception as e:
                if a == tries - 1:
                    raise
                print(f'  retry {backend} after {type(e).__name__}',
                      flush=True)

    ix5, gx5 = run5('xla')
    ip5, gp5 = run5('pallas')
    img_err5 = np.abs(ix5 - ip5).max()
    gclose5 = np.isclose(gx5, gp5, atol=5e-4, rtol=5e-3).mean()
    ok5 = bool(img_err5 < 2e-3 and gclose5 > 0.99)
    print(f'[{"OK  " if ok5 else "FAIL"}] HBM hit-list 512^2 x 20480f: '
          f'img_err={img_err5:.2e} grad_agree={gclose5:.4f}', flush=True)
    failures += 0 if ok5 else 1

    # Constant-folding regression (the remote-TPU compile service has been
    # observed to mis-execute folded cross-product chains): a look_at with
    # closure-captured eyes must equal the same call with eyes as a jit arg.
    v0, f0 = data.icosphere(2)
    vb = jnp.asarray(v0)[None].repeat(24, 0)
    eyes = T.get_points_from_angles(
        jnp.full((24,), 2.732), jnp.zeros(24),
        jnp.asarray(-np.arange(24) * 15.0, jnp.float32))
    eyes = jnp.asarray(np.asarray(eyes))
    ref = np.asarray(jax.jit(lambda v, e: T.perspective(
        T.look_at(v, e), 15.0))(vb, eyes))
    got = np.asarray(jax.jit(lambda v: T.perspective(
        T.look_at(v, eyes), 15.0))(vb))
    cf_err = np.abs(ref - got).max()
    cf_ok = cf_err < 1e-4
    print(f'[{"OK  " if cf_ok else "FAIL"}] closure-constant look_at: '
          f'max_err={cf_err:.2e}', flush=True)
    failures += 0 if cf_ok else 1

    print('selfcheck:', 'PASS' if failures == 0 else f'{failures} FAILURES')
    return failures


if __name__ == '__main__':
    if '--matrix' in sys.argv[1:]:
        sys.exit(matrix_check())
    sys.exit(main())
