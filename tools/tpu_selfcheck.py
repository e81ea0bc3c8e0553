"""On-device Pallas vs XLA backend validation.

CPU tests run the Pallas kernels in interpret mode; this script runs the
*compiled* Mosaic kernels on the real chip and cross-checks forward outputs
and gradients against the XLA backend for a spread of configs.

    python tools/tpu_selfcheck.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
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
    # max t-conorm: winner detection by exact float equality (cu:574-575)
    # — the shared pair math (raster/pairmath.py) makes both backends'
    # coverages bitwise-equal on hardware, so this must agree exactly
    dict(dist_func='logistic', aggr_alpha_func='max', aggr_rgb_func='hard',
         dist_scale=3e-3),
]


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
    sys.exit(main())
