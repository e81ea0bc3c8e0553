"""Diagnose the 4 historically-failing hardware matrix configs.

Runs the failing (dist x tcn) configs from the full-matrix selfcheck and
dumps, beyond the standard img_err/grad_agree numbers, the structure of the
disagreement: where the gradients differ, whether the forward alpha is
bitwise equal, and (for max) the winner-gradient pattern.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache_dir = os.environ.get('GENDR_TPU_COMPILE_CACHE',
                            '/tmp/gendr_tpu_jax_cache')
if _cache_dir:
    try:
        jax.config.update('jax_compilation_cache_dir', _cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception:
        pass

import jax.numpy as jnp

from tpu_selfcheck import scene, DIST_PARAMS  # noqa: E402
from gendr_tpu.raster.render import render  # noqa: E402

FAILING = [
    ('cubic_hermite', 'frank', 2.0),
    ('wigner_semicircle', 'frank', 2.0),
    ('reciprocal', 'max', 0.0),
    ('gamma_rev', 'max', 0.0),
]


def main():
    fv, tex = scene(B=1, level=2)
    for dist, tcn, p in FAILING:
        kw = dict(image_size=64, dist_func=dist, aggr_alpha_func=tcn,
                  aggr_alpha_t_conorm_p=p, aggr_rgb_func='hard',
                  dist_scale=5e-2, **DIST_PARAMS.get(dist, {}))

        def loss(v, t, backend):
            img = render(v, t, backend=backend, **kw)
            return jnp.sum(img[:, 3] ** 2) * 0.5 + jnp.sum(img[:, :3]) * 0.1

        def run(backend):
            @jax.jit
            def both(a_, b_):
                img = render(a_, b_, backend=backend, **kw)
                g = jax.grad(lambda x_, y_: loss(x_, y_, backend),
                             argnums=0)(a_, b_)
                return img, g
            img, g = both(fv, tex)
            return np.asarray(img), np.asarray(g)

        ix, gx = run('xla')
        ip, gp = run('pallas')
        img_err = np.abs(ix - ip).max()
        # bitwise alpha comparison
        ax, ap = ix[:, 3], ip[:, 3]
        nbit = int((ax.view(np.uint32) != ap.view(np.uint32)).sum())
        gclose = np.isclose(gx, gp, atol=5e-4, rtol=5e-3)
        bad = ~gclose
        print(f'=== {dist} x {tcn} (p={p}) ===')
        print(f'  img_err={img_err:.3e}  alpha bitwise-diff px: {nbit}/{ax.size}')
        print(f'  grad_agree={gclose.mean():.4f}  n_bad={bad.sum()}/{gx.size}')
        if bad.any():
            bi = np.argwhere(bad)
            print(f'  bad entries (first 12): ')
            for idx in bi[:12]:
                t = tuple(idx)
                print(f'    {t}: xla={gx[t]:+.6e} pallas={gp[t]:+.6e}')
            # magnitude structure of the disagreement
            dx = np.abs(gx[bad])
            dp = np.abs(gp[bad])
            print(f'  |xla| at bad: med={np.median(dx):.2e} max={dx.max():.2e}')
            print(f'  |pallas| at bad: med={np.median(dp):.2e} max={dp.max():.2e}')
            nz_x = (np.abs(gx[bad]) < 1e-12).sum()
            nz_p = (np.abs(gp[bad]) < 1e-12).sum()
            print(f'  zero-on-one-side: xla-zero={nz_x} pallas-zero={nz_p}')
        print(flush=True)


if __name__ == '__main__':
    main()
