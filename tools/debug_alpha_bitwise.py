"""Map which distributions produce bitwise-identical alpha across backends.

For each distribution (max t-conorm, hard RGB), renders with both backends
and counts bitwise-differing alpha pixels + grad agreement.  The max
t-conorm's alpha IS the winning face's frag, so this directly fingerprints
which CDF chains diverge between Mosaic and XLA on the chip.
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

from tpu_selfcheck import scene, DIST_PARAMS, ALL_DISTS  # noqa: E402
from gendr_tpu.raster.render import render  # noqa: E402


def main(dists):
    fv, tex = scene(B=1, level=2)
    for dist in dists:
        kw = dict(image_size=64, dist_func=dist, aggr_alpha_func='max',
                  aggr_alpha_t_conorm_p=0.0, aggr_rgb_func='hard',
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
        ax, ap = ix[:, 3], ip[:, 3]
        dm = ax.view(np.uint32) != ap.view(np.uint32)
        nbit = int(dm.sum())
        ulp = np.abs(ax.view(np.int32).astype(np.int64)
                     - ap.view(np.int32).astype(np.int64))
        gclose = np.isclose(gx, gp, atol=5e-4, rtol=5e-3).mean()
        extra = ''
        if nbit:
            vals = ax[dm]
            extra = (f'  max_ulp={ulp.max()}  val_range='
                     f'[{vals.min():.4f},{vals.max():.4f}]')
        print(f'{dist:<20s} alpha_bitdiff={nbit:>5d}/4096 '
              f'grad_agree={gclose:.4f}{extra}', flush=True)


if __name__ == '__main__':
    names = [a for a in sys.argv[1:] if not a.startswith('-')] or ALL_DISTS
    main(names)
