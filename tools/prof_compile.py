"""Phase-timing for the cold-start cost of the headline bench config.

Splits cold time into: Python trace+lower, XLA/Mosaic compile, first
execution — for (a) one fwd+bwd step, (b) the bench's lax.scan wrapper —
so a compile-time regression can be attributed to a specific phase
instead of a single 'compile+first-run' wall number.

Usage: python tools/prof_compile.py [--iters 150] [--scan] [--backend pallas]
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=150)
    ap.add_argument('--image-size', type=int, default=256)
    ap.add_argument('--backend', default='pallas')
    ap.add_argument('--scan', action='store_true',
                    help='also time the scan-of-N wrapper like bench.py')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gendr_tpu import data
    from gendr_tpu.geometry import core
    from gendr_tpu.geometry import transforms as T
    from gendr_tpu.raster.render import render

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    v, f = data.icosphere(3)
    B, is_ = 1, args.image_size
    verts = jnp.asarray(v)[None] * 0.9
    eye = T.get_points_from_angles(2.732, 30.0, 45.0)
    verts = T.perspective(T.look_at(verts, eye), 30.0)
    fv = core.face_vertices(verts, jnp.asarray(f)[None]).reshape(B, -1, 9)
    F = fv.shape[1]
    tex = jnp.ones((B, F, 1, 3), jnp.float32)

    kw = dict(image_size=is_, dist_func='uniform', dist_scale=1e-2,
              aggr_alpha_func='probabilistic', aggr_rgb_func='hard',
              backend=args.backend)

    def loss(fv_, tex_):
        img = render(fv_, tex_, **kw)
        return jnp.sum(img[:, 3] ** 2) + jnp.sum(img[:, :3])

    grad_fn = jax.grad(loss, argnums=(0, 1))

    def phase(label, fn):
        t0 = time.perf_counter()
        out = fn()
        log(f'{label:<28s} {time.perf_counter() - t0:8.2f}s')
        return out

    # ---- single step ----
    lowered = phase('step: trace+lower',
                    lambda: jax.jit(grad_fn).lower(fv, tex))
    compiled = phase('step: compile', lowered.compile)
    out = phase('step: first run', lambda: compiled(fv, tex))
    phase('step: fetch', lambda: np.asarray(out[0]))
    phase('step: 2nd run', lambda: np.asarray(compiled(fv, tex)[0]))

    if args.scan:
        def make_run(n):
            def run(fv_, tex_, eps):
                def one(carry, _):
                    gf, gt = grad_fn(carry, tex_)
                    return carry + eps * (gf + gt.sum() * 0), None
                out, _ = jax.lax.scan(one, fv_, None, length=n)
                return out
            return run

        eps = jnp.float32(0.0)
        for n in (args.iters, 2 * args.iters):
            lowered = phase(f'scan[{n}]: trace+lower',
                            lambda: jax.jit(make_run(n)).lower(fv, tex, eps))
            compiled = phase(f'scan[{n}]: compile', lowered.compile)
            phase(f'scan[{n}]: first run+fetch',
                  lambda: np.asarray(compiled(fv, tex, eps)).ravel()[0])


if __name__ == '__main__':
    main()
