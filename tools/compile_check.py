"""Compile-only check of the Pallas forward+backward at the bench config.

Usage: python tools/compile_check.py [--fwd-only]

Lowers + compiles (no execution beyond one tiny run) so Mosaic layout
errors surface in ~20 s instead of a full bench run.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--image-size', type=int, default=256)
    ap.add_argument('--level', type=int, default=3)
    ap.add_argument('--fwd-only', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gendr_tpu import data
    from gendr_tpu.raster.render import render

    v, f = data.icosphere(args.level)
    verts = jnp.asarray(v)[None] * 0.9
    faces = jnp.asarray(f)[None]
    fv = verts[0][faces[0]][None]
    fv = fv.at[..., 2].add(2.5)
    tex = jnp.ones((1, faces.shape[1], 1, 3), jnp.float32)

    def loss(fv, tex):
        img = render(fv, tex, image_size=args.image_size,
                     backend='pallas', dist_func='logistic',
                     dist_scale=1e-2, aggr_rgb_func='hard')
        return jnp.sum(img)

    fn = (jax.jit(loss) if args.fwd_only
          else jax.jit(jax.grad(loss, argnums=(0, 1))))
    t0 = time.time()
    lowered = fn.lower(fv, tex)
    compiled = lowered.compile()
    print(f'compiled ok in {time.time()-t0:.1f}s', file=sys.stderr)
    out = jax.block_until_ready(compiled(fv, tex))
    print('executed ok', file=sys.stderr)
    return 0


if __name__ == '__main__':
    sys.exit(main())
