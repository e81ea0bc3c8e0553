"""Isolate the deferred hard-RGB XLA epilogues (round-3 regression hunt).

Times, with the delta method (per-iter = (T(2N)-T(N))/N, cancelling the
tunnel's fixed dispatch cost):
  - the raw forward kernel output (no finalize)
  - _finalize_soa (includes _hard_rgb_sample gather)
  - _hard_rgb_sample alone
  - _hard_tex_grad alone (the backward winner segment-sum)
  - backward kernel without the tex-grad epilogue vs with
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from gendr_tpu import config as C, data
from gendr_tpu.geometry import core, transforms as T
from gendr_tpu.raster import pallas_backend as P

v, f = data.icosphere(3)
B, is_ = 1, 256
verts = jnp.asarray(v)[None] * 0.9
eye = T.get_points_from_angles(2.732, 30.0, 45.0)
verts = T.perspective(T.look_at(verts, eye), 30.0)
fv = core.face_vertices(verts, jnp.asarray(f)[None]).reshape(B, -1, 9)
F = fv.shape[1]
tex = jnp.ones((B, F, 1, 3), jnp.float32)

cfg = C.RenderConfig.create(
    image_size=is_, dist_func='uniform', dist_squared=False,
    aggr_alpha_func='probabilistic', aggr_rgb_func='hard',
    double_side=True, texture_type='surface', backend='pallas',
    face_chunk=128, pixel_tile=256)
params = dict(
    dist_scale=jnp.float32(1e-2), dist_shape=jnp.float32(0.0),
    dist_shift=jnp.float32(0.0), dist_eps=jnp.float32(1e4),
    aggr_alpha_t_conorm_p=jnp.float32(0.0),
    aggr_rgb_eps=jnp.float32(1e-3), aggr_rgb_gamma=jnp.float32(1e-3),
    near=jnp.float32(1), far=jnp.float32(100),
    background_color=jnp.zeros(3, jnp.float32))

N = 40

def timeit(name, step, x0):
    def make(n):
        @jax.jit
        def run(x, eps):
            def one(carry, _):
                out = step(carry)
                leaf = jax.tree_util.tree_leaves(out)[0]
                dep = jnp.asarray(leaf, jnp.float32).ravel()[0]
                return carry + eps * dep, None
            out, _ = jax.lax.scan(one, x, None, length=n)
            return out
        return run
    r1, r2 = make(N), make(2 * N)
    eps = jnp.float32(0.0)
    np.asarray(r1(x0, eps)).ravel()[:1]
    np.asarray(r2(x0, eps)).ravel()[:1]
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); np.asarray(r1(x0, eps)).ravel()[:1]
        t1 = time.perf_counter(); np.asarray(r2(x0, eps)).ravel()[:1]
        t2 = time.perf_counter()
        d = ((t2 - t1) - (t1 - t0)) / N
        best = min(best, d)
    print(f'{name:44s} {best*1e3:8.3f} ms', file=sys.stderr)

aux0 = jax.jit(lambda a, b: P._prepass(a, b, cfg, params))(fv, tex)
soft0, aggrs0, _ = jax.jit(
    lambda a, b: P.forward_with_aux(a, b, cfg, params))(fv, tex)
g0 = jnp.ones_like(soft0)
out0, _ = jax.jit(
    lambda a, b: P._fwd_kernel_out(a, b, cfg, params, aux0))(fv, tex)
fidx0 = out0[:, 2]
grgb0 = g0.reshape(B, 4, is_ * is_)[:, :3]

timeit('fwd kernel only (aux fixed, no finalize)',
       lambda fv_: P._fwd_kernel_out(fv_, tex, cfg, params, aux0)[0], fv)
timeit('finalize_soa (incl hard_rgb_sample)',
       lambda o: P._finalize_soa(o, cfg, params, aux0['packed'], TS=1),
       out0)
timeit('_hard_rgb_sample alone',
       lambda fx: P._hard_rgb_sample(aux0['packed'], fx, cfg, 1, is_),
       fidx0)
timeit('_hard_tex_grad alone',
       lambda fx: P._hard_tex_grad(aux0['packed'], fx, grgb0, cfg, 1, is_),
       fidx0)
timeit('backward_from_aux (incl tex-grad epilogue)',
       lambda fv_: P.backward_from_aux(fv_, tex, aux0, soft0, aggrs0, g0,
                                       cfg, params), fv)
timeit('fwd+finalize (aux fixed)',
       lambda fv_: P.forward_with_aux(fv_, tex, cfg, params, aux=aux0)[0],
       fv)
