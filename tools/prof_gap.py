"""Bisect the gap between fwd+bwd component times and the full grad step."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from gendr_tpu import config as C, data
from gendr_tpu.geometry import core, transforms as T
from gendr_tpu.raster import pallas_backend as P
from gendr_tpu.raster.render import render

v, f = data.icosphere(3)
B, is_ = 1, 256
verts = jnp.asarray(v)[None] * 0.9
eye = T.get_points_from_angles(2.732, 30.0, 45.0)
verts = T.perspective(T.look_at(verts, eye), 30.0)
fv = core.face_vertices(verts, jnp.asarray(f)[None]).reshape(B, -1, 9)
F = fv.shape[1]
tex = jnp.ones((B, F, 1, 3), jnp.float32)

cfg = C.RenderConfig.create(
    image_size=is_, dist_func='uniform', aggr_alpha_func='probabilistic',
    aggr_rgb_func='hard', double_side=True, backend='pallas',
    face_chunk=128, pixel_tile=256)
params = dict(
    dist_scale=jnp.float32(1e-2), dist_shape=jnp.float32(0.0),
    dist_shift=jnp.float32(0.0), dist_eps=jnp.float32(1e4),
    aggr_alpha_t_conorm_p=jnp.float32(0.0),
    aggr_rgb_eps=jnp.float32(1e-3), aggr_rgb_gamma=jnp.float32(1e-3),
    near=jnp.float32(1), far=jnp.float32(100),
    background_color=jnp.zeros(3, jnp.float32))

N = 40


def timeit(name, step_fn):
    def make(n):
        @jax.jit
        def run(fv_, eps):
            def one(carry, _):
                out = step_fn(carry)
                leaves = jax.tree_util.tree_leaves(out)
                dep = sum(jnp.asarray(l, jnp.float32).ravel()[0]
                          for l in leaves)
                return carry + eps * dep, None
            out, _ = jax.lax.scan(one, fv_, None, length=n)
            return out
        return run
    r1, r2 = make(N), make(2 * N)
    eps = jnp.float32(0.0)
    np.asarray(r1(fv, eps)).ravel()[:1]
    np.asarray(r2(fv, eps)).ravel()[:1]
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); np.asarray(r1(fv, eps)).ravel()[:1]
        t1 = time.perf_counter(); np.asarray(r2(fv, eps)).ravel()[:1]
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / N)
    print(f'{name:56s} {best*1e3:8.3f} ms', file=sys.stderr)


# 1. manual fwd+bwd chain (no custom_vjp machinery): dep on both grads
def manual_step(fv_):
    soft, aggrs, aux = P.forward_with_aux(fv_, tex, cfg, params)
    g = soft * 2.0  # derived from output: keeps fwd->bwd dependency
    return P.backward_from_aux(fv_, tex, aux, soft, aggrs, g, cfg, params)

timeit('manual fwd+bwd chain', manual_step)


# 2. fwd + bwd where bwd gets a CARRIED g (not derived from fwd output)
def semi_step(fv_):
    soft, aggrs, aux = P.forward_with_aux(fv_, tex, cfg, params)
    g = jnp.ones_like(soft) + fv_[0, 0, 0]
    return P.backward_from_aux(fv_, tex, aux, soft, aggrs, g, cfg, params)

timeit('fwd+bwd, g independent of fwd output', semi_step)

kw = dict(image_size=is_, dist_func='uniform', dist_scale=1e-2,
          aggr_alpha_func='probabilistic', aggr_rgb_func='hard',
          backend='pallas', face_chunk=128, pixel_tile=256)


# 3. public render grad (bench step)
def loss(fv_, tex_):
    img = render(fv_, tex_, **kw)
    return jnp.sum(img[:, 3] ** 2) + jnp.sum(img[:, :3])

timeit('public grad step', lambda fv_: jax.grad(loss, argnums=(0, 1))(fv_, tex))
