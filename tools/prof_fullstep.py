"""Decompose the bench.py fwd+bwd step: where does the frame time go?

Delta-method timing (T(2N)-T(N))/N of progressively larger slices of the
full gradient step, all with the same carried dependency structure as
bench.py.
"""
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

kw = dict(image_size=is_, dist_func='uniform', dist_scale=1e-2,
          aggr_alpha_func='probabilistic', aggr_rgb_func='hard',
          backend='pallas', face_chunk=128, pixel_tile=256)

N = 40


def timeit(name, step_fn):
    """step_fn(fv) -> array-pytree; carried via first-leaf scalar dep."""
    def make(n):
        @jax.jit
        def run(fv_, eps):
            def one(carry, _):
                out = step_fn(carry)
                leaf = jax.tree_util.tree_leaves(out)[0]
                dep = jnp.asarray(leaf, jnp.float32).ravel()[0]
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
        d = ((t2 - t1) - (t1 - t0)) / N
        best = min(best, d)
    print(f'{name:52s} {best*1e3:8.3f} ms', file=sys.stderr)


def loss(fv_, tex_):
    img = render(fv_, tex_, **kw)
    return jnp.sum(img[:, 3] ** 2) + jnp.sum(img[:, :3])


grad_fn = jax.grad(loss, argnums=(0, 1))

# 1. the bench step verbatim
timeit('full grad step (bench)', lambda fv_: grad_fn(fv_, tex))

# 2. grad wrt faces only
timeit('grad wrt faces only', lambda fv_: jax.grad(loss)(fv_, tex))

# 3. forward only through public render()
timeit('render() fwd only', lambda fv_: render(fv_, tex, **kw))

# 4. forward_with_aux (all outputs consumed)
timeit('forward_with_aux full',
       lambda fv_: P.forward_with_aux(fv_, tex, cfg, params))

# 5. value_and_grad (forward reuse check)
timeit('value_and_grad', lambda fv_: jax.value_and_grad(loss)(fv_, tex))

# --- finer decomposition ---
aux0 = jax.jit(lambda a, b: P._prepass(a, b, cfg, params))(fv, tex)
soft0, aggrs0, _ = jax.jit(
    lambda a, b: P.forward_with_aux(a, b, cfg, params))(fv, tex)
g0 = jnp.ones_like(soft0)

timeit('prepass (all outputs)',
       lambda fv_: P._prepass(fv_, tex, cfg, params))
timeit('fwd_with_aux given aux',
       lambda fv_: P.forward_with_aux(fv_, tex, cfg, params, aux=aux0)[:2])
timeit('bwd_from_aux (both grads)',
       lambda fv_: P.backward_from_aux(fv_, tex, aux0, soft0, aggrs0,
                                       g0, cfg, params))
