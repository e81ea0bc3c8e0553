"""Second bisection: is the fwd+bwd composition overhead in the kernels
themselves or in the glue?"""
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


aux0 = jax.jit(lambda a, b: P._prepass(a, b, cfg, params))(fv, tex)
soft0, aggrs0, _ = jax.jit(
    lambda a, b: P.forward_with_aux(a, b, cfg, params))(fv, tex)

# (a) two chained forwards (second consumes the first's output)
def two_fwd(fv_):
    s1, a1, _ = P.forward_with_aux(fv_, tex, cfg, params)
    fv2 = fv_ + s1[0, 3, 0, 0] * 0.0
    s2, a2, _ = P.forward_with_aux(fv2, tex, cfg, params)
    return s2

if os.environ.get('PROBE','a')=='a': timeit('two chained forwards', two_fwd)

# (b) fwd+bwd with prepass HOISTED (aux0 fixed outside the loop)
def fb_fixed_aux(fv_):
    soft, aggrs, _ = P.forward_with_aux(fv_, tex, cfg, params, aux=aux0)
    g = soft * 2.0
    return P.backward_from_aux(fv_, tex, aux0, soft, aggrs, g, cfg, params)

if os.environ.get('PROBE')=='b': timeit('fwd+bwd, aux hoisted', fb_fixed_aux)

# (c) bwd alone but with TRACED soft/aggrs derived from carried fv
def bwd_traced_inputs(fv_):
    soft = soft0 + fv_[0, 0, 0]
    aggrs = aggrs0 + fv_[0, 0, 0] * 0.0
    g = soft * 2.0
    return P.backward_from_aux(fv_, tex, aux0, soft, aggrs, g, cfg, params)

if os.environ.get('PROBE')=='c': timeit('bwd alone, traced pixel inputs', bwd_traced_inputs)

# (d) prepass alone chained
if os.environ.get('PROBE')=='d': timeit('prepass chained', lambda fv_: P._prepass(fv_, tex, cfg, params)['packed'])
