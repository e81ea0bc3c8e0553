"""Mosaic-vs-XLA bitwise parity with the REAL parameter plumbing.

tools/ulp_bisect.py showed `x / traced` is bitwise across the two
compilers, yet the real pipeline still diverges for some CDFs.  The real
kernels read parameters from a scalar-prefetched SMEM vector; the XLA
backend reads them from an optimization_barrier'd array.  This harness
replicates exactly that: the Pallas path takes the param via
``PrefetchScalarGridSpec`` SMEM (a Mosaic scalar-core value broadcast into
vector ops), the XLA path via ``optimization_barrier``.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PI = float(np.pi)


def pallas_smem(fn, par, *arrays):
    """fn(par_tuple, *ins) with par scalar-prefetched into SMEM."""
    npar = par.shape[0]

    def kernel(par_ref, *refs):
        p = tuple(par_ref[i] for i in range(npar))
        ins = [r[...] for r in refs[:-1]]
        refs[-1][...] = fn(p, *ins)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(arrays[0].shape, lambda i, *_: (0, 0))
                  for _ in arrays],
        out_specs=pl.BlockSpec(arrays[0].shape, lambda i, *_: (0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(arrays[0].shape, jnp.float32),
    )(par, *arrays)


def xla_barrier(fn, par, *arrays):
    p = jax.lax.optimization_barrier(par)
    return fn(tuple(p[i] for i in range(par.shape[0])), *arrays)


def compare(name, fn, par, *arrays):
    xla = jax.jit(lambda pv, *a: xla_barrier(fn, pv, *a))(par, *arrays)
    mos = jax.jit(lambda pv, *a: pallas_smem(fn, pv, *a))(par, *arrays)
    xn = np.asarray(xla)
    mn = np.asarray(mos)
    nbit = int((xn.view(np.uint32) != mn.view(np.uint32)).sum())
    if nbit:
        ux = xn.view(np.int32).astype(np.int64)
        um = mn.view(np.int32).astype(np.int64)
        ulp = np.abs(ux - um)
        mx = np.unravel_index(np.argmax(ulp), ulp.shape)
        detail = (f'{nbit}/{xn.size} DIFFER  max_ulp={ulp.max()} at '
                  f'in={[float(np.asarray(a)[mx]) for a in arrays]} '
                  f'xla={xn[mx]:.9g} mos={mn[mx]:.9g}')
    else:
        detail = 'BITWISE'
    print(f'  {name:<52s} {detail}', flush=True)
    return nbit


def main():
    rng = np.random.RandomState(0)
    SCALE = 5e-2
    par = jnp.asarray([SCALE, 2.0], jnp.float32)  # [scale, shape]
    x = jnp.asarray(rng.rand(8, 2048).astype(np.float32) * 0.2 + 1e-5)
    s = jnp.asarray(np.where(rng.rand(8, 2048) < 0.5, 1.0,
                             -1.0).astype(np.float32))

    print('== SMEM-scalar vs barrier-XLA ==')
    compare('u = s*x/scale', lambda p, s_, x_: s_ * x_ / p[0], par, s, x)
    compare('x/scale', lambda p, x_: x_ / p[0], par, x)
    compare('logistic: 1/(1+exp(-u))',
            lambda p, s_, x_: 1.0 / (1.0 + jnp.exp(-(s_ * x_ / p[0]))),
            par, s, x)
    compare('cubic y = clip(.5u+.5)',
            lambda p, s_, x_: jnp.clip(0.5 * (s_ * x_ / p[0]) + 0.5,
                                       0.0, 1.0), par, s, x)
    compare('cubic full 3y^2-2y^3',
            lambda p, s_, x_: (lambda y: 3.0 * y * y - 2.0 * y * y * y)(
                jnp.clip(0.5 * (s_ * x_ / p[0]) + 0.5, 0.0, 1.0)),
            par, s, x)
    compare('recip full u/(1+x/s)/2+.5',
            lambda p, s_, x_: (s_ * x_ / p[0]) / (1.0 + x_ / p[0]) / 2.0
            + 0.5, par, s, x)
    compare('recip single-div .5*s*x/(scale+x)+.5',
            lambda p, s_, x_: 0.5 * s_ * x_ / (p[0] + x_) + 0.5,
            par, s, x)

    from gendr_tpu.ops.distributions import arcsin, arctan

    def wig(p, s_, x_):
        scale = p[0]
        u = s_ * x_ / scale
        sq = jnp.sqrt(jnp.maximum(scale * scale - x_ * x_, 0.0))
        mid = 0.5 + (s_ * x_ * sq) / (PI * scale * scale) \
            + arcsin(jnp.clip(u, -1.0, 1.0)) / PI
        return jnp.where(u < -1.0, 0.0, jnp.where(u < 1.0, mid, 1.0))

    compare('wigner full', wig, par, s, x)
    compare('wigner sq', lambda p, x_: jnp.sqrt(jnp.maximum(
        p[0] * p[0] - x_ * x_, 0.0)), par, x)
    compare('wigner mid-term x*sq/(pi*s^2)',
            lambda p, s_, x_: (s_ * x_ * jnp.sqrt(jnp.maximum(
                p[0] * p[0] - x_ * x_, 0.0))) / (PI * p[0] * p[0]),
            par, s, x)
    compare('arcsin(clip(u))', lambda p, s_, x_: arcsin(
        jnp.clip(s_ * x_ / p[0], -1.0, 1.0)), par, s, x)
    compare('arctan(u)', lambda p, s_, x_: arctan(s_ * x_ / p[0]),
            par, s, x)

    # gamma chain with SMEM shape
    def gamma_cdf(p, s_, x_):
        from gendr_tpu.ops.distributions import _gamma_cdf
        from gendr_tpu import config as C
        return _gamma_cdf(C.GAMMA, s_, x_, p[0], p[1], 0.0, gamma_inv1=0.5)

    compare('gamma cdf (kummer, SMEM shape)', gamma_cdf, par, s, x)

    # -- arcsin internals (wigner's divergent piece) --------------------
    xc = jnp.asarray(rng.rand(8, 2048).astype(np.float32) * 2.0 - 1.0)
    compare('asin: 1 - x*x', lambda p, x_: 1.0 - x_ * x_, par, xc)
    compare('asin: den = sqrt(max(1-x*x, 1e-12))',
            lambda p, x_: jnp.sqrt(jnp.maximum(1.0 - x_ * x_, 1e-12)),
            par, xc)
    compare('asin: x/den',
            lambda p, x_: x_ / jnp.sqrt(jnp.maximum(1.0 - x_ * x_, 1e-12)),
            par, xc)
    compare('asin: arctan(x/den)',
            lambda p, x_: arctan(
                x_ / jnp.sqrt(jnp.maximum(1.0 - x_ * x_, 1e-12))),
            par, xc)
    compare('asin: full arcsin(x)', lambda p, x_: arcsin(x_), par, xc)
    compare('asin alt: den2 = (1-x)*(1+x)',
            lambda p, x_: arctan(x_ / jnp.sqrt(jnp.maximum(
                (1.0 - x_) * (1.0 + x_), 1e-12))), par, xc)

    # -- frank fold/backward with SMEM p --------------------------------
    from gendr_tpu.ops import tconorms as T
    from gendr_tpu import config as C
    parf = jnp.asarray([2.0], jnp.float32)  # frank p
    av = jnp.asarray(np.concatenate([
        rng.rand(8192).astype(np.float32),
        1.0 - rng.rand(8192).astype(np.float32) * 1e-5,
    ])[np.random.RandomState(3).permutation(16384)].reshape(8, 2048))
    bv = jnp.asarray(np.concatenate([
        rng.rand(8192).astype(np.float32),
        1.0 - rng.rand(8192).astype(np.float32) * 1e-5,
    ])[np.random.RandomState(4).permutation(16384)].reshape(8, 2048))
    compare('frank fold_step (SMEM p)',
            lambda p, a_, b_: T.fold_step(C.FRANK_TCN, a_, b_, p[0]),
            parf, av, bv)
    compare('frank aggregate_backward (SMEM p)',
            lambda p, a_, b_: T.aggregate_backward(C.FRANK_TCN, a_, b_,
                                                   p[0]),
            parf, av, bv)
    # the fold decomposed
    compare('frank ea=_expm1((1-a)*log(p))',
            lambda p, a_, b_: T._expm1((1.0 - a_) * jnp.log(p[0])),
            parf, av, bv)
    compare('frank ea*eb/(p-1)',
            lambda p, a_, b_: T._expm1((1.0 - a_) * jnp.log(p[0]))
            * T._expm1((1.0 - b_) * jnp.log(p[0])) / (p[0] - 1.0),
            parf, av, bv)
    compare('frank log1p(t)/lnp',
            lambda p, a_, b_: jnp.log1p(
                T._expm1((1.0 - a_) * jnp.log(p[0]))
                * T._expm1((1.0 - b_) * jnp.log(p[0])) / (p[0] - 1.0))
            / jnp.log(p[0]), parf, av, bv)
    return 0


if __name__ == '__main__':
    sys.exit(main())
