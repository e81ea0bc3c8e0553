"""Bisect which primitive op chains round differently under Mosaic vs XLA.

Two modes per expression:
  * const: parameters (scale etc.) are Python floats closed over by both
    paths (what tools/ulp_check.py measured);
  * traced: parameters enter as device arrays, mirroring the real pipeline
    where the Pallas kernels read them from SMEM but the XLA backend sees
    trace-time constants.
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

PI = float(np.pi)
SCALE = 5e-2


def _pallas_elementwise(fn, *arrays):
    def kernel(*refs):
        ins = [r[...] for r in refs[:-1]]
        refs[-1][...] = fn(*ins)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(arrays[0].shape, jnp.float32),
    )(*arrays)


def compare(name, fn, *arrays):
    xla = jax.jit(fn)(*arrays)
    mos = jax.jit(lambda *a: _pallas_elementwise(fn, *a))(*arrays)
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
    x = jnp.asarray(rng.rand(8, 2048).astype(np.float32) * 0.2 + 1e-4)
    y = jnp.asarray(rng.rand(8, 2048).astype(np.float32) * 3.0 - 1.5)
    u = jnp.asarray(rng.rand(8, 2048).astype(np.float32) * 6.0 - 3.0)
    svec = jnp.full((8, 2048), SCALE, jnp.float32)

    print('== primitive bisect ==')
    compare('div const: x / 0.05', lambda x_: x_ / SCALE, x)
    compare('div traced: x / s', lambda x_, s_: x_ / s_, x, svec)
    compare('recip: 1.0 / x', lambda x_: 1.0 / x_, x)
    compare('exp(y)', lambda y_: jnp.exp(y_), y)
    compare('exp(u) wide', lambda u_: jnp.exp(u_), u)
    compare('tanh(y)', lambda y_: jnp.tanh(y_), y)
    compare('sqrt(x)', lambda x_: jnp.sqrt(x_), x)
    compare('rsqrt(x)', lambda x_: jax.lax.rsqrt(x_), x)
    compare('log(x)', lambda x_: jnp.log(x_), x)
    compare('pow(x, 1.5)', lambda x_: jnp.power(x_, 1.5), x)
    compare('pow(x, 2.0)', lambda x_: jnp.power(x_, 2.0), x)
    compare('pow(x, s) traced', lambda x_, s_: jnp.power(x_, s_ * 40.0),
            x, svec)
    compare('mul-add a*b+0.5 (fma shape)', lambda x_, y_: x_ * y_ + 0.5,
            x, y)
    compare('three-mul x*y*x', lambda x_, y_: x_ * y_ * x_, x, y)
    compare('div chain 2/x/pi/0.05', lambda x_: 2.0 / x_ / PI / SCALE, x)
    compare('div chain traced 2/x/pi/s',
            lambda x_, s_: 2.0 / x_ / PI / s_, x, svec)
    compare('div by folded const x/(pi*0.05^2)',
            lambda x_: x_ / (PI * SCALE * SCALE), x)
    compare('eu + 1/eu', lambda y_: jnp.exp(y_) + 1.0 / jnp.exp(y_), y)
    compare('gud-pdf full 2/(eu+1/eu)/pi/0.05',
            lambda y_: 2.0 / (jnp.exp(y_) + 1.0 / jnp.exp(y_)) / PI / SCALE,
            y)
    compare('gud-pdf refactor 2/((eu+1/eu)*(pi*0.05))',
            lambda y_: 2.0 / ((jnp.exp(y_) + 1.0 / jnp.exp(y_))
                              * (PI * SCALE)), y)

    print('== wigner chain ==')
    sq = lambda x_: jnp.sqrt(jnp.maximum(SCALE * SCALE - x_ * x_, 0.0))
    xs = jnp.asarray(
        (rng.rand(8, 2048).astype(np.float32)) * SCALE)  # inside support
    compare('wig sq term', sq, xs)
    compare('wig mid = x*sq/(pi*s^2)',
            lambda x_: (x_ * sq(x_)) / (PI * SCALE * SCALE), xs)
    compare('wig mid traced s',
            lambda x_, s_: (x_ * sq(x_)) / (PI * s_ * s_), xs,
            svec)
    from gendr_tpu.ops.distributions import arcsin, arctan
    compare('arcsin(x/0.05)', lambda x_: arcsin(
        jnp.clip(x_ / SCALE, -1.0, 1.0)), xs)
    compare('arctan(y)', lambda y_: arctan(y_), y)
    compare('wig full', lambda x_: 0.5 + (x_ * sq(x_)) / (PI * SCALE * SCALE)
            + arcsin(jnp.clip(x_ / SCALE, -1.0, 1.0)) / PI, xs)

    print('== gamma kummer chain ==')
    z = jnp.asarray(rng.rand(8, 2048).astype(np.float32) * 8.0 + 1e-4)
    shape = 2.0

    def kummer_const(z_):
        inv = 0.5  # 1/Gamma(3) = 0.5
        kum = inv
        fac = inv
        for i in range(1, 32):
            fac = fac * z_ / (shape + i)
            kum = kum + fac
        return kum

    def kummer_recip(z_):
        inv = 0.5
        kum = inv
        fac = inv
        for i in range(1, 32):
            fac = fac * z_ * (1.0 / (shape + i))
            kum = kum + fac
        return kum

    compare('kummer series (div)', kummer_const, z)
    compare('kummer series (recip-mul)', kummer_recip, z)
    compare('z^shape * exp(-z)', lambda z_: jnp.power(z_, shape)
            * jnp.exp(-z_), z)
    compare('z^shape traced * exp(-z)',
            lambda z_, s_: jnp.power(z_, s_ * 40.0) * jnp.exp(-z_), z, svec)
    compare('gamma full (div kummer)', lambda z_: jnp.power(z_, shape)
            * jnp.exp(-z_) * kummer_const(z_), z)
    compare('gamma full (recip kummer)', lambda z_: jnp.power(z_, shape)
            * jnp.exp(-z_) * kummer_recip(z_), z)

    print('== frank chain ==')
    a = jnp.asarray(rng.rand(8, 2048).astype(np.float32))
    b = jnp.asarray(rng.rand(8, 2048).astype(np.float32))
    from gendr_tpu.ops.tconorms import _expm1
    lnp = float(np.log(2.0))
    compare('_expm1((1-a)*ln2)', lambda a_: _expm1((1.0 - a_) * lnp), a)
    compare('log1p(t)', lambda a_: jnp.log1p(a_), a)
    compare('frank c = log1p(ea*eb/(p-1))/lnp',
            lambda a_, b_: jnp.log1p(_expm1((1.0 - a_) * lnp)
                                     * _expm1((1.0 - b_) * lnp)
                                     / (2.0 - 1.0)) / lnp, a, b)
    return 0


if __name__ == '__main__':
    sys.exit(main())
