"""Elementwise Mosaic-vs-XLA bitwise parity harness for the function zoo.

The twin-backend design requires ``frag`` (the CDF of the signed distance)
to be BITWISE equal between the Pallas (Mosaic) kernels and the XLA
streaming backend for the same inputs — the max t-conorm backward detects
its winner by exact float equality (cu:574-575) and the frank backward's
1e-6 saturation guard amplifies ulp-level frag skew into O(1) gradient
error.  This tool evaluates each distribution's ``cdf`` (and optionally
``pdf`` / t-conorm chains) on the same input tensor through

  * a trivial elementwise Pallas kernel (compiled by Mosaic), and
  * a plain ``jax.jit`` (compiled by XLA:TPU),

and counts bitwise mismatches, printing the worst offending inputs.  Run it
on the chip; on CPU both paths collapse to the same compiler and it proves
nothing.
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

from gendr_tpu import config as C
from gendr_tpu.ops import distributions as D
from gendr_tpu.ops import tconorms as T

SCALE = 5e-2


def _pallas_elementwise(fn, *arrays):
    """Run fn(*arrays) elementwise through a single-block Pallas kernel."""
    def kernel(*refs):
        ins = [r[...] for r in refs[:-1]]
        refs[-1][...] = fn(*ins)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(arrays[0].shape, jnp.float32),
    )(*arrays)
    return out


def compare(name, fn, *arrays, report_worst=3):
    xla = jax.jit(fn)(*arrays)
    mos = jax.jit(lambda *a: _pallas_elementwise(fn, *a))(*arrays)
    xn = np.asarray(xla)
    mn = np.asarray(mos)
    diff = xn.view(np.uint32).astype(np.int64) ^ mn.view(np.uint32).astype(np.int64)
    nbit = int((xn.view(np.uint32) != mn.view(np.uint32)).sum())
    status = 'BITWISE' if nbit == 0 else f'{nbit}/{xn.size} DIFFER'
    print(f'  {name:<44s} {status}')
    if nbit and report_worst:
        bad = np.argwhere(xn.view(np.uint32) != mn.view(np.uint32))
        # ulp distance
        ux = xn.view(np.int32).astype(np.int64)
        um = mn.view(np.int32).astype(np.int64)
        ulp = np.abs(ux - um)
        order = np.argsort(-ulp.ravel())[:report_worst]
        for o in order:
            idx = np.unravel_index(o, xn.shape)
            ins = [np.asarray(a)[idx] for a in arrays]
            print(f'      in={["%.9g" % float(v) for v in ins]} '
                  f'xla={xn[idx]:.9g} mosaic={mn[idx]:.9g} '
                  f'ulp={ulp[idx]}')
    return nbit


def dist_inputs(n=8 * 2048, seed=0):
    """(sign, x) pairs concentrated where rendering actually evaluates the
    CDF: x in [0, ~4*margin], denser near 0 and near the compact-support
    edge x = scale."""
    rng = np.random.RandomState(seed)
    xs = np.concatenate([
        rng.rand(n // 4).astype(np.float32) * 4.0 * SCALE,
        rng.rand(n // 4).astype(np.float32) * SCALE,           # inside support
        (SCALE * (1.0 + (rng.rand(n // 4).astype(np.float32) - 0.5)
                  * 1e-3)),                                    # support edge
        rng.rand(n // 4).astype(np.float32) * 1e-3 * SCALE,    # near zero
    ])
    signs = np.where(rng.rand(xs.size) < 0.5, 1.0, -1.0).astype(np.float32)
    pad = (-xs.size) % 1024
    xs = np.pad(xs, (0, pad))
    signs = np.pad(signs, (0, pad), constant_values=1.0)
    return (jnp.asarray(signs).reshape(8, -1),
            jnp.asarray(xs).reshape(8, -1))


DIST_PARAMS = {
    'gamma': dict(shape=2.0),
    'gamma_rev': dict(shape=2.0),
    'levy': dict(shift=0.1),
    'levy_rev': dict(shift=0.1),
    'exponential': dict(shift=0.05),
    'gumbel_max': dict(shift=0.05),
}

ALL = ['uniform', 'cubic_hermite', 'wigner_semicircle', 'gaussian',
       'laplace', 'logistic', 'gudermannian', 'cauchy', 'reciprocal',
       'gumbel_max', 'gumbel_min', 'exponential', 'exponential_rev',
       'gamma', 'gamma_rev', 'levy', 'levy_rev']


def main(names):
    sign, x = dist_inputs()
    total = 0
    print('== cdf(sign, x) Mosaic vs XLA ==')
    for nm in names:
        did = C.DIST_FUNC_MAP[nm]
        kw = DIST_PARAMS.get(nm, {})
        shape = kw.get('shape', 0.0)
        shift = kw.get('shift', 0.0)
        ginv1 = float(np.exp(-float(jax.lax.lgamma(jnp.float32(shape + 1.0)))))

        def fn(s_, x_, did=did, shape=shape, shift=shift, ginv1=ginv1):
            return D.cdf(did, s_, x_, SCALE, shape, shift, gamma_inv1=ginv1)

        total += compare(f'cdf[{nm}]', fn, sign, x)

    print('== pdf(sign, x) Mosaic vs XLA ==')
    for nm in names:
        did = C.DIST_FUNC_MAP[nm]
        kw = DIST_PARAMS.get(nm, {})
        shape = kw.get('shape', 0.0)
        shift = kw.get('shift', 0.0)
        ginv = float(np.exp(-float(jax.lax.lgamma(
            jnp.float32(max(shape, 1e-6))))))

        def fn(s_, x_, did=did, shape=shape, shift=shift, ginv=ginv):
            return D.pdf(did, s_, x_, SCALE, shape, shift, gamma_inv=ginv)

        total += compare(f'pdf[{nm}]', fn, sign, x)

    # frank fold + backward chains on coverage values near saturation
    rng = np.random.RandomState(1)
    a = np.concatenate([
        rng.rand(4096).astype(np.float32),
        1.0 - rng.rand(4096).astype(np.float32) * 1e-5,
    ])
    b = np.concatenate([
        rng.rand(4096).astype(np.float32),
        1.0 - rng.rand(4096).astype(np.float32) * 1e-5,
    ])
    rng.shuffle(a), rng.shuffle(b)
    a = jnp.asarray(a).reshape(8, -1)
    b = jnp.asarray(b).reshape(8, -1)
    print('== t-conorm chains Mosaic vs XLA ==')
    total += compare('frank fold_step', lambda a_, b_: T.fold_step(
        C.FRANK_TCN, a_, b_, 2.0), a, b)
    total += compare('frank aggregate_backward', lambda a_, b_:
                     T.aggregate_backward(C.FRANK_TCN, a_, b_, 2.0), a, b)
    print(f'total bitwise mismatches: {total}')
    return 1 if total else 0


if __name__ == '__main__':
    names = [a for a in sys.argv[1:] if not a.startswith('-')] or ALL
    sys.exit(main(names))
