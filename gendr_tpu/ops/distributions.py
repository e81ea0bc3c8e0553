"""The 18-distribution CDF/PDF zoo of the generalized differentiable renderer.

``cdf`` maps a signed pixel-to-face distance to a per-face coverage
probability ("soft fragment"); ``pdf`` is the derivative used by the custom
VJP.  The function ids and exact formulas (including every guard constant and
early-out threshold) mirror the reference CUDA implementation:

* forward:  ``gendr/cuda/generalized_renderer_cuda_kernel.cu:242-363``
* backward: ``gendr/cuda/generalized_renderer_cuda_kernel.cu:366-459``

All functions are pure elementwise jnp — on TPU they fuse into the
surrounding rasterization kernel (XLA epilogue fusion / inlined in Pallas).
The distribution id is *static* so only one branch is ever traced.

Conventions (same as the reference):
  * ``x`` is the non-negative distance magnitude; ``sign`` is +1 inside the
    triangle, -1 outside.
  * ``scale`` is tau; ``shape``/``shift`` parametrize gamma/levy/exponential.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax.scipy.special import erfc

from gendr_tpu import config as C

_PI = math.pi


def _safe_exp(x):
    # exp with clipped input: keeps untaken jnp.where branches finite.
    return jnp.exp(jnp.clip(x, -87.0, 87.0))


def cdf(dist_func: int, sign, x, scale, shape=0.0, shift=0.0):
    """CDF of the selected distribution evaluated at sign*x with scale tau.

    Matches ``sigmoid_forward_cuda`` (cu:242-363) branch by branch.
    """
    sign = jnp.asarray(sign, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    u = sign * x / scale

    if dist_func == C.HEAVISIDE:
        return jnp.where(sign > 0, 1.0, 0.0)

    if dist_func == C.LOGISTIC:
        return 1.0 / (1.0 + _safe_exp(-u))

    if dist_func == C.CAUCHY:
        return jnp.arctan(u) / _PI + 0.5

    if dist_func == C.RECIPROCAL:
        # cu:261 — note denominator uses x (non-negative), not sign*x
        return u / (1.0 + x / scale) / 2.0 + 0.5

    if dist_func == C.LAPLACE:
        e = 0.5 * _safe_exp(-x / scale)
        return jnp.where(sign < 0, e, 1.0 - e)

    if dist_func == C.UNIFORM:
        return jnp.clip(0.5 * u + 0.5, 0.0, 1.0)

    if dist_func == C.GUDERMANNIAN:
        return jnp.arctan(jnp.tanh(u / 2.0)) * 2.0 / _PI + 0.5

    if dist_func == C.CUBIC_HERMITE:
        y = jnp.clip(0.5 * u + 0.5, 0.0, 1.0)
        return 3.0 * y * y - 2.0 * y * y * y

    if dist_func == C.GAUSSIAN:
        # normcdf(u) = 0.5*erfc(-u/sqrt(2)) (cu:293)
        return 0.5 * erfc(-u / math.sqrt(2.0))

    if dist_func in (C.GAMMA, C.GAMMA_REV):
        return _gamma_cdf(dist_func, sign, x, scale, shape, shift)

    if dist_func == C.WIGNER_SEMICIRCLE:
        # cu:320-327; in-branch |x| < scale so the sqrt argument is >= 0
        sq = jnp.sqrt(jnp.maximum(scale * scale - x * x, 0.0))
        mid = 0.5 + (sign * x * sq) / (_PI * scale * scale) \
            + jnp.arcsin(jnp.clip(u, -1.0, 1.0)) / _PI
        return jnp.where(u < -1.0, 0.0, jnp.where(u < 1.0, mid, 1.0))

    if dist_func == C.GUMBEL_MAX:
        return _safe_exp(-_safe_exp(-u))

    if dist_func == C.GUMBEL_MIN:
        return 1.0 - _safe_exp(-_safe_exp(u))

    if dist_func in (C.LEVY, C.LEVY_REV):
        if dist_func == C.LEVY:
            xs = sign * x + shift * scale
            lo = xs <= 1e-6
        else:
            xs = -(sign * x - shift * scale)
            lo = xs <= 1e-6  # cu:343: sign*x - shift*scale >= -1e-6
        xs_safe = jnp.maximum(xs, 1e-6)
        y = erfc(jnp.sqrt(scale / 2.0 / xs_safe))
        if dist_func == C.LEVY:
            return jnp.where(lo, 0.0, y)
        return jnp.where(lo, 1.0, 1.0 - y)

    if dist_func in (C.EXPONENTIAL, C.EXPONENTIAL_REV):
        if dist_func == C.EXPONENTIAL:
            xs = sign * x + shift * scale
            lo = xs < 0.0
        else:
            xs = -(sign * x - shift * scale)
            lo = xs < 0.0
        y = 1.0 - _safe_exp(-jnp.maximum(xs, 0.0) / scale)
        if dist_func == C.EXPONENTIAL:
            return jnp.where(lo, 0.0, y)
        return jnp.where(lo, 1.0, 1.0 - y)

    raise ValueError(f'unknown dist_func id: {dist_func}')


def _gamma_cdf(dist_func, sign, x, scale, shape, shift):
    """Regularized lower incomplete gamma via the same 32-term Kummer
    (confluent hypergeometric) series as the reference (cu:295-318):

        P(p, z) = z^p e^{-z} * sum_{i>=0} z^i / Gamma(p+1+i)
    """
    if dist_func == C.GAMMA:
        xs = sign * x + shift * scale
        zero_out = xs <= 0.0
    else:
        xs = -(sign * x - shift * scale)
        zero_out = xs <= 0.0  # cu:306: sign*x - shift*scale >= 0 -> return 1
    z = jnp.maximum(xs, 1e-30) / scale
    saturate = z > C.GAMMA_THRESHOLD

    shape = jnp.asarray(shape, jnp.float32)
    # 1 / Gamma(p+1) = exp(-lgamma(p+1)); p >= 0 enforced by caller
    inv_gamma_p1 = jnp.exp(-_lgamma(shape + 1.0))
    kummers = inv_gamma_p1
    factor = inv_gamma_p1
    for i in range(1, C.NUM_STEPS_GAMMA):
        factor = factor * z / (shape + i)
        kummers = kummers + factor
    y = jnp.power(z, shape) * _safe_exp(-z) * kummers
    y = jnp.where(saturate, 1.0, y)
    y = jnp.where(zero_out, 0.0, y)
    if dist_func == C.GAMMA:
        return y
    return 1.0 - y


def _lgamma(v):
    import jax.lax as lax
    return lax.lgamma(jnp.asarray(v, jnp.float32))


def pdf(dist_func: int, sign, x, scale, shape=0.0, shift=0.0):
    """Derivative of ``cdf`` w.r.t. (sign*x) — ``sigmoid_backward_cuda``
    (cu:366-459) branch by branch, including its asymmetries (several PDFs
    ignore ``sign`` because the kernel always calls with x >= 0)."""
    sign = jnp.asarray(sign, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    u = sign * x / scale

    if dist_func == C.HEAVISIDE:
        return jnp.zeros_like(x)

    if dist_func == C.LOGISTIC:
        y = 1.0 / (1.0 + _safe_exp(-u))
        return y * (1.0 - y) / scale

    if dist_func == C.CAUCHY:
        return 1.0 / (_PI * scale + _PI / scale * x * x)

    if dist_func == C.RECIPROCAL:
        return scale / (2.0 * (scale + x) * (scale + x))

    if dist_func == C.LAPLACE:
        return 0.5 / scale * _safe_exp(-x / scale)

    if dist_func == C.UNIFORM:
        return jnp.where((u > -1.0) & (u < 1.0), 0.5 / scale, 0.0)

    if dist_func == C.GUDERMANNIAN:
        return 1.0 / jnp.cosh(jnp.clip(u, -87.0, 87.0)) / _PI / scale

    if dist_func == C.CUBIC_HERMITE:
        inside = (u >= -1.0) & (u <= 1.0)
        return jnp.where(inside, 0.75 / scale - 0.75 * x * x / (scale ** 3), 0.0)

    if dist_func == C.GAUSSIAN:
        return 1.0 / scale / math.sqrt(2.0 * _PI) * _safe_exp(-0.5 * u * u)

    if dist_func in (C.GAMMA, C.GAMMA_REV):
        # reference computes this branch in double (cu:412-423); we use
        # log-space fp32 which is comparably accurate for the kernel's range
        if dist_func == C.GAMMA:
            xs = sign * x + shift * scale
            zero_out = xs <= 0.0
        else:
            xs = -(sign * x - shift * scale)
            zero_out = xs <= 0.0
        xs_safe = jnp.maximum(xs, 1e-30)
        shape_arr = jnp.asarray(shape, jnp.float32)
        log_pdf = (-_lgamma(shape_arr)
                   - shape_arr * jnp.log(jnp.asarray(scale, jnp.float32))
                   + (shape_arr - 1.0) * jnp.log(xs_safe)
                   - xs_safe / scale)
        return jnp.where(zero_out, 0.0, _safe_exp(log_pdf))

    if dist_func == C.WIGNER_SEMICIRCLE:
        # cu:425-427: zero only for x/scale > 1 (no sign)
        sq = jnp.sqrt(jnp.maximum(scale * scale - x * x, 0.0))
        return jnp.where(x / scale > 1.0, 0.0, 2.0 / _PI / (scale * scale) * sq)

    if dist_func == C.GUMBEL_MAX:
        return _safe_exp(-(u + _safe_exp(-u))) / scale

    if dist_func == C.GUMBEL_MIN:
        return _safe_exp(-(-u + _safe_exp(u))) / scale

    if dist_func in (C.LEVY, C.LEVY_REV):
        if dist_func == C.LEVY:
            xs = sign * x + shift * scale
            zero_out = xs <= 1e-6
        else:
            xs = -(sign * x - shift * scale)
            zero_out = xs <= 1e-6
        xs_safe = jnp.maximum(xs, 1e-6)
        val = jnp.sqrt(scale / 2.0 / _PI) * _safe_exp(-scale / 2.0 / xs_safe) \
            / jnp.power(xs_safe, 1.5)
        return jnp.where(zero_out, 0.0, val)

    if dist_func in (C.EXPONENTIAL, C.EXPONENTIAL_REV):
        if dist_func == C.EXPONENTIAL:
            xs = sign * x + shift * scale
            zero_out = xs < 0.0
        else:
            xs = -(sign * x - shift * scale)
            zero_out = xs < 0.0
        val = 1.0 / scale * _safe_exp(-jnp.maximum(xs, 0.0) / scale)
        return jnp.where(zero_out, 0.0, val)

    raise ValueError(f'unknown dist_func id: {dist_func}')


# -- scalar verification seam ------------------------------------------------
# The reference exports CPU-callable scalar bindings used by its plotting /
# validation scripts (generalized_renderer_cuda.cpp:195-237,
# animations/distributions_to_csv.py).  These wrappers are the equivalent.

def sigmoid_forward(function_id, sign, x, scale=1.0, dist_shape=-10.0,
                    dist_shift=-10.0):
    return float(cdf(int(function_id), sign, x, scale, dist_shape, dist_shift))


def sigmoid_backward(function_id, sign, x, scale=1.0, dist_shape=-10.0,
                     dist_shift=-10.0):
    return float(pdf(int(function_id), sign, x, scale, dist_shape, dist_shift))
