"""Static render configuration for the generalized differentiable renderer.

Everything in :class:`RenderConfig` is *static*: it selects which distribution
CDF, which t-conorm, and which RGB aggregation get traced into the compiled
XLA/Pallas program.  Only continuous parameters (``dist_scale``,
``dist_shape``, ``dist_shift``, ``aggr_alpha_t_conorm_p``, ``aggr_rgb_eps``,
``aggr_rgb_gamma``, ``near``, ``far``, background color) are runtime values so
that tau-annealing loops (e.g. ``experiments/opt_camera.py``) do not trigger
re-compilation.

Name->id tables mirror the reference implementation
(``gendr/functional/renderer.py:44-83`` in Felix-Petersen/gendr).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple, Union

# ---------------------------------------------------------------------------
# Distribution ("sigmoid") ids — reference: generalized_renderer_cuda_kernel.cu:217-239
# ---------------------------------------------------------------------------
HEAVISIDE = 0
UNIFORM = 1
CUBIC_HERMITE = 2
WIGNER_SEMICIRCLE = 3
GAUSSIAN = 4
LAPLACE = 5
LOGISTIC = 6
GUDERMANNIAN = 7
CAUCHY = 8
RECIPROCAL = 9
GUMBEL_MAX = 10
GUMBEL_MIN = 11
EXPONENTIAL = 12
EXPONENTIAL_REV = 13
GAMMA = 14
GAMMA_REV = 15
LEVY = 16
LEVY_REV = 17

DIST_FUNC_MAP = {
    'hard': 0, 'heaviside': 0,
    'uniform': 1,
    'cubic_hermite': 2,
    'wigner_semicircle': 3,
    'gaussian': 4,
    'laplace': 5,
    'logistic': 6,
    'gudermannian': 7, 'hyperbolic_secant': 7,
    'cauchy': 8,
    'reciprocal': 9,
    'gumbel_max': 10,
    'gumbel_min': 11,
    'exponential': 12,
    'exponential_rev': 13,
    'gamma': 14,
    'gamma_rev': 15,
    'levy': 16,
    'levy_rev': 17,
}

# ---------------------------------------------------------------------------
# T-conorm ids — reference: generalized_renderer_cuda_kernel.cu:462-470
# (0 is the "hard" alpha aggregation mode, not a t-conorm)
# ---------------------------------------------------------------------------
ALPHA_HARD = 0
MAX_TCN = 1
PROBABILISTIC_TCN = 2
EINSTEIN_TCN = 3
HAMACHER_TCN = 4
FRANK_TCN = 5
YAGER_TCN = 6
ACZEL_ALSINA_TCN = 7
DOMBI_TCN = 8
SCHWEIZER_SKLAR_TCN = 9

AGGR_ALPHA_FUNC_MAP = {
    'hard': 0,
    'max': 1,
    'probabilistic': 2,
    'einstein': 3,
    'hamacher': 4,
    'frank': 5,
    'yager': 6,
    'aczel_alsina': 7,
    'dombi': 8,
    'schweizer_sklar': 9,
}

# RGB aggregation — reference: functional/renderer.py:64-67
RGB_HARD = 0
RGB_SOFTMAX = 1
AGGR_RGB_FUNC_MAP = {
    'hard': 0,
    'softmax': 1,
}

# Texture types — reference: functional/renderer.py:80-83
TEXTURE_SURFACE = 0
TEXTURE_VERTEX = 1
TEXTURE_TYPE_MAP = {
    'surface': 0,
    'vertex': 1,
}

# Numerical guards — reference: generalized_renderer_cuda_kernel.cu:13-17
PROBABILITY_THRESHOLD = 1e-6
NUM_STEPS_GAMMA = 32
GAMMA_THRESHOLD = 15.0
DET_EPS = 1e-10


def resolve(name_or_id: Union[str, int], table: dict) -> int:
    """Accept either a pre-mapped int id or a string name (reference quirk:
    functional/renderer.py:91-94 accepts both)."""
    if isinstance(name_or_id, str):
        return table[name_or_id]
    return int(name_or_id)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static part of the renderer configuration (hashable; jit static arg).

    Mirrors the keyword surface of ``gendr.GenDR`` (reference:
    gendr/renderer.py:13-36) minus the continuous parameters, which travel as
    traced scalars in :class:`RenderParams`.
    """

    image_size: int = 256
    dist_func: int = UNIFORM
    dist_squared: bool = False
    aggr_alpha_func: int = PROBABILISTIC_TCN
    aggr_rgb_func: int = RGB_SOFTMAX
    double_side: bool = True
    texture_type: int = TEXTURE_SURFACE
    # backend: 'pallas' (TPU production), 'xla' (pure-jnp chunked scan oracle)
    backend: str = 'xla'
    # face-chunk size for the streaming aggregation scan
    face_chunk: int = 128
    # pixel tile size for the Pallas kernel; 0 = auto.  Without per-tile
    # face compaction, 128 (a 16x8 tile, the hardware minimum) measures
    # ~2% faster than 256 at 256^2/1280f (finer tiles intersect fewer
    # face chunks and the extra mostly-empty programs are nearly free);
    # WITH compaction the culling moved into the per-tile slab, so bigger
    # 16x16 tiles amortize the loop and measure 24%% faster (0.841 vs
    # 1.076 ms headline).  Auto picks 256 when compaction is eligible,
    # 128 otherwise.
    pixel_tile: int = 0
    # 'rgba' (reference semantics) or 'alpha' (silhouette-only fast path:
    # skips depth/RGB work entirely; RGB outputs are the background)
    channels: str = 'rgba'
    # what to do when backend='pallas' cannot run a config (surface TS > 36,
    # or a non-128-tileable image size on real TPUs): 'silent' routes to the
    # XLA backend, 'warn' additionally emits a RuntimeWarning, 'error' raises
    on_fallback: str = 'silent'
    # per-tile face compaction ('auto' | 'off'): the prepass gathers each
    # pixel tile's hit faces (octet-granular) into one dedicated 128-lane
    # chunk appended to the packed array, so the kernels visit ~1 chunk per
    # active tile instead of every Morton chunk whose 128-face slab grazes
    # it (measured 3.2x fewer chunk iterations on the 256^2/1280f headline
    # scene).  'auto' enables it for the per-lane-deferred alpha families
    # (hard/max/probabilistic/einstein — the parametric fold families keep
    # the chunk-granular path so their fold tree stays bitwise-aligned
    # with the XLA twin) on single-shard renders with small packed rows;
    # see pallas_backend._compact_eligible for the exact gate.
    compact: str = 'auto'
    # NOTE: a bf16 per-pair compute mode (packed distance/coverage math)
    # was built, hardware-validated, and REMOVED in round 4: measured on a
    # v5e it was 19-24% SLOWER than f32 at both 1.3k and 20k faces — the
    # f32 upcasts before every mask-producing compare (a Mosaic
    # i1-relayout constraint: 16- and 32-bit mask tilings cannot mix) eat
    # the 2x packing win, and only ~15 of the ~55 per-pair ops are
    # packable FMAs to begin with (a <=13% ceiling).  See docs/DESIGN.md
    # perf journal for the measurements.

    @classmethod
    def create(cls, image_size=256, dist_func='uniform', dist_squared=False,
               aggr_alpha_func='probabilistic', aggr_rgb_func='softmax',
               double_side=True, texture_type='surface', backend='xla',
               face_chunk=128, pixel_tile=0,
               channels='rgba', on_fallback='silent',
               compact='auto') -> 'RenderConfig':
        assert on_fallback in ('silent', 'warn', 'error'), on_fallback
        assert compact in ('auto', 'off'), compact
        return cls(
            image_size=int(image_size),
            dist_func=resolve(dist_func, DIST_FUNC_MAP),
            dist_squared=bool(dist_squared),
            aggr_alpha_func=resolve(aggr_alpha_func, AGGR_ALPHA_FUNC_MAP),
            aggr_rgb_func=resolve(aggr_rgb_func, AGGR_RGB_FUNC_MAP),
            double_side=bool(double_side),
            texture_type=resolve(texture_type, TEXTURE_TYPE_MAP),
            backend=backend,
            face_chunk=int(face_chunk),
            pixel_tile=int(pixel_tile),
            channels=channels,
            on_fallback=on_fallback,
            compact=compact,
        )


@dataclasses.dataclass
class RenderParams:
    """Continuous render parameters (traced; changing them never recompiles).

    Defaults follow the reference (functional/renderer.py:18-38), with the
    ``None`` defaults for dist_shape/dist_shift/t_conorm_p normalized to 0.0
    (the reference forwards ``None`` into float-typed pybind args, which every
    in-repo caller avoids by passing numbers; see SURVEY.md §5).
    """

    dist_scale: float = 1e-2
    dist_shape: float = 0.0
    dist_shift: float = 0.0
    dist_eps: float = 1e4
    aggr_alpha_t_conorm_p: float = 0.0
    aggr_rgb_eps: float = 1e-3
    aggr_rgb_gamma: float = 1e-3
    near: float = 1.0
    far: float = 100.0
    background_color: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    def __post_init__(self):
        if self.dist_shape is None:
            self.dist_shape = 0.0
        if self.dist_shift is None:
            self.dist_shift = 0.0
        if self.aggr_alpha_t_conorm_p is None:
            self.aggr_alpha_t_conorm_p = 0.0
