"""gendr_tpu — a TPU-native generalized differentiable renderer.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
Felix-Petersen/gendr (CVPR 2022, arXiv 2204.13845): a generalized soft
rasterizer with an 18-distribution occlusion-test zoo and a 9-t-conorm
alpha-aggregation zoo, plus mesh/camera/lighting utilities, mesh
regularization losses, OBJ I/O, a solid voxelizer, and the reference's three
research experiments — all built TPU-first (static shapes, streaming
face-chunk aggregation, fused elementwise epilogues, deterministic gradient
reductions, `jax.sharding` multi-chip scaling).
"""

from gendr_tpu.config import RenderConfig, RenderParams  # noqa: F401
from gendr_tpu.geometry.mesh import Mesh  # noqa: F401
from gendr_tpu.geometry.transforms import (  # noqa: F401
    LookAt, Look, Projection)
from gendr_tpu.geometry.lighting import (  # noqa: F401
    AmbientLighting, DirectionalLighting, Lighting)
from gendr_tpu.geometry.losses import LaplacianLoss, FlattenLoss  # noqa: F401
from gendr_tpu.renderer import GenDR  # noqa: F401
from gendr_tpu import functional  # noqa: F401

__version__ = '0.1.0'
