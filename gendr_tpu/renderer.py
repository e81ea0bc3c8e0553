"""GenDR: the configured renderer object.

API parity with the reference's ``gendr.GenDR`` nn.Module
(gendr/renderer.py:12-125): same constructor keywords and defaults, mutable
``dist_scale`` for tau-annealing loops, 2x supersampled anti-aliasing, and a
raw-tensor ``forward_tensors`` variant.
"""

from __future__ import annotations

import jax.numpy as jnp

from gendr_tpu.raster.render import render


def _avg_pool2(images):
    """2x2 average pooling, stride 2, NCHW (renderer.py:92-93)."""
    b, c, h, w = images.shape
    return images.reshape(b, c, h // 2, 2, w // 2, 2).mean(axis=(3, 5))


class GenDR:
    def __init__(self,
                 image_size=256,
                 background_color=(0, 0, 0),
                 anti_aliasing=False,
                 #
                 dist_func='uniform',
                 dist_scale=1e-2,
                 dist_squared=False,
                 dist_shape=None,
                 dist_shift=None,
                 dist_eps=1e4,
                 #
                 aggr_alpha_func='probabilistic',
                 aggr_alpha_t_conorm_p=None,
                 #
                 aggr_rgb_func='softmax',
                 aggr_rgb_eps=1e-3,
                 aggr_rgb_gamma=1e-3,
                 #
                 near=1,
                 far=100,
                 double_side=False,
                 texture_type='surface',
                 #
                 backend='xla',
                 face_chunk=128,
                 pixel_tile=0,
                 channels='rgba',
                 on_fallback='silent',
                 ):
        if aggr_rgb_func not in ['hard', 'softmax', 0, 1]:
            raise ValueError(
                'Aggregate function (RGB) currently only supports hard and '
                'softmax.')
        if texture_type not in ['surface', 'vertex']:
            raise ValueError('Texture type only support surface and vertex.')

        self.image_size = image_size
        self.background_color = background_color
        self.anti_aliasing = anti_aliasing

        self.dist_func = dist_func
        self.dist_scale = dist_scale
        self.dist_squared = dist_squared
        self.dist_shape = dist_shape
        self.dist_shift = dist_shift
        self.dist_eps = dist_eps

        self.aggr_alpha_func = aggr_alpha_func
        self.aggr_alpha_t_conorm_p = aggr_alpha_t_conorm_p

        self.aggr_rgb_func = aggr_rgb_func
        self.aggr_rgb_eps = aggr_rgb_eps
        self.aggr_rgb_gamma = aggr_rgb_gamma

        self.near = near
        self.far = far
        self.double_side = double_side
        self.texture_type = texture_type

        self.backend = backend
        self.face_chunk = face_chunk
        self.pixel_tile = pixel_tile
        self.channels = channels
        self.on_fallback = on_fallback

    def __call__(self, mesh):
        return self.forward_tensors(mesh.face_vertices, mesh.face_textures)

    forward = __call__

    def forward_tensors(self, face_vertices, face_textures):
        image_size = self.image_size * (2 if self.anti_aliasing else 1)
        images = render(
            face_vertices=face_vertices,
            textures=face_textures,
            image_size=image_size,
            background_color=self.background_color,
            dist_func=self.dist_func,
            dist_scale=self.dist_scale,
            dist_squared=self.dist_squared,
            dist_shape=self.dist_shape,
            dist_shift=self.dist_shift,
            dist_eps=self.dist_eps,
            aggr_alpha_func=self.aggr_alpha_func,
            aggr_alpha_t_conorm_p=self.aggr_alpha_t_conorm_p,
            aggr_rgb_func=self.aggr_rgb_func,
            aggr_rgb_eps=self.aggr_rgb_eps,
            aggr_rgb_gamma=self.aggr_rgb_gamma,
            near=self.near,
            far=self.far,
            double_side=self.double_side,
            texture_type=self.texture_type,
            backend=self.backend,
            face_chunk=self.face_chunk,
            pixel_tile=self.pixel_tile,
            channels=self.channels,
            on_fallback=self.on_fallback,
        )
        if self.anti_aliasing:
            images = _avg_pool2(images)
        return images
