"""Convergence smoke tests for the three experiments (tiny configs).

The reference validates itself through these experiments' metrics
(SURVEY.md §4); these are their miniature equivalents.
"""

import runpy
import sys

import numpy as np
import pytest


def run_script(path, argv):
    old = sys.argv
    sys.argv = [path] + argv
    try:
        return runpy.run_path(path, run_name='__main__')
    finally:
        sys.argv = old


@pytest.mark.slow
def test_opt_shape_quick(tmp_path):
    # procedural 12-face cube target: the smoke test exercises the whole
    # pipeline; convergence quality is validated on TPU runs
    mod = run_script('experiments/opt_shape.py',
                     ['--quick', '-ni', '4', '-is', '24', '--chain', '4',
                      '--model_obj', 'proc_cube.obj',
                      '--views', '24@0', '--out-dir', str(tmp_path)])


@pytest.mark.slow
def test_opt_camera_quick(tmp_path):
    run_script('experiments/opt_camera.py',
               ['--quick', '-is', '24', '-ni', '10', '-bs', '4',
                '--chain', '5', '--model_obj', 'proc_cube.obj',
                '--out-dir', str(tmp_path)])


@pytest.mark.slow
def test_train_reconstruction_synthetic(tmp_path):
    run_script('experiments/train_reconstruction.py',
               ['--quick', '--synthetic', '--image_size', '32',
                '--num_iterations', '4', '--batch_size', '4',
                '--max-eval-batches', '1'])


@pytest.mark.slow
def test_train_reconstruction_checkpoint_resume(tmp_path):
    """Checkpoints save at eval_freq and restore on restart (the reference
    never saves its model; this is the orbax addition)."""
    ckpt = str(tmp_path / 'ckpt')
    argv = ['--quick', '--synthetic', '--image_size', '16',
            '--num_iterations', '4', '--batch_size', '2',
            '--max-eval-batches', '1', '--checkpoint-dir', ckpt]
    run_script('experiments/train_reconstruction.py', argv)
    import os
    steps = [d for d in os.listdir(ckpt) if d.isdigit()]
    assert steps, os.listdir(ckpt)
    # second run restores and resumes past the saved step (no retraining:
    # start_iter == num_iterations + 1 -> straight to final eval)
    run_script('experiments/train_reconstruction.py', argv)


def test_shape_model_parametrization():
    """The sigmoid reparametrization reproduces the template at zero
    displacement (opt_shape.py:75-87)."""
    sys.path.insert(0, '.')
    from experiments.opt_shape import ShapeModel
    import jax.numpy as jnp
    m = ShapeModel(642)
    params = m.init_params()
    verts, faces, lap, flat = m(params, 2)
    np.testing.assert_allclose(np.asarray(verts[0]),
                               np.asarray(m.base_vertices), atol=1e-5)
    assert verts.shape[0] == 2
    assert float(lap) >= 0 and float(flat) >= 0


def test_default_dist_scale_table():
    sys.path.insert(0, '.')
    from experiments.train_reconstruction import default_dist_scale
    # spot-check against train_reconstruction.py:556-574
    assert default_dist_scale('uniform', False, 'probabilistic', 0.0) == \
        pytest.approx(10 ** -1.5)
    assert default_dist_scale('logistic', True, 'yager', 2.0) == \
        pytest.approx(10 ** -4.0)
    assert default_dist_scale('cauchy', True, 'probabilistic', 0.0) == \
        pytest.approx(10 ** -4.5)
    with pytest.raises(AssertionError):
        default_dist_scale('levy', False, 'probabilistic', 0.0)
