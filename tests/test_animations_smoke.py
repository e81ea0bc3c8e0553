"""Smoke tests for the animation / regression-sweep scripts.

The reference validates its renderer qualitatively through these sweeps
(SURVEY.md §4: animations/ is the de-facto visual regression suite); these
run miniature versions end-to-end and sanity-check the emitted artifacts.
"""

import os
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
def test_triangles_dist_sweep(tmp_path):
    run_script('animations/triangles_dist.py',
               ['--quick', '--resolution', '32', '--dists', '2',
                '--out-dir', str(tmp_path)])
    pngs = [f for f in os.listdir(tmp_path) if f.endswith('.png')]
    # 2 distributions x 14 quick taus
    assert len(pngs) == 28, sorted(pngs)[:5]


def test_distributions_to_csv(tmp_path):
    mod = run_script('animations/distributions_to_csv.py',
                     ['--out', str(tmp_path / 'dist.csv'),
                      '--points', '32'])
    path = tmp_path / 'dist.csv'
    assert path.exists()
    lines = path.read_text().strip().splitlines()
    assert len(lines) > 10
    # CDF columns must be finite and within [0, 1] (+ small epsilon)
    data = np.genfromtxt(str(path), delimiter=',', names=True)
    for name in data.dtype.names:
        if name.startswith('cdf'):
            col = data[name]
            assert np.isfinite(col).all(), name
            assert (col > -1e-5).all() and (col < 1 + 1e-5).all(), name


def test_t_conorm_surfaces(tmp_path):
    run_script('animations/t_conorms.py',
               ['--out-dir', str(tmp_path), '--points', '17'])
    csvs = [f for f in os.listdir(tmp_path) if f.endswith('.csv')]
    assert len(csvs) >= 9, csvs
