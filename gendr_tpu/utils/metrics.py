"""Training metrics utilities.

``AverageMeter`` mirrors the reference's meter
(experiments/train_reconstruction.py:48-63); ``Timer`` wraps reliable
device timing (on tunneled TPU backends ``block_until_ready`` can return
before device work completes, so a host fetch is the barrier — see
bench.py).
"""

from __future__ import annotations

import time

import numpy as np


class AverageMeter:
    """Computes and stores the average and current value."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class Timer:
    """Median wall-clock of a jitted function with a hard device barrier."""

    @staticmethod
    def sync(tree):
        import jax
        leaves = jax.tree_util.tree_leaves(tree)
        if leaves:
            np.asarray(leaves[0]).ravel()[:1]
        return tree

    @staticmethod
    def timeit(fn, *args, iters=20, repeats=3):
        out = fn(*args)
        Timer.sync(out)
        best = float('inf')
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            Timer.sync(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best
