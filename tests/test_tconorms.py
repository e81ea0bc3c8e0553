"""T-conorm axioms + aggregate-inverse backward consistency tests."""

import numpy as np
import pytest

from gendr_tpu import config as C
from gendr_tpu.ops import tconorms as T

# (id, valid p)
CONFIGS = [
    (C.MAX_TCN, 0.0),
    (C.PROBABILISTIC_TCN, 0.0),
    (C.EINSTEIN_TCN, 0.0),
    (C.HAMACHER_TCN, 0.5),
    (C.HAMACHER_TCN, 2.0),
    (C.FRANK_TCN, 0.5),
    (C.FRANK_TCN, 3.0),
    (C.YAGER_TCN, 0.5),
    (C.YAGER_TCN, 2.0),
    (C.ACZEL_ALSINA_TCN, 0.5),
    (C.ACZEL_ALSINA_TCN, 2.0),
    (C.DOMBI_TCN, 2.0),
    (C.SCHWEIZER_SKLAR_TCN, -1.0),
    (C.SCHWEIZER_SKLAR_TCN, -2.5),
]

VALS = np.array([0.0, 0.05, 0.3, 0.5, 0.77, 0.95, 0.999])


@pytest.mark.parametrize('tid,p', CONFIGS)
class TestAxioms:
    def test_commutative(self, tid, p):
        for a in VALS:
            for b in VALS:
                x = T.t_conorm_forward(tid, a, b, 0, p)
                y = T.t_conorm_forward(tid, b, a, 0, p)
                assert abs(x - y) < 1e-5, (a, b)

    def test_neutral_zero(self, tid, p):
        # folding a masked-out face (b=0) must be the identity
        for a in VALS:
            x = T.t_conorm_forward(tid, a, 0.0, 0, p)
            np.testing.assert_allclose(x, a, atol=2e-6)

    def test_bounds_and_monotone(self, tid, p):
        for a in VALS:
            prev = -1.0
            for b in VALS:
                x = T.t_conorm_forward(tid, a, b, 0, p)
                assert -1e-6 <= x <= 1 + 1e-6
                assert x >= max(a, b) - 1e-5  # t-conorm dominates max
                assert x >= prev - 1e-5
                prev = x

    def test_backward_matches_fd(self, tid, p):
        """aggregate_backward(A, b) should approximate dA/db where A is the
        fold of several coverages (exact for these t-conorms by design)."""
        if tid == C.MAX_TCN:
            return  # subgradient, checked separately
        others = [0.2, 0.55, 0.8]
        h = 1e-4
        for b in [0.1, 0.4, 0.7]:
            def agg(bv):
                a = 0.0
                for o in others + [bv]:
                    a = T.t_conorm_forward(tid, a, o, 0, p)
                return a
            A = agg(b)
            fd = (agg(b + h) - agg(b - h)) / (2 * h)
            got = T.t_conorm_backward(tid, A, b, 4, p)
            np.testing.assert_allclose(got, fd, rtol=5e-2, atol=5e-3)


def test_max_backward_tie():
    # reference: exact equality test (cu:574-575)
    assert T.t_conorm_backward(C.MAX_TCN, 0.7, 0.7, 1, 0.0) == 1.0
    assert T.t_conorm_backward(C.MAX_TCN, 0.7, 0.4, 1, 0.0) == 0.0


def test_probabilistic_known_values():
    assert abs(T.t_conorm_forward(C.PROBABILISTIC_TCN, 0.5, 0.5) - 0.75) < 1e-6
    assert abs(T.t_conorm_forward(C.EINSTEIN_TCN, 0.5, 0.5) - 0.8) < 1e-6
