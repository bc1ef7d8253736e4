"""Spline linear-map tests.

Oracle 1: a direct numpy transcription of the reference algorithm
(dial-core.h:69-290) evaluated pointwise — the linear-map matrices must
reproduce it to float64 precision for arbitrary data.
Oracle 2: scipy natural CubicSpline for the `tail_slope="natural"` mode.
"""

import numpy as np
import pytest
from scipy.interpolate import CubicSpline

from tpu_dialmpc.core import spline


def _reference_interp(states, knot_times, query_times, tail_slope="ref"):
    """Pointwise natural-cubic-Hermite interpolation, mirroring dial-core.h:69-290."""
    states = np.asarray(states, dtype=np.float64)
    t = np.asarray(knot_times, dtype=np.float64)
    q = np.asarray(query_times, dtype=np.float64)
    n, m = states.shape
    h = np.diff(t)

    # Tridiagonal solve for second derivatives (natural BC), dial-core.h:124-169.
    second = np.zeros((n, m))
    for mi in range(m):
        alpha = np.zeros(n)
        for i in range(1, n - 1):
            alpha[i] = 3.0 * (
                (states[i + 1, mi] - states[i, mi]) / h[i]
                - (states[i, mi] - states[i - 1, mi]) / h[i - 1]
            )
        l = np.zeros(n)
        mu = np.zeros(n)
        z = np.zeros(n)
        l[0] = 1.0
        for i in range(1, n - 1):
            l[i] = 2.0 * (t[i + 1] - t[i - 1]) - h[i - 1] * mu[i - 1]
            mu[i] = h[i] / l[i]
            z[i] = (alpha[i] - h[i - 1] * z[i - 1]) / l[i]
        for i in range(n - 2, -1, -1):
            second[i, mi] = z[i] - mu[i] * second[i + 1, mi]

    # Knot slopes, dial-core.h:186-215 (incl. the duplicated-tail-slope quirk).
    first = np.zeros((n, m))
    for mi in range(m):
        for i in range(n - 1):
            first[i, mi] = (states[i + 1, mi] - states[i, mi]) / h[i] - (
                h[i] / 6.0
            ) * (2.0 * second[i, mi] + second[i + 1, mi])
        if tail_slope == "ref":
            first[n - 1, mi] = (states[n - 1, mi] - states[n - 2, mi]) / h[
                n - 2
            ] - (h[n - 2] / 6.0) * (2.0 * second[n - 2, mi] + second[n - 1, mi])
        else:
            first[n - 1, mi] = (states[n - 1, mi] - states[n - 2, mi]) / h[
                n - 2
            ] + (h[n - 2] / 6.0) * (second[n - 2, mi] + 2.0 * second[n - 1, mi])

    # Hermite evaluation with forward interval scan, dial-core.h:244-287.
    out = np.zeros((q.shape[0], m))
    interval = 0
    for k, tq in enumerate(q):
        while interval < n - 2 and tq > t[interval + 1]:
            interval += 1
        i = min(interval, n - 2)
        hi = t[i + 1] - t[i]
        u = (tq - t[i]) / hi
        u2, u3 = u * u, u**3
        h00 = 2 * u3 - 3 * u2 + 1
        h10 = u3 - 2 * u2 + u
        h01 = -2 * u3 + 3 * u2
        h11 = u3 - u2
        out[k] = (
            states[i] * h00
            + hi * first[i] * h10
            + states[i + 1] * h01
            + hi * first[i + 1] * h11
        )
    return out


@pytest.mark.parametrize("hnode,hsample", [(4, 16), (5, 25), (2, 7)])
def test_node2u_matches_reference_algorithm(hnode, hsample):
    rng = np.random.default_rng(0)
    ctrl_dt = 0.02
    nodes = rng.standard_normal((hnode + 1, 12))
    tmax = ctrl_dt * hsample
    tk = spline.uniform_grid(hnode, tmax)
    tq = spline.uniform_grid(hsample, tmax)
    want = _reference_interp(nodes, tk, tq)
    got = spline.node2u_matrix(hnode, hsample, ctrl_dt) @ nodes
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("hnode,hsample", [(4, 16), (5, 25)])
def test_u2node_matches_reference_algorithm(hnode, hsample):
    rng = np.random.default_rng(1)
    ctrl_dt = 0.02
    us = rng.standard_normal((hsample + 1, 12))
    tmax = ctrl_dt * hsample
    tk = spline.uniform_grid(hsample, tmax)
    tq = spline.uniform_grid(hnode, tmax)
    want = _reference_interp(us, tk, tq)
    got = spline.u2node_matrix(hnode, hsample, ctrl_dt) @ us
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_shift_matrix_matches_composed_reference():
    """shift = u2node(roll(node2u(Y))) with zero-filled tail (dial-core.h:621-633)."""
    rng = np.random.default_rng(2)
    hnode, hsample, ctrl_dt = 5, 25, 0.02
    y = rng.standard_normal((hnode + 1, 12))
    tmax = ctrl_dt * hsample
    tn = spline.uniform_grid(hnode, tmax)
    tu = spline.uniform_grid(hsample, tmax)
    u = _reference_interp(y, tn, tu)
    u_shifted = np.vstack([u[1:], np.zeros((1, u.shape[1]))])
    want = _reference_interp(u_shifted, tu, tn)
    got = spline.shift_matrix(hnode, hsample, ctrl_dt) @ y
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_natural_mode_matches_scipy_interior():
    """tail_slope='natural' must agree with scipy's natural cubic spline everywhere."""
    rng = np.random.default_rng(3)
    t = np.linspace(0.0, 1.0, 6)
    y = rng.standard_normal((6, 3))
    q = np.linspace(0.0, 1.0, 41)
    A = spline.interp_matrix(t, q, tail_slope="natural")
    cs = CubicSpline(t, y, bc_type="natural")
    np.testing.assert_allclose(A @ y, cs(q), atol=1e-10)


def test_ref_mode_differs_from_natural_but_agrees_at_knots():
    """'ref' replicates the C++'s halved-curvature + duplicated-tail-slope spline.

    Both modes interpolate the knots exactly, but differ between knots.
    """
    rng = np.random.default_rng(4)
    t = np.linspace(0.0, 1.0, 6)
    y = rng.standard_normal((6, 2))
    q = np.linspace(0.0, 1.0, 101)
    a_ref = spline.interp_matrix(t, q, tail_slope="ref")
    a_nat = spline.interp_matrix(t, q, tail_slope="natural")
    np.testing.assert_allclose(
        spline.interp_matrix(t, t, tail_slope="ref") @ y, y, atol=1e-12
    )
    np.testing.assert_allclose(
        spline.interp_matrix(t, t, tail_slope="natural") @ y, y, atol=1e-12
    )
    assert np.max(np.abs((a_ref - a_nat) @ y)) > 1e-6


def test_interpolation_reproduces_knots():
    rng = np.random.default_rng(5)
    t = spline.uniform_grid(5, 0.5)
    y = rng.standard_normal((6, 4))
    A = spline.interp_matrix(t, t)
    np.testing.assert_allclose(A @ y, y, atol=1e-12)


def test_linear_mode_matches_np_interp():
    """spline_mode='linear' (reference's unused piecewiseLinearInterpolate,
    dial-core.h:292-340) equals np.interp on interior queries."""
    import numpy as np
    from tpu_dialmpc.core import spline

    t = spline.uniform_grid(4, 1.0)
    q = spline.uniform_grid(16, 1.0)
    A = spline.interp_matrix_linear(t, q)
    rng = np.random.default_rng(0)
    y = rng.normal(size=t.shape[0])
    np.testing.assert_allclose(A @ y, np.interp(q, t, y), atol=1e-12)
    # plumbed through the planner transforms
    A2 = spline.node2u_matrix(4, 16, 1.0 / 16.0, "linear")
    np.testing.assert_allclose(A2, A, atol=1e-12)
