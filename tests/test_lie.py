"""SO(3)/SE(3) tests: group properties, roundtrips, small-angle stability,
and gradient finiteness (the reference's lieutils.py is untested dead code)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.lie import (
    se3_exp,
    se3_hat,
    se3_log,
    se3_vee,
    so3_exp,
    so3_hat,
    so3_log,
    so3_vee,
)


def test_hat_vee_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(so3_vee(so3_hat(w))), np.asarray(w))
    xi = jnp.asarray(rng.standard_normal((5, 6)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(se3_vee(se3_hat(xi))), np.asarray(xi))


def test_so3_exp_is_rotation(rng):
    w = jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))
    R = np.asarray(so3_exp(w))
    eye = np.eye(3)
    for r in R:
        np.testing.assert_allclose(r @ r.T, eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = jnp.asarray((rng.standard_normal((8, 3)) * 0.8).astype(np.float32))
    w2 = np.asarray(so3_log(so3_exp(w)))
    np.testing.assert_allclose(w2, np.asarray(w), rtol=1e-3, atol=1e-4)


def test_so3_exp_matches_rodrigues_90deg():
    w = jnp.array([[0.0, 0.0, np.pi / 2]], jnp.float32)
    R = np.asarray(so3_exp(w))[0]
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-5)


def test_small_angle_stability_and_grads():
    w = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
    R = np.asarray(so3_exp(w))
    np.testing.assert_allclose(R, np.stack([np.eye(3)] * 2), atol=1e-6)
    g = jax.grad(lambda w: jnp.sum(so3_exp(w)))(jnp.zeros((3,)))
    assert np.isfinite(np.asarray(g)).all()
    g6 = jax.grad(lambda x: jnp.sum(se3_exp(x)))(jnp.zeros((6,)))
    assert np.isfinite(np.asarray(g6)).all()


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray((rng.standard_normal((6, 6)) * 0.5).astype(np.float32))
    T = np.asarray(se3_exp(xi))
    # proper rigid transforms
    np.testing.assert_allclose(T[:, 3, :], np.tile([0, 0, 0, 1.0], (6, 1)), atol=1e-6)
    xi2 = np.asarray(se3_log(se3_exp(xi)))
    np.testing.assert_allclose(xi2, np.asarray(xi), rtol=1e-3, atol=1e-3)


def test_se3_pure_translation():
    xi = jnp.array([[1.0, 2.0, 3.0, 0.0, 0.0, 0.0]], jnp.float32)
    T = np.asarray(se3_exp(xi))[0]
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)


def test_so3_log_near_pi():
    """The antisymmetric-part formula cancels at theta -> pi; the pi branch
    must recover the axis from the symmetric part (code-review finding)."""
    # exact 180 degrees about x
    R = jnp.diag(jnp.array([1.0, -1.0, -1.0]))
    w = np.asarray(so3_log(R[None]))[0]
    np.testing.assert_allclose(np.abs(w), [np.pi, 0, 0], atol=1e-5)
    # near-pi arbitrary axes: exp(log(R)) must reproduce R
    rng = np.random.default_rng(3)
    for theta_deg in [179.999, 180.0]:
        a = rng.standard_normal(3)
        a /= np.linalg.norm(a)
        w_in = jnp.asarray(a * np.deg2rad(theta_deg), jnp.float32)[None]
        R = so3_exp(w_in)
        R2 = so3_exp(so3_log(R))
        # f32 arccos near trace=-1 limits theta recovery to ~sqrt(eps_f32)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-3)
