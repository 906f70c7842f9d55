"""Unit tests for the quaternion/integrator math core (vs numpy oracles and
the reference formulas in /root/reference/utils/maths.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visfly_tpu.core import quaternion as quat


@pytest.fixture(autouse=True)
def x64():
    """Run these tests in float64 without leaking the flag to other modules
    (a module-level config.update would flip global state at collection)."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def random_unit_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_mul_identity(rng):
    q = random_unit_quats(rng, 16)
    e = quat.identity((16,), jnp.float64)
    np.testing.assert_allclose(quat.mul(e, q), q, atol=1e-12)
    np.testing.assert_allclose(quat.mul(q, e), q, atol=1e-12)


def test_mul_matches_rotation_composition(rng):
    q1 = random_unit_quats(rng, 8)
    q2 = random_unit_quats(rng, 8)
    r = quat.to_rotation_matrix(jnp.asarray(quat.mul(q1, q2)))
    r_comp = jnp.einsum(
        "nij,njk->nik",
        quat.to_rotation_matrix(jnp.asarray(q1)),
        quat.to_rotation_matrix(jnp.asarray(q2)),
    )
    np.testing.assert_allclose(r, r_comp, atol=1e-12)


def test_rotate_matches_matrix(rng):
    q = jnp.asarray(random_unit_quats(rng, 32))
    v = jnp.asarray(rng.normal(size=(32, 3)))
    np.testing.assert_allclose(
        quat.rotate(q, v),
        jnp.einsum("nij,nj->ni", quat.to_rotation_matrix(q), v),
        atol=1e-12,
    )


def test_inv_rotate_is_inverse(rng):
    q = jnp.asarray(random_unit_quats(rng, 32))
    v = jnp.asarray(rng.normal(size=(32, 3)))
    np.testing.assert_allclose(quat.inv_rotate(q, quat.rotate(q, v)), v, atol=1e-12)


def test_euler_roundtrip(rng):
    rpy = rng.uniform(-1.2, 1.2, size=(64, 3))
    q = quat.from_euler(rpy[:, 0], rpy[:, 1], rpy[:, 2], order="zyx")
    back = quat.to_euler(jnp.asarray(q), order="zyx")
    np.testing.assert_allclose(back, rpy, atol=1e-10)


def test_x_axis_matches_matrix_column(rng):
    q = jnp.asarray(random_unit_quats(rng, 16))
    r = quat.to_rotation_matrix(q)
    np.testing.assert_allclose(quat.x_axis(q), r[:, :, 0], atol=1e-12)


def test_yaw_extraction(rng):
    yaw = rng.uniform(-np.pi, np.pi, size=(32,))
    q = quat.from_euler(np.zeros(32), np.zeros(32), yaw, order="zyx")
    np.testing.assert_allclose(quat.yaw(jnp.asarray(q)), yaw, atol=1e-10)


def test_omega_derivative_preserves_norm_to_first_order(rng):
    q = jnp.asarray(random_unit_quats(rng, 8))
    omega = jnp.asarray(rng.normal(size=(8, 3)))
    dq = quat.omega_derivative(q, omega)
    # d|q|²/dt = 2 q·dq = 0 for pure-imaginary body-rate quaternions
    np.testing.assert_allclose(jnp.sum(q * dq, axis=-1), 0.0, atol=1e-12)


def test_vmap_and_jit_compose(rng):
    q = jnp.asarray(random_unit_quats(rng, 4 * 5).reshape(4, 5, 4))
    v = jnp.asarray(rng.normal(size=(4, 5, 3)))
    direct = quat.rotate(q, v)
    vmapped = jax.jit(jax.vmap(quat.rotate))(q, v)
    np.testing.assert_allclose(direct, vmapped, atol=1e-12)


def test_grad_flows_through_rotate(rng):
    q = jnp.asarray(random_unit_quats(rng, 4))
    v = jnp.asarray(rng.normal(size=(4, 3)))

    def loss(qq):
        return jnp.sum(quat.rotate(quat.normalize(qq), v) ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
