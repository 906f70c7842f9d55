"""Dynamics parity vs the reference implementation (BASELINE.md target:
≤1e-5 agreement over 256-step rollouts for all action modes).

The reference (`/root/reference/envs/base/dynamics.py`) is imported at test
time from its read-only mount and driven with identical initial states and
action sequences. Both sides run in float64 so the comparison measures
*semantic* agreement, not accumulation noise.

Reference quirks encountered (documented, not bugs in this repo):
* rk4 in the reference calls `_get_derivatives` without the required `wind`
  argument (`utils/maths.py:370-379`) → TypeError; rk4 reference parity is
  therefore untestable and our rk4 is validated against a numpy oracle.
* the float-modulo ctrl_dt/dt check (`dynamics.py:71-72`) only passes in
  float64 for dt values whose multiple is binary-exact (0.03/0.0075 etc.).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def x64():
    """Float64 for parity tests only — scoped so the flag does not leak into
    other test modules (jit caches elsewhere assume f32)."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)

from visfly_tpu.dynamics import (  # noqa: E402
    DroneConfig,
    full_state,
    init_state,
    make_drone_params,
    reset,
    step,
)

N = 7
STEPS = 256
TOL = 1e-5


@pytest.fixture(scope="module")
def torch64():
    import torch as th

    th.set_default_dtype(th.float64)
    yield th
    th.set_default_dtype(th.float32)


@pytest.fixture(scope="module")
def ref_dynamics_cls(torch64):
    import os
    import sys

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, "/root")
    from reference.envs.base.dynamics import Dynamics

    return Dynamics


def _initial_states(rng):
    pos = rng.uniform(-3, 3, size=(N, 3))
    pos[:, 2] = rng.uniform(1.0, 4.0, size=N)
    q = rng.normal(size=(N, 4)) * 0.1 + np.array([1.0, 0, 0, 0])
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    vel = rng.uniform(-1, 1, size=(N, 3))
    omega = rng.uniform(-0.3, 0.3, size=(N, 3))
    return pos, q, vel, omega


def _run_reference(Dynamics, torch, mode, dt, ctrl_dt, actions, init, ctrl_delay=True,
                   comm_delay=0.06, integrator="euler"):
    dyn = Dynamics(
        num=N,
        action_type=mode,
        dt=dt,
        ctrl_dt=ctrl_dt,
        ctrl_delay=ctrl_delay,
        comm_delay=comm_delay,
        integrator=integrator,
        cfg="drone_state",
    )
    # copy: the reference integrator updates state tensors in place
    # (`maths.py:344-347`), and torch.as_tensor aliases numpy memory — without
    # the copy the caller's init arrays would be silently mutated.
    pos, q, vel, omega = (torch.as_tensor(np.copy(x)) for x in init)
    dyn.reset(pos=pos, ori=q, vel=vel, ori_vel=omega)
    states = []
    for a in actions:
        dyn.step(torch.as_tensor(a))
        states.append(dyn.full_state.detach().numpy())
    return np.stack(states)


def _run_ours(mode, dt, ctrl_dt, actions, init, ctrl_delay=True, comm_delay=0.06,
              integrator="euler"):
    config = DroneConfig(
        action_type=mode,
        dt=dt,
        ctrl_dt=ctrl_dt,
        ctrl_delay=ctrl_delay,
        comm_delay=comm_delay,
        integrator=integrator,
        cfg="drone_state",
    )
    params = make_drone_params(config, dtype=jnp.float64)
    state = init_state(config, params, N, dtype=jnp.float64)
    pos, q, vel, omega = (jnp.asarray(x) for x in init)
    state = reset(config, params, state, pos=pos, ori=q, vel=vel, ori_vel=omega)

    step_fn = jax.jit(lambda s, a: step(config, params, s, a))
    states = []
    for a in actions:
        state = step_fn(state, jnp.asarray(a))
        states.append(np.asarray(full_state(state)))
    return np.stack(states)


@pytest.mark.parametrize("mode", ["bodyrate", "thrust", "velocity", "position"])
def test_mode_parity_256_steps(ref_dynamics_cls, torch64, mode):
    rng = np.random.default_rng(42)
    init = _initial_states(rng)
    actions = rng.uniform(-1, 1, size=(STEPS, N, 4))

    ref = _run_reference(ref_dynamics_cls, torch64, mode, 0.03, 0.03, actions, init)
    ours = _run_ours(mode, 0.03, 0.03, actions, init)

    err = np.abs(ref - ours).max()
    assert err <= TOL, f"mode={mode} max |Δfull_state| = {err:.3e} > {TOL}"


def test_substep_parity_euler(ref_dynamics_cls, torch64):
    """Multi-substep config: dt=0.0075, ctrl_dt=0.03 → 4 inner steps."""
    rng = np.random.default_rng(7)
    init = _initial_states(rng)
    actions = rng.uniform(-1, 1, size=(STEPS, N, 4))

    ref = _run_reference(ref_dynamics_cls, torch64, "bodyrate", 0.0075, 0.03, actions, init)
    ours = _run_ours("bodyrate", 0.0075, 0.03, actions, init)
    err = np.abs(ref - ours).max()
    assert err <= TOL, f"max |Δfull_state| = {err:.3e}"


def test_no_ctrl_delay_parity(ref_dynamics_cls, torch64):
    """ctrl_delay=False (no motor lag) and comm_delay=0 (no FIFO)."""
    rng = np.random.default_rng(11)
    init = _initial_states(rng)
    actions = rng.uniform(-1, 1, size=(64, N, 4))

    ref = _run_reference(
        ref_dynamics_cls, torch64, "bodyrate", 0.03, 0.03, actions, init,
        ctrl_delay=False, comm_delay=0.0,
    )
    ours = _run_ours("bodyrate", 0.03, 0.03, actions, init,
                     ctrl_delay=False, comm_delay=0.0)
    err = np.abs(ref - ours).max()
    assert err <= TOL, f"max |Δfull_state| = {err:.3e}"


def test_reference_rk4_is_broken(ref_dynamics_cls, torch64):
    """Document the reference rk4 defect: `_get_derivatives` is called
    without its required `wind` argument (`utils/maths.py:370-379`)."""
    rng = np.random.default_rng(3)
    init = _initial_states(rng)
    actions = rng.uniform(-1, 1, size=(1, N, 4))
    with pytest.raises(TypeError):
        _run_reference(
            ref_dynamics_cls, torch64, "bodyrate", 0.03, 0.03, actions, init,
            integrator="rk4",
        )


def test_rk4_vs_numpy_oracle():
    """Our rk4 vs an independent numpy implementation of the reference's
    staging (`utils/maths.py:353-386`), wind = 0."""
    from visfly_tpu.core import integrator as integ

    rng = np.random.default_rng(5)
    n = 4
    pos = rng.normal(size=(n, 3))
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    vel = rng.normal(size=(n, 3))
    omega = rng.normal(size=(n, 3)) * 0.5
    acc = rng.normal(size=(n, 3))
    tau = rng.normal(size=(n, 3)) * 0.01
    inertia = np.array([0.00101, 0.00153, 0.00203])
    dt = 0.01

    def derivs(v, qq, om):
        d_pos = v
        w_, x_, y_, z_ = qq[:, 0], qq[:, 1], qq[:, 2], qq[:, 3]
        ow, ox, oy, oz = np.zeros(n), om[:, 0], om[:, 1], om[:, 2]
        d_q = 0.5 * np.stack(
            [
                w_ * ow - x_ * ox - y_ * oy - z_ * oz,
                w_ * ox + x_ * ow + y_ * oz - z_ * oy,
                w_ * oy - x_ * oz + y_ * ow + z_ * ox,
                w_ * oz + x_ * oy - y_ * ox + z_ * ow,
            ],
            axis=-1,
        )
        d_vel = acc
        d_om = (tau - np.cross(om, inertia * om)) / inertia
        return d_pos, d_q, d_vel, d_om

    ks = np.array([1, 2, 2, 1]) / 6.0
    slice_ts = [0.5, 0.5, 1.0]
    slopes = []
    q_c, vel_c, om_c = q, vel, omega
    for i in range(4):
        if i != 0:
            s = slice_ts[i - 1] * dt
            q_c = q + slopes[i - 1][1] * s
            vel_c = vel + slopes[i - 1][2] * s
            om_c = omega + slopes[i - 1][3] * s
        slopes.append(derivs(vel_c, q_c, om_c))

    exp_pos = pos + sum(k * s[0] for k, s in zip(ks, slopes)) * dt
    exp_q = q + sum(k * s[1] for k, s in zip(ks, slopes)) * dt
    exp_vel = vel + sum(k * s[2] for k, s in zip(ks, slopes)) * dt
    exp_om = omega + sum(k * s[3] for k, s in zip(ks, slopes)) * dt

    got = integ.integrate(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(vel), jnp.asarray(omega),
        jnp.asarray(acc), jnp.asarray(tau), jnp.asarray(inertia),
        jnp.asarray(1.0 / inertia), dt, jnp.zeros((n, 3)), method="rk4",
    )
    for g, e in zip(got[:4], [exp_pos, exp_q, exp_vel, exp_om]):
        np.testing.assert_allclose(g, e, atol=1e-12)


def test_gradients_flow_through_step():
    """BPTT viability: d(final position)/d(actions) exists and is finite."""
    config = DroneConfig(dt=0.03, ctrl_dt=0.03, cfg="drone_state")
    params = make_drone_params(config, dtype=jnp.float64)
    state0 = init_state(config, params, 4, dtype=jnp.float64)
    state0 = reset(config, params, state0,
                   pos=jnp.tile(jnp.asarray([0.0, 0.0, 2.0]), (4, 1)))
    actions = jnp.zeros((10, 4, 4), dtype=jnp.float64)

    def rollout(acts):
        def body(s, a):
            s = step(config, params, s, jnp.tanh(a))
            return s, None

        s, _ = jax.lax.scan(body, state0, acts)
        return jnp.sum(s.pos**2)

    g = jax.grad(rollout)(actions)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
