"""Differentiable batched quadrotor dynamics — the TPU hot kernel.

Functional re-design of the reference ``Dynamics``
(`/root/reference/envs/base/dynamics.py`): all mutable object state becomes
one ``DynState`` pytree, and ``step`` is a pure function
``(config, params, state, action) -> state'`` that jits/vmaps/grads cleanly.
Layout is row-major ``(N, dim)`` (the reference is column-major ``(dim, N)``)
so the batch axis is leading and shards naturally over a device mesh.

Semantics replicated 1:1 (parity-tested against the reference to ≤1e-5 over
256-step rollouts — see ``tests/test_dynamics_parity.py``):

* action FIFO communication delay (`dynamics.py:322-328`)
* de-normalisation scale/bias per action mode (`dynamics.py:610-733`)
* 4 control modes incl. the SO(3) attitude controller for VELOCITY/POSITION
  (`dynamics.py:389-503`) — the reference's per-agent Python loops
  (`dynamics.py:446-450,481-488`) become batched einsums here
* first-order motor lag + quadratic thrust map (`dynamics.py:505-554`)
* body-frame linear+quadratic drag (`dynamics.py:342-347`)
* euler/rk4 integration with post-substep quaternion normalisation
  (`dynamics.py:352-367`)
* state clamps (`_ugly_fix`, `dynamics.py:374-382`)
* wind model and the wind-included ``velocity`` output (`dynamics.py:752`)
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..core import integrator as integ
from ..core import quaternion as quat
from ..core.types import ActionType
from .config import GRAVITY, DroneConfig, DroneParams

def _g_vec(dtype) -> Array:
    """Gravity vector constructed at trace time so its precision follows the
    computation dtype (a module-level constant would freeze the float32
    rounding of 9.81 into float64 parity runs)."""
    return jnp.asarray([0.0, 0.0, -GRAVITY], dtype)


class DynState(NamedTuple):
    """Complete per-step dynamics state for N drones (one pytree)."""

    pos: Array  # (N, 3)
    q: Array  # (N, 4) [w, x, y, z]
    vel: Array  # (N, 3)  (wind NOT included; see `velocity()`)
    omega: Array  # (N, 3) body rates
    motor_omega: Array  # (N, 4)
    thrusts: Array  # (N, 4)
    acc: Array  # (N, 3)
    angular_acc: Array  # (N, 3)
    t: Array  # (N,)
    pre_action: Array  # (K, N, 4) comm-delay FIFO (K may be 0)
    wind: Array  # (N, 3) current wind velocity
    # per-agent drag coefficients, populated when config.drag_random > 0
    # (`dynamics.py:244-246,265-267`); empty tuples otherwise
    linear_drag: Any = ()
    quad_drag: Any = ()


WindFn = Callable[[Array, Array], Array]  # (t (N,), prev (N,3)) -> (N,3)


def init_state(
    config: DroneConfig, params: DroneParams, num: int, dtype=jnp.float32
) -> DynState:
    """Fresh state at the origin with hover thrusts (`dynamics.py:116-130,230-246`)."""
    return DynState(
        pos=jnp.zeros((num, 3), dtype),
        q=quat.identity((num,), dtype),
        vel=jnp.zeros((num, 3), dtype),
        omega=jnp.zeros((num, 3), dtype),
        motor_omega=jnp.full((num, 4), params.init_motor_omega, dtype),
        thrusts=jnp.full((num, 4), params.init_thrust, dtype),
        acc=jnp.zeros((num, 3), dtype),
        angular_acc=jnp.zeros((num, 3), dtype),
        t=jnp.zeros((num,), dtype),
        pre_action=jnp.zeros((config.comm_delay_steps, num, 4), dtype),
        wind=jnp.zeros((num, 3), dtype),
        linear_drag=(
            jnp.broadcast_to(params.linear_drag_coeffs, (num, 3)).astype(dtype)
            if config.drag_random else ()
        ),
        quad_drag=(
            jnp.broadcast_to(params.quad_drag_coeffs, (num, 3)).astype(dtype)
            if config.drag_random else ()
        ),
    )


def reset(
    config: DroneConfig,
    params: DroneParams,
    state: DynState,
    mask: Optional[Array] = None,
    pos: Optional[Array] = None,
    ori: Optional[Array] = None,
    vel: Optional[Array] = None,
    ori_vel: Optional[Array] = None,
    motor_omega: Optional[Array] = None,
    thrusts: Optional[Array] = None,
    t: Optional[Array] = None,
    key: Optional[Array] = None,
) -> DynState:
    """Masked functional reset (`Dynamics.reset`, `dynamics.py:218-269`).

    ``mask`` is a (N,) bool — True agents are reset (the reference's
    ``indices``). With ``mask=None`` everything resets. Partial resets draw a
    random hover phase ``t ~ U[0, 2·3.14)`` when ``t`` is not given and a
    ``key`` is supplied (`dynamics.py:256`); full resets use t=0 (`:236`).
    """
    num = state.pos.shape[0]
    dtype = state.pos.dtype
    full = mask is None
    if full:
        mask = jnp.ones((num,), dtype=bool)

    def pick(new, old):
        return jnp.where(mask[:, None], new.astype(dtype), old)

    new_pos = jnp.zeros((num, 3), dtype) if pos is None else jnp.asarray(pos)
    new_q = quat.identity((num,), dtype) if ori is None else jnp.asarray(ori)
    new_vel = jnp.zeros((num, 3), dtype) if vel is None else jnp.asarray(vel)
    new_omega = jnp.zeros((num, 3), dtype) if ori_vel is None else jnp.asarray(ori_vel)
    new_momega = (
        jnp.full((num, 4), params.init_motor_omega, dtype)
        if motor_omega is None
        else jnp.asarray(motor_omega)
    )
    new_thrusts = (
        jnp.full((num, 4), params.init_thrust, dtype)
        if thrusts is None
        else jnp.asarray(thrusts)
    )
    if t is None:
        if full or key is None:
            new_t = jnp.zeros((num,), dtype)
        else:
            new_t = jax.random.uniform(key, (num,), dtype) * 3.14 * 2
    else:
        new_t = jnp.asarray(t)

    zeros3 = jnp.zeros((num, 3), dtype)

    # per-reset drag randomisation (`dynamics.py:244-246,265-267`):
    # coeff = mean · (clip((U−0.5)·2·drag_random, −0.5, 0.5) + 1)
    linear_drag, quad_drag = state.linear_drag, state.quad_drag
    if config.drag_random and not isinstance(linear_drag, tuple):
        k_drag = jax.random.fold_in(key, 97) if key is not None else None
        if k_drag is not None:
            k1, k2 = jax.random.split(k_drag)

            def rand_coeffs(k, mean):
                u = (jax.random.uniform(k, (num, 3), dtype) - 0.5) * 2 * config.drag_random
                return mean * (jnp.clip(u, -0.5, 0.5) + 1.0)

            linear_drag = pick(rand_coeffs(k1, params.linear_drag_coeffs), linear_drag)
            quad_drag = pick(rand_coeffs(k2, params.quad_drag_coeffs), quad_drag)

    return DynState(
        pos=pick(new_pos, state.pos),
        q=pick(new_q, state.q),
        vel=pick(new_vel, state.vel),
        omega=pick(new_omega, state.omega),
        motor_omega=pick(new_momega, state.motor_omega),
        thrusts=pick(new_thrusts, state.thrusts),
        acc=pick(zeros3, state.acc),
        angular_acc=pick(zeros3, state.angular_acc),
        t=jnp.where(mask, new_t.astype(dtype), state.t),
        pre_action=jnp.where(mask[None, :, None], 0.0, state.pre_action),
        wind=state.wind,
        linear_drag=linear_drag,
        quad_drag=quad_drag,
    )


# ---------------------------------------------------------------------------
# step internals
# ---------------------------------------------------------------------------


def _de_normalize(config: DroneConfig, params: DroneParams, action: Array) -> Array:
    """[-1,1] action → physical command (`_de_normalize`, `dynamics.py:692-733`)."""
    c0 = action[:, :1] * params.scale0 + params.bias0
    c123 = action[:, 1:] * params.scale123 + params.bias123
    if config.action_type == ActionType.BODYRATE:
        c0 = c0 * params.mass  # collective thrust = m · z-acc
    elif config.action_type == ActionType.THRUST:
        return params.mass * (action * params.scale0 + params.bias0)
    return jnp.concatenate([c0, c123], axis=-1)


def normalize_command(config: DroneConfig, params: DroneParams,
                      command: Array) -> Array:
    """Physical command → [-1, 1] action — the ROS-node inverse of
    ``_de_normalize`` (`Dynamics._normalize`, `dynamics.py:271-317`).

    BODYRATE commands are [z-acc, bodyrates] (acceleration, NOT collective
    thrust — matching the reference, which divides by mass upstream)."""
    if config.action_type == ActionType.THRUST:
        return (command / params.mass - params.bias0) / params.scale0
    c0 = (command[:, :1] - params.bias0) / jnp.where(params.scale0 == 0, 1.0,
                                                     params.scale0)
    c123 = (command[:, 1:] - params.bias123) / jnp.where(
        params.scale123 == 0, 1.0, params.scale123
    )
    return jnp.concatenate([c0, c123], axis=-1)


def _so3_attitude(
    params: DroneParams,
    state: DynState,
    f_des: Array,
    yaw_des: Array,
    yaw_gain: Array,
) -> Tuple[Array, Array, Array]:
    """Shared SO(3) attitude machinery of the VELOCITY/POSITION modes
    (`dynamics.py:419-450,460-488`), fully batched (no per-agent loop).

    Returns (gross_thrust, pose_err, ang_vel_err)."""
    current_yaw = quat.yaw(state.q)
    yaw_err = yaw_des - current_yaw
    yaw_err = jnp.arctan2(jnp.sin(yaw_err), jnp.cos(yaw_err))
    yaw_spd_des = yaw_err * yaw_gain * 2.0

    gross_thrust = quat.inv_rotate(state.q, f_des)[:, 2]

    b3 = f_des / jnp.linalg.norm(f_des, axis=-1, keepdims=True)
    c1 = jnp.stack(
        [jnp.cos(yaw_des), jnp.sin(yaw_des), jnp.zeros_like(yaw_des)], axis=-1
    )
    b2 = jnp.cross(b3, c1)
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b1 = jnp.cross(b2, b3)
    r_des = jnp.stack([b1, b2, b3], axis=-1)  # columns are the basis vectors
    r = quat.to_rotation_matrix(state.q)

    # A = R_desᵀ R ; m = ½(A − Aᵀ) ; pose_err = [m21... ] (`dynamics.py:447-448`)
    a = jnp.einsum("nki,nkj->nij", r_des, r)
    m = 0.5 * (a - jnp.swapaxes(a, -1, -2))
    pose_err = jnp.stack([m[:, 1, 2], -m[:, 0, 2], m[:, 0, 1]], axis=-1)
    ang_vel_err = a[:, :, 2] * yaw_spd_des[:, None] - state.omega
    return gross_thrust, pose_err, ang_vel_err


def _thrust_from_cmd(
    config: DroneConfig, params: DroneParams, state: DynState, command: Array
) -> Array:
    """Mode-dependent per-rotor desired thrust (`_get_thrust_from_cmd`,
    `dynamics.py:389-503`)."""
    at = config.action_type
    if at == ActionType.THRUST:
        thrusts_des = command
    elif at == ActionType.BODYRATE:
        omega_err = command[:, 1:] - state.omega
        j_omega = params.inertia * state.omega
        torque_des = (
            params.inertia * (params.kp_bodyrate * omega_err)
            + jnp.cross(state.omega, j_omega)
            - params.kd_bodyrate * state.angular_acc
        )
        thrusts_torque = jnp.concatenate([command[:, :1], torque_des], axis=-1)
        thrusts_des = thrusts_torque @ params.b_allocation_inv.T
    elif at == ActionType.VELOCITY:
        a_des = params.velocity_pid[0] * (command[:, 1:] - state.vel)
        f_des = params.mass * (a_des - _g_vec(a_des.dtype))
        # auto-yaw toward the velocity direction (`dynamics.py:419-427`)
        vel_h = state.vel[:, :2]
        vel_h_norm = jnp.linalg.norm(vel_h, axis=-1)
        yaw_des = jnp.where(
            vel_h_norm > 0.1,
            jnp.arctan2(vel_h[:, 1], vel_h[:, 0]),
            quat.yaw(state.q),
        )
        gross, pose_err, ang_vel_err = _so3_attitude(
            params, state, f_des, yaw_des, params.velocity_pid[2]
        )
        # `dynamics.py:451` — the ω×ω term is identically zero; omitted.
        torque_des = params.inertia * (
            params.kp_bodyrate * pose_err + params.kp_bodyrate * ang_vel_err
        )
        thrusts_des = (
            jnp.concatenate([gross[:, None], torque_des], axis=-1)
            @ params.b_allocation_inv.T
        )
    elif at == ActionType.POSITION:
        v_des = params.position_pid[2] * (command[:, 1:] - state.pos)
        a_des = params.velocity_pid[2] * (v_des - state.vel)
        f_des = params.mass * (a_des - _g_vec(a_des.dtype))
        yaw_des = command[:, 0]  # direct yaw command (`dynamics.py:461`)
        gross, pose_err, ang_vel_err = _so3_attitude(
            params, state, f_des, yaw_des, params.position_pid[2]
        )
        j_omega = params.inertia * state.omega
        torque_des = params.inertia * (
            params.kp_bodyrate * pose_err
            + 1.2 * (params.kp_bodyrate * ang_vel_err)
            - params.kd_bodyrate * state.angular_acc
            - jnp.cross(state.omega, j_omega)
        )
        thrusts_des = (
            jnp.concatenate([gross[:, None], torque_des], axis=-1)
            @ params.b_allocation_inv.T
        )
    else:  # pragma: no cover
        raise ValueError(f"unsupported action type {at}")

    return jnp.clip(thrusts_des, params.thrust_bound.min, params.thrust_bound.max)


def _rotor_omega_from_thrust(params: DroneParams, thrusts: Array) -> Array:
    """Quadratic-formula inverse of the thrust map (`dynamics.py:537-554`)."""
    a, b, c = params.thrust_map[0], params.thrust_map[1], params.thrust_map[2]
    return (-b + jnp.sqrt(b * b - 4.0 * a * (c - thrusts))) / (2.0 * a)


def _thrust_from_rotor_omega(params: DroneParams, motor_omega: Array) -> Array:
    a, b, c = params.thrust_map[0], params.thrust_map[1], params.thrust_map[2]
    return a * motor_omega**2 + b * motor_omega + c


def _substep(
    config: DroneConfig, params: DroneParams, state: DynState, thrust_des: Array
) -> DynState:
    """One physics substep of dt (`dynamics.py:335-367`)."""
    if config.ctrl_delay:
        motor_omega_des = _rotor_omega_from_thrust(params, thrust_des)
        motor_omega = (
            params.motor_c * state.motor_omega
            + (1.0 - params.motor_c) * motor_omega_des
        )
        thrusts = _thrust_from_rotor_omega(params, motor_omega)
    else:
        motor_omega = state.motor_omega
        thrusts = thrust_des

    force_torque = thrusts @ params.b_allocation.T  # (N, 4) [F, τ]

    vel_body = quat.inv_rotate(state.q, state.vel)
    ld = (params.linear_drag_coeffs if isinstance(state.linear_drag, tuple)
          else state.linear_drag)
    qd = (params.quad_drag_coeffs if isinstance(state.quad_drag, tuple)
          else state.quad_drag)
    drag = ld * vel_body + qd * vel_body * jnp.abs(vel_body)
    thrust_vec = jnp.concatenate(
        [jnp.zeros_like(force_torque[:, :2]), force_torque[:, :1]], axis=-1
    )
    acc = quat.rotate(state.q, thrust_vec - drag) / params.mass + _g_vec(state.pos.dtype)

    pos, q, vel, omega, angular_acc = integ.integrate(
        state.pos,
        state.q,
        state.vel,
        state.omega,
        acc,
        force_torque[:, 1:],
        params.inertia,
        params.inertia_inv,
        config.dt,
        state.wind,
        method=config.integrator,
    )
    q = quat.normalize(q)
    return state._replace(
        pos=pos,
        q=q,
        vel=vel,
        omega=omega,
        motor_omega=motor_omega,
        thrusts=thrusts,
        acc=acc,
        angular_acc=angular_acc,
    )


def _ugly_fix(state: DynState) -> DynState:
    """State clamps preventing numeric explosion (`dynamics.py:374-382`)."""
    pos = jnp.concatenate(
        [
            jnp.clip(state.pos[:, :2], -100.0, 100.0),
            jnp.clip(state.pos[:, 2:], 0.0, 20.0),
        ],
        axis=-1,
    )
    return state._replace(
        pos=pos,
        vel=jnp.clip(state.vel, -20.0, 20.0),
        omega=jnp.clip(state.omega, -10.0, 10.0),
    )


def update_wind(
    state: DynState, wind_fn: Optional[WindFn] = None, wind_const: Optional[Array] = None
) -> DynState:
    """Refresh the wind field (`update_wind`, `dynamics.py:384-388`)."""
    if wind_fn is not None:
        wind = wind_fn(state.t, state.wind)
    elif wind_const is not None:
        wind = jnp.broadcast_to(jnp.asarray(wind_const, state.wind.dtype), state.wind.shape)
    else:
        wind = jnp.zeros_like(state.wind)
    return state._replace(wind=wind)


def step(
    config: DroneConfig,
    params: DroneParams,
    state: DynState,
    action: Array,
    wind_fn: Optional[WindFn] = None,
    wind_const: Optional[Array] = None,
) -> DynState:
    """Advance N drones by one control step of ctrl_dt (`Dynamics.step`,
    `dynamics.py:319-372`). ``action`` is (N, 4) in [-1, 1]. Differentiable
    end-to-end; under ``jit`` the de-normalise → PID → motor → drag →
    integrate chain fuses into one XLA computation."""
    state = update_wind(state, wind_fn, wind_const)

    # communication-delay FIFO (`dynamics.py:322-328`)
    if config.comm_delay_steps > 0:
        delayed = state.pre_action[0]
        pre_action = jnp.concatenate([state.pre_action[1:], action[None]], axis=0)
        state = state._replace(pre_action=pre_action)
        action = delayed

    command = _de_normalize(config, params, action)
    thrust_des = _thrust_from_cmd(config, params, state, command)

    for _ in range(config.interval_steps):  # static unroll: fuses substeps
        state = _substep(config, params, state, thrust_des)

    state = state._replace(t=state.t + config.ctrl_dt)
    return _ugly_fix(state)


# ---------------------------------------------------------------------------
# observable views (reference property surface, `dynamics.py:735-826`)
# ---------------------------------------------------------------------------


def velocity(state: DynState) -> Array:
    """Ground velocity incl. wind (`dynamics.py:750-752`)."""
    return state.vel + state.wind


def orientation(state: DynState, config: Optional[DroneConfig] = None) -> Array:
    """Quaternion (N,4) or euler (N,3) per ``ori_output_type``
    (`dynamics.py:739-744`)."""
    if config is not None and not config.is_quat_output:
        return quat.to_euler(state.q)
    return state.q


def direction(state: DynState) -> Array:
    """Body x-axis in world frame (`dynamics.py:746-748`)."""
    return quat.x_axis(state.q)


def get_state(state: DynState, config: Optional[DroneConfig] = None) -> Array:
    """Observable state [pos, orientation, vel+wind, ω] — 13-dim with
    quaternion output, 12-dim with euler (`dynamics.py:778-786`)."""
    return jnp.concatenate(
        [state.pos, orientation(state, config), velocity(state), state.omega],
        axis=-1,
    )


def full_state(state: DynState) -> Array:
    """22-dim state (+motor ω, thrusts, t) (`dynamics.py:792-803`)."""
    return jnp.concatenate(
        [
            state.pos,
            state.q,
            velocity(state),
            state.omega,
            state.motor_omega,
            state.thrusts,
            state.t[:, None],
        ],
        axis=-1,
    )


def extend_state(state: DynState) -> Array:
    """28-dim state (+acc, angular acc) (`dynamics.py:805-819`)."""
    return jnp.concatenate(
        [
            state.pos,
            state.q,
            velocity(state),
            state.omega,
            state.acc,
            state.angular_acc,
            state.motor_omega,
            state.thrusts,
            state.t[:, None],
        ],
        axis=-1,
    )
