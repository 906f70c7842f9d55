"""Rigid-body state integrators (euler / rk4).

Functional equivalents of the reference ``Integrator``
(`/root/reference/utils/maths.py:296-389`), operating on row-major batched
arrays: pos/vel/omega ``(N, 3)``, quat ``(N, 4)``.

Derivatives (`maths.py:300-315`):
    d_pos = vel + wind
    d_q   = 0.5 · q ⊗ (0, ω)
    d_vel = acc
    d_ω   = J⁻¹ (τ − ω × (J ω))        (J diagonal in all shipped configs)

Reference quirk kept for parity: the reference rk4 branch calls
``_get_derivatives`` without the ``wind`` argument (`maths.py:370-379`) — as
written that call raises a TypeError, so rk4-with-wind has no defined
reference behaviour; we integrate rk4 with wind contributing to d_pos at
every stage (the physically sensible choice) and test rk4 parity at wind=0.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import Array

from . import quaternion as quat


def _derivatives(
    vel: Array,
    q: Array,
    acc: Array,
    omega: Array,
    tau: Array,
    inertia: Array,
    inertia_inv: Array,
    wind: Array,
) -> Tuple[Array, Array, Array, Array]:
    d_pos = vel + wind
    d_q = quat.omega_derivative(q, omega)
    d_vel = acc
    j_omega = inertia * omega  # diagonal inertia
    d_omega = inertia_inv * (tau - jnp.cross(omega, j_omega))
    return d_pos, d_q, d_vel, d_omega


def integrate(
    pos: Array,
    q: Array,
    vel: Array,
    omega: Array,
    acc: Array,
    tau: Array,
    inertia: Array,
    inertia_inv: Array,
    dt: float,
    wind: Array,
    method: str = "euler",
) -> Tuple[Array, Array, Array, Array, Array]:
    """One integration step; returns (pos, q, vel, omega, d_omega).

    ``d_omega`` (the angular acceleration of the *last evaluated slope*) is
    returned because the bodyrate PID uses it as its D-term next step
    (`dynamics.py:352,407`). The quaternion is NOT normalised here — the
    caller normalises after each substep (`dynamics.py:367`).
    """
    if method == "euler":
        d_pos, d_q, d_vel, d_omega = _derivatives(
            vel, q, acc, omega, tau, inertia, inertia_inv, wind
        )
        return (
            pos + d_pos * dt,
            q + d_q * dt,
            vel + d_vel * dt,
            omega + d_omega * dt,
            d_omega,
        )

    if method == "rk4":
        # Classic RK4 with the reference's staging (`maths.py:353-386`):
        # stage offsets [0.5, 0.5, 1]·dt applied to (q, vel, ω); position
        # feedback is never staged (pos does not influence derivatives).
        ks = (1.0 / 6.0, 2.0 / 6.0, 2.0 / 6.0, 1.0 / 6.0)
        slice_ts = (0.5, 0.5, 1.0)

        q_c, vel_c, omega_c = q, vel, omega
        slopes = []
        for i in range(4):
            if i != 0:
                d_q_p, d_vel_p, d_omega_p = slopes[i - 1][1], slopes[i - 1][2], slopes[i - 1][3]
                s = slice_ts[i - 1] * dt
                q_c = q + d_q_p * s
                vel_c = vel + d_vel_p * s
                omega_c = omega + d_omega_p * s
            slopes.append(
                _derivatives(vel_c, q_c, acc, omega_c, tau, inertia, inertia_inv, wind)
            )

        def blend(idx):
            return sum(k * s[idx] for k, s in zip(ks, slopes))

        d_omega_last = slopes[-1][3]
        return (
            pos + blend(0) * dt,
            q + blend(1) * dt,
            vel + blend(2) * dt,
            omega + blend(3) * dt,
            d_omega_last,
        )

    raise ValueError("method should be one of ['euler', 'rk4']")
