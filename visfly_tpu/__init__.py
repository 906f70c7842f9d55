"""VisFly-TPU: a TPU-native differentiable quadrotor simulator for
vision-based flight learning.

A ground-up JAX/XLA/Pallas re-design with the capability surface of VisFly
(SJTU-ViSYS-team/VisFly): batched differentiable rigid-body dynamics, an
on-device SDF renderer for depth/RGB/semantic observations, a Gym-style env
zoo (Hover/Navigation/Racing/Tracking/Landing/Catch/Multi-agent), and
training algorithms (BPTT/SHAC/PPO/SAC) fused into jitted `lax.scan`
rollouts that never leave the device.
"""

__version__ = "0.1.0"
