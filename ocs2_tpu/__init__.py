"""ocs2_tpu — TPU-native optimal control and nonlinear MPC.

A ground-up JAX/XLA/Pallas re-design of the capabilities of OCS2
(reference: /root/reference, ETH Zurich's C++/ROS toolbox): SLQ/iLQR DDP,
multiple-shooting SQP/IPM, PIPG, switched systems, constraint machinery,
an MPC⇄MRT runtime, robot models, and MPC-Net-style policy learning —
re-expressed as vmapped/scanned pure functions over device meshes instead of
thread pools and virtual dispatch.
"""
import jax as _jax

# Solver recursions (Riccati, KKT) are numerically sensitive; the matrices are
# tiny (nx <= ~50) so full-f32 MXU passes cost nothing. Without this, TPU
# default matmul precision (bf16 passes) degrades Riccati to ~1e-2.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
