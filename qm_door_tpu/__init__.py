"""qm_door_tpu — TPU-native NMPC + whole-body control for a quadruped manipulator.

A from-scratch JAX/XLA/Pallas re-implementation of the capabilities of the
reference stack danisotelo/qm_door (OCS2 centroidal SQP NMPC + hierarchical WBC
for a Unitree AlienGo + Z1 arm):

- ``models``     : rigid-body model compiler (URDF -> constants) + spatial algebra,
                   kinematics (FK/Jacobians), dynamics (CRBA/nle/CMM), centroidal model.
- ``ocp``        : optimal-control-problem definition — costs, constraints, penalties,
                   gait schedule / swing trajectory "mode timeline compiler".
- ``solver``     : multiple-shooting SQP with constraint projection and Riccati
                   (sequential scan and parallel associative scan) LQ solves.
- ``wbc``        : hierarchical whole-body QP (null-space cascade + dense QP kernel).
- ``estimation`` : rbd state containers and centroidal<->rbd conversions.
- ``runtime``    : MPC/MRT-style policy store, controller step, target generators.
- ``sim``        : batched rigid-body simulation + replay harness (Gazebo's role).
- ``parallel``   : device-mesh sharding of batched scenario solves.
- ``ops``        : Pallas TPU kernels for the hot loops.
"""

__version__ = "0.1.0"

# Solver-chain correctness requires true f32 matmuls: the TPU default feeds
# bf16 operands to the MXU, which breaks Riccati/Cholesky conditioning and
# stalls the SQP (rejected steps). Opt out with QM_ALLOW_BF16_MATMUL=1 if you
# co-locate workloads that want the fast path and handle precision yourself.
import os as _os

if _os.environ.get("QM_ALLOW_BF16_MATMUL") != "1":
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", "highest")
