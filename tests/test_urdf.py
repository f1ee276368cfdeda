"""URDF front-end tests.

Mirrors the role of the reference's URDF-based model construction
(ocs2_pinocchio_interface/urdf.h + per-robot MobileManipulatorInterface
configs): parse real arm URDFs, validate the extracted chains' FK against an
independent homogeneous-transform evaluation of the raw URDF data, and run
the manipulator MPC parameterized over two URDF-loaded robots.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocs2_tpu.models import mobile_manipulator as mm
from ocs2_tpu.models.kinematics import rpy_matrix
from ocs2_tpu.models.urdf import asset_path, chain_from_urdf, parse_urdf
from ocs2_tpu.oc.time_discretization import uniform_grid
from ocs2_tpu.solvers import sqp

ARMS = {
    "franka": dict(
        urdf=asset_path("franka_panda.urdf"),
        base="root",
        ee="panda_hand_tcp",
        remove=("panda_finger_joint1", "panda_finger_joint2"),
        dof=7,
        home=np.array([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785]),
        target=(0.4, 0.2, 0.5),
    ),
    "ur5": dict(
        urdf=asset_path("ur5.urdf"),
        base="base_link",
        ee="ee_link",
        remove=(),
        dof=6,
        home=np.array([0.0, -1.2, 1.6, -0.4, 1.5708, 0.0]),
        target=(0.35, 0.25, 0.45),
    ),
}


def _fk_reference(model, base, ee, remove, q):
    """Independent FK: walk the raw URDF joints with homogeneous transforms
    (no folding, no Chain) — ground truth for the loader + Chain math."""
    by_child = model.joint_by_child()
    links = model.chain_links(base, ee)
    T = np.eye(4)
    qi = 0
    for child in links[1:]:
        j = by_child[child]
        O = np.eye(4)
        O[:3, :3] = rpy_matrix(j.rpy)
        O[:3, 3] = j.xyz
        T = T @ O
        if j.kind != "fixed" and j.name not in remove:
            a = np.asarray(j.axis, np.float64)
            a = a / np.linalg.norm(a)
            th = q[qi]
            qi += 1
            K = np.array(
                [[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]]
            )
            M = np.eye(4)
            if j.kind == "prismatic":
                M[:3, 3] = a * th
            else:
                M[:3, :3] = (
                    np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
                )
            T = T @ M
    return T[:3, 3], T[:3, :3]


class TestParsing:
    @pytest.mark.parametrize("arm", list(ARMS))
    def test_chain_extraction(self, arm):
        cfg = ARMS[arm]
        loaded = chain_from_urdf(
            cfg["urdf"], cfg["base"], cfg["ee"], remove_joints=cfg["remove"]
        )
        assert loaded.chain.num_dof == cfg["dof"]
        assert len(loaded.joint_names) == cfg["dof"]
        assert np.all(loaded.lower < loaded.upper)
        assert np.all(loaded.velocity > 0)

    def test_franka_limits(self):
        loaded = chain_from_urdf(
            ARMS["franka"]["urdf"], "root", "panda_hand_tcp",
            remove_joints=ARMS["franka"]["remove"],
        )
        # Manufacturer joint-1 bounds.
        assert loaded.lower[0] == pytest.approx(-2.8973)
        assert loaded.upper[0] == pytest.approx(2.8973)
        # joint4 is the elbow with asymmetric range.
        assert loaded.upper[3] == pytest.approx(-0.0698)

    @pytest.mark.parametrize("arm", list(ARMS))
    def test_fk_matches_homogeneous_reference(self, arm):
        cfg = ARMS[arm]
        model = parse_urdf(cfg["urdf"])
        loaded = chain_from_urdf(
            model, cfg["base"], cfg["ee"], remove_joints=cfg["remove"]
        )
        rng = np.random.default_rng(0)
        for _ in range(5):
            q = rng.uniform(-1.5, 1.5, size=cfg["dof"])
            pos_ref, rot_ref = _fk_reference(
                model, cfg["base"], cfg["ee"], set(cfg["remove"]), q
            )
            pos, rot = loaded.chain.forward(jnp.asarray(q, jnp.float32))
            np.testing.assert_allclose(np.asarray(pos), pos_ref, atol=2e-5)
            np.testing.assert_allclose(np.asarray(rot), rot_ref, atol=2e-5)

    def test_remove_joints_are_frozen(self):
        cfg = ARMS["franka"]
        loaded = chain_from_urdf(
            cfg["urdf"], cfg["base"], "panda_leftfinger",
            remove_joints=cfg["remove"],
        )
        # Finger joint removed -> chain to the finger has only the 7 arm dofs.
        assert loaded.chain.num_dof == 7


ANYMAL_URDF = "/root/reference/ocs2_robotic_examples/ocs2_perceptive_anymal/ocs2_anymal_models/urdf/anymal_camel_rsl.urdf"


@pytest.mark.skipif(not os.path.exists(ANYMAL_URDF), reason="no reference urdf")
class TestAnymalTree:
    def test_leg_chains(self):
        """A branching quadruped URDF yields one 3-DOF chain per foot."""
        model = parse_urdf(ANYMAL_URDF)
        feet = [ln for ln in model.links if ln.endswith("FOOT")]
        assert len(feet) >= 4
        for foot in feet[:4]:
            loaded = chain_from_urdf(model, "base", foot)
            assert loaded.chain.num_dof == 3, (foot, loaded.joint_names)


class TestUrdfArmMpc:
    @pytest.mark.parametrize("arm", list(ARMS))
    def test_reaching(self, arm):
        """EE reaches a workspace target with joint limits respected —
        parameterized over URDF-loaded robots (reference
        MobileManipulatorInterface over config/{franka,ridgeback_ur5})."""
        cfg = ARMS[arm]
        loaded = chain_from_urdf(
            cfg["urdf"], cfg["base"], cfg["ee"], remove_joints=cfg["remove"]
        )
        problem = mm.make_urdf_arm_problem(loaded)
        grid = uniform_grid(0.0, 2.0, 30)
        params = {"ee_target": jnp.asarray(cfg["target"], jnp.float32)}
        x0 = jnp.asarray(cfg["home"], jnp.float32)
        st = sqp.SqpSettings(max_iterations=30, integrator="rk2")
        sol = jax.jit(
            lambda x: sqp.solve(problem, grid, x, params, settings=st)
        )(x0)
        pos, _ = loaded.chain.forward(sol.xs[-1])
        err = float(jnp.linalg.norm(pos - params["ee_target"]))
        assert err < 0.05, err
        qs = np.asarray(sol.xs)
        lo = np.asarray(loaded.lower, np.float32)
        hi = np.asarray(loaded.upper, np.float32)
        finite = np.isfinite(lo) & np.isfinite(hi)
        assert np.all(qs[:, finite] > lo[finite][None] - 1e-2)
        assert np.all(qs[:, finite] < hi[finite][None] + 1e-2)
