"""Operator motion library + base-reference extrapolation for the quadruped.

Analogue of ocs2_anymal_commands (the reference's operator tooling):
* LoadMotions.h readCsv/readMotion — CSV motion files (one header line, rows
  of [time, contact flags(4), base position(3), base quaternion wxyz(4),
  base-frame linear/angular velocity(6), joint angles(12), joint
  velocities(12), world contact forces(12)]) converted into a
  (TargetTrajectories, ModeSchedule) pair in this repo's 24/24 centroidal
  layout,
* MotionCommandInterface.h — a named motion library with keyboard-style
  selection, publishing the selected motion into the reference manager,
* ReferenceExtrapolation.h generateExtrapolatedBaseReference — a base
  reference rolled forward from (heading velocity, lateral velocity, yaw
  rate, height) commands, optionally projected onto a terrain plane.
"""
from __future__ import annotations

import dataclasses
import io
from typing import Dict, Optional, Tuple

import numpy as np

from ...core.reference import ModeSchedule, TargetTrajectories
from . import model
from .gait import mode_number

CSV_HEADER = (
    ["time"]
    + [f"contactflag_{l}" for l in ("LF", "RF", "LH", "RH")]
    + [f"base_positionInWorld_{a}" for a in "xyz"]
    + [f"base_quaternion_{a}" for a in "wxyz"]
    + [f"base_linearvelocityInBase_{a}" for a in "xyz"]
    + [f"base_angularvelocityInBase_{a}" for a in "xyz"]
    + [
        f"jointAngle_{l}_{j}"
        for l in ("LF", "RF", "LH", "RH")
        for j in ("HAA", "HFE", "KFE")
    ]
    + [
        f"jointVelocity_{l}_{j}"
        for l in ("LF", "RF", "LH", "RH")
        for j in ("HAA", "HFE", "KFE")
    ]
    + [
        f"contactForcesInWorld_{l}_{a}"
        for l in ("LF", "RF", "LH", "RH")
        for a in "xyz"
    ]
)


def _quat_wxyz_to_euler_zyx(q: np.ndarray) -> np.ndarray:
    """[N, 4] (w, x, y, z) -> [N, 3] (yaw, pitch, roll) ZYX."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1.0, 1.0))
    roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    return np.stack([yaw, pitch, roll], axis=1)


def _quat_rotate(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Rotate body vectors v [N,3] to world by quaternions q [N,4] wxyz."""
    w, xyz = q[:, :1], q[:, 1:]
    t = 2.0 * np.cross(xyz, v)
    return v + w * t + np.cross(xyz, t)


@dataclasses.dataclass
class Motion:
    """A loaded motion: reference trajectories + its contact sequence."""

    target: TargetTrajectories
    mode_schedule: ModeSchedule
    duration: float


def read_motion_csv(source: str, dt: float = -1.0) -> Motion:
    """Parse a reference-format motion CSV (LoadMotions.h readMotion).

    `source` is the CSV text or a path; rows closer than `dt` are dropped
    (dt < 0 keeps all).  States/inputs are converted to this repo's
    centroidal layout (world-frame base velocity, normalized angular
    momentum via the SRBD inertia, euler ZYX)."""
    text = source
    if "\n" not in source:
        with open(source) as f:
            text = f.read()
    rows = np.genfromtxt(io.StringIO(text), delimiter=",", names=True)
    names = list(rows.dtype.names)
    expect = [h.replace("(", "").replace(")", "") for h in CSV_HEADER]
    if len(names) != len(expect):
        raise ValueError(
            f"motion csv has {len(names)} columns, expected {len(expect)}"
        )
    data = np.stack([rows[n] for n in names], axis=1)
    if data.ndim == 1:
        data = data[None]
    # Subsample by dt.
    if dt > 0:
        keep = [0]
        for i in range(1, data.shape[0]):
            if data[i, 0] - data[keep[-1], 0] >= dt - 1e-9:
                keep.append(i)
        data = data[keep]

    t = data[:, 0]
    flags = data[:, 1:5]
    p_base = data[:, 5:8]
    quat = data[:, 8:12]
    v_base_b = data[:, 12:15]
    w_base_b = data[:, 15:18]
    q_joints = data[:, 18:30]
    dq_joints = data[:, 30:42]
    forces = data[:, 42:54]

    euler = _quat_wxyz_to_euler_zyx(quat)
    v_world = _quat_rotate(quat, v_base_b)
    # x[3:6] stores INERTIA * w_body / MASS (see models/legged_robot/model.py).
    h_n = np.asarray(model.INERTIA)[None] * w_base_b / model.MASS

    xs = np.concatenate([v_world, h_n, p_base, euler, q_joints], axis=1)
    us = np.concatenate([forces, dq_joints], axis=1)
    target = TargetTrajectories(
        times=np.asarray(t, np.float32),
        states=np.asarray(xs, np.float32),
        inputs=np.asarray(us, np.float32),
    )

    # Contact flags -> mode segments (readMotion's gait extraction).
    modes = [mode_number(flags[0] > 0.5)]
    events = []
    for i in range(1, flags.shape[0]):
        m = mode_number(flags[i] > 0.5)
        if m != modes[-1]:
            events.append(float(t[i]))
            modes.append(m)
    ms = ModeSchedule.create(
        np.asarray(events), np.asarray(modes), capacity=max(len(events), 1)
    )
    return Motion(
        target=target, mode_schedule=ms, duration=float(t[-1] - t[0])
    )


def motion_to_csv(motion: Motion, times: np.ndarray) -> str:
    """Serialize a Motion back to the reference CSV format (inverse of
    read_motion_csv; used to exchange motions with reference tooling)."""
    lines = [",".join(CSV_HEADER)]
    from .gait import contact_flags_static

    for tt in times:
        x = np.asarray(motion.target.state_at(np.float32(tt)))
        u = np.asarray(motion.target.input_at(np.float32(tt)))
        mode = int(motion.mode_schedule.mode_at_time(np.float32(tt)))
        fl = contact_flags_static(mode)
        yaw, pitch, roll = x[9], x[10], x[11]
        cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
        cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
        cr, sr = np.cos(roll / 2), np.sin(roll / 2)
        quat = np.array(
            [
                cy * cp * cr + sy * sp * sr,
                cy * cp * sr - sy * sp * cr,
                cy * sp * cr + sy * cp * sr,
                sy * cp * cr - cy * sp * sr,
            ]
        )
        # World -> base-frame velocities.
        r = np.asarray(model.euler_zyx_rotation(x[9:12]))
        v_b = r.T @ x[0:3]
        w_b = model.MASS * x[3:6] / np.asarray(model.INERTIA)
        row = np.concatenate(
            [[tt], fl, x[6:9], quat, v_b, w_b, x[12:24], u[12:24], u[0:12]]
        )
        lines.append(",".join(repr(float(v)) for v in row))
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Built-in demo motions (the library shipped in config/motions/).
# ---------------------------------------------------------------------------


def _squat_motion(depth: float = 0.12, period: float = 2.0) -> Motion:
    """Full-stance squat: base height oscillates, feet pinned — joint
    trajectories made kinematically CONSISTENT with the base motion via the
    analytic leg IK (like the reference's recorded motions, which carry full
    joint trajectories; a height-only target conflicts with the joint
    tracking weights and the optimum is standing still)."""
    from . import ik

    t = np.linspace(0.0, period, 41)
    z = model.STAND_HEIGHT - depth * 0.5 * (1 - np.cos(2 * np.pi * t / period))
    dz = -depth * np.pi / period * np.sin(2 * np.pi * t / period)
    xs = np.tile(np.asarray(model.default_state())[None], (t.size, 1))
    xs[:, 8] = z
    xs[:, 2] = dz
    feet0 = np.asarray(model.foot_positions_world(model.default_state()))
    for i in range(t.size):
        pose = np.concatenate([xs[i, 6:9], xs[i, 9:12]])
        xs[i, 12:24] = np.asarray(
            ik.joints_from_foot_positions_world(pose, feet0)
        )
    us = np.tile(
        np.asarray(model.weight_compensating_input(np.ones(4)))[None],
        (t.size, 1),
    )
    dt = np.diff(t)
    us[:-1, 12:24] = (xs[1:, 12:24] - xs[:-1, 12:24]) / dt[:, None]
    us[-1, 12:24] = us[-2, 12:24]
    target = TargetTrajectories(
        times=t.astype(np.float32),
        states=xs.astype(np.float32),
        inputs=us.astype(np.float32),
    )
    ms = ModeSchedule.single_mode(15)
    return Motion(target=target, mode_schedule=ms, duration=float(period))


def _walk_forward_motion(distance: float = 0.4, duration: float = 2.0) -> Motion:
    """Straight static-walk translation of the base."""
    from .gait import GaitSchedule, static_walk_gait

    t = np.linspace(0.0, duration, 41)
    xs = np.tile(np.asarray(model.default_state())[None], (t.size, 1))
    xs[:, 6] = distance * t / duration
    xs[:, 0] = distance / duration
    us = np.tile(
        np.asarray(model.weight_compensating_input(np.ones(4)))[None],
        (t.size, 1),
    )
    target = TargetTrajectories(
        times=t.astype(np.float32),
        states=xs.astype(np.float32),
        inputs=us.astype(np.float32),
    )
    gs = GaitSchedule(static_walk_gait(1.0))
    return Motion(
        target=target,
        mode_schedule=gs.mode_schedule(0.0, duration),
        duration=float(duration),
    )


class MotionLibrary:
    """Named motion collection with a command surface
    (MotionCommandInterface.h: motionData_ map + getKeyboardCommand)."""

    def __init__(self, motions: Optional[Dict[str, Motion]] = None):
        self.motions: Dict[str, Motion] = motions or {
            "squat": _squat_motion(),
            "walk_forward": _walk_forward_motion(),
        }

    def list_motions(self):
        return sorted(self.motions)

    def add(self, name: str, motion: Motion) -> None:
        self.motions[name] = motion

    def load_csv(self, name: str, source: str, dt: float = -1.0) -> Motion:
        m = read_motion_csv(source, dt)
        self.add(name, m)
        return m

    def publish(self, name: str, reference_manager, t0: float = 0.0) -> Motion:
        """Publish a motion: retime to start at t0 and push target + mode
        schedule into the reference manager (MotionCommandInterface::
        publishMotion)."""
        m = self.motions[name]
        tgt = m.target
        shifted = TargetTrajectories(
            times=np.asarray(tgt.times) - np.asarray(tgt.times[0]) + t0,
            states=tgt.states,
            inputs=tgt.inputs,
        )
        ms = m.mode_schedule
        n = int(ms.num_events)
        shifted_ms = ModeSchedule.create(
            np.asarray(ms.event_times[:n]) + t0,
            np.asarray(ms.mode_sequence[: n + 1]),
            capacity=max(n, 1),
        )
        reference_manager.set_target(shifted)
        if hasattr(reference_manager, "set_mode_schedule"):
            reference_manager.set_mode_schedule(shifted_ms)
        return Motion(shifted, shifted_ms, m.duration)


# ---------------------------------------------------------------------------
# Base-reference extrapolation (ReferenceExtrapolation.h).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BaseReferenceCommand:
    """Operator velocity command (ReferenceExtrapolation.h:25)."""

    heading_velocity: float = 0.0
    lateral_velocity: float = 0.0
    yaw_rate: float = 0.0
    base_height: float = model.STAND_HEIGHT


def generate_extrapolated_base_reference(
    horizon_dt: float,
    horizon_n: int,
    t0: float,
    x0,
    command: BaseReferenceCommand,
    terrain_height_fn=None,
) -> TargetTrajectories:
    """Roll the base pose forward under constant (heading, lateral, yaw-rate)
    command (generateExtrapolatedBaseReference): 2D unicycle integration of
    the yaw + velocity command, height pinned to command.base_height above
    the terrain (terrain_height_fn(xy) -> z, default flat 0)."""
    x0 = np.asarray(x0)
    t = t0 + horizon_dt * np.arange(horizon_n + 1)
    yaw = x0[9] + command.yaw_rate * (t - t0)
    vx = command.heading_velocity * np.cos(yaw) - command.lateral_velocity * np.sin(yaw)
    vy = command.heading_velocity * np.sin(yaw) + command.lateral_velocity * np.cos(yaw)
    px = x0[6] + np.concatenate([[0.0], np.cumsum(vx[:-1]) * horizon_dt])
    py = x0[7] + np.concatenate([[0.0], np.cumsum(vy[:-1]) * horizon_dt])
    if terrain_height_fn is None:
        ground = np.zeros_like(px)
    else:
        ground = np.asarray(
            [terrain_height_fn(np.array([xx, yy])) for xx, yy in zip(px, py)]
        )
    pz = ground + command.base_height

    xs = np.tile(np.asarray(model.default_state())[None], (t.size, 1))
    xs[:, 0] = vx
    xs[:, 1] = vy
    xs[:, 5] = (
        np.asarray(model.INERTIA)[2] * command.yaw_rate / model.MASS
    )  # h_n yaw component ~ I_z * wz / m
    xs[:, 6] = px
    xs[:, 7] = py
    xs[:, 8] = pz
    xs[:, 9] = yaw
    us = np.tile(
        np.asarray(model.weight_compensating_input(np.ones(4)))[None],
        (t.size, 1),
    )
    return TargetTrajectories(
        times=t.astype(np.float32),
        states=xs.astype(np.float32),
        inputs=us.astype(np.float32),
    )
