"""Gait machinery: contact-flag mode encoding, gait templates, and the
gait -> mode-schedule expansion.

Analogue of the reference's gait stack (ocs2_legged_robot/gait/:
MotionPhaseDefinition.h modeNumber2StanceLeg, Gait.h/ModeSequenceTemplate.h,
GaitSchedule.h:42).  Modes are 4-bit contact masks (bit i = leg i in
contact), identical to the reference's 16-mode enumeration.

Host-side (numpy) expansion produces the padded ModeSchedule consumed by the
static-shape solver; in-jit consumers decode contact flags from the integer
mode with bit ops.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...core.reference import ModeSchedule
from .model import NUM_LEGS

Array = jax.Array

# Leg order: LF RF LH RH (bit 0..3).
STANCE = 15


def mode_number(contact_flags: Sequence[int]) -> int:
    """[LF, RF, LH, RH] bools -> mode int (reference stanceLeg2ModeNumber)."""
    return sum((1 << i) for i, c in enumerate(contact_flags) if c)


def contact_flags_static(mode: int) -> np.ndarray:
    return np.array([(mode >> i) & 1 for i in range(NUM_LEGS)], np.float32)


def contact_flags(mode: Array) -> Array:
    """In-jit decode: [4] float flags from integer mode
    (reference modeNumber2StanceLeg, MotionPhaseDefinition.h)."""
    shifts = jnp.arange(NUM_LEGS, dtype=jnp.int32)
    return ((mode >> shifts) & 1).astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class ModeSequenceTemplate:
    """One gait cycle (reference ModeSequenceTemplate.h): switching times
    within the cycle + the mode active in each sub-interval."""

    switching_times: tuple  # [K+1] ascending, first=0, last=cycle duration
    mode_sequence: tuple  # [K] modes

    @property
    def duration(self) -> float:
        return self.switching_times[-1]


def stance_gait() -> ModeSequenceTemplate:
    return ModeSequenceTemplate((0.0, 1.0), (STANCE,))


def trot_gait(cycle: float = 0.7) -> ModeSequenceTemplate:
    """Diagonal trot (reference gait.info 'trot'): LF+RH then RF+LH."""
    lf_rh = mode_number([1, 0, 0, 1])
    rf_lh = mode_number([0, 1, 1, 0])
    half = cycle / 2.0
    return ModeSequenceTemplate((0.0, half, cycle), (lf_rh, rf_lh))


def static_walk_gait(cycle: float = 1.2) -> ModeSequenceTemplate:
    """Four-beat walk: one swing leg at a time (reference 'static_walk')."""
    seq = []
    for swing_leg in (0, 3, 1, 2):  # LF, RH, RF, LH
        flags = [1, 1, 1, 1]
        flags[swing_leg] = 0
        seq.append(mode_number(flags))
    times = tuple(np.linspace(0.0, cycle, 5).tolist())
    return ModeSequenceTemplate(times, tuple(seq))


def pace_gait(cycle: float = 0.7) -> ModeSequenceTemplate:
    left = mode_number([1, 0, 1, 0])
    right = mode_number([0, 1, 0, 1])
    return ModeSequenceTemplate((0.0, cycle / 2, cycle), (right, left))


GAIT_MAP = {
    "stance": stance_gait,
    "trot": trot_gait,
    "static_walk": static_walk_gait,
    "pace": pace_gait,
}


class GaitSchedule:
    """Periodic gait -> ModeSchedule over a queried horizon (reference
    GaitSchedule.h:42: getModeSchedule inserts template cycles ahead of the
    horizon; setModeSequenceTemplate swaps the gait at a phase boundary)."""

    def __init__(self, template: ModeSequenceTemplate, phase: float = 0.0,
                 capacity: int = 16):
        self.template = template
        self.phase = phase  # template start time offset
        self.capacity = capacity
        self._pending: ModeSequenceTemplate | None = None

    def set_template(self, template: ModeSequenceTemplate) -> None:
        """Queue a gait change; applied at the next cycle boundary."""
        self._pending = template

    def mode_schedule(self, t0: float, tf: float) -> ModeSchedule:
        tpl = self.template
        if self._pending is not None:
            # Swap at the next cycle boundary after t0.
            k = np.ceil((t0 - self.phase) / tpl.duration)
            self.phase = self.phase + k * tpl.duration
            self.template = tpl = self._pending
            self._pending = None
        dur = tpl.duration
        sw = np.asarray(tpl.switching_times[:-1])
        modes_cycle = np.asarray(tpl.mode_sequence)
        # Unroll cycles covering [t0, tf].
        k0 = int(np.floor((t0 - self.phase) / dur))
        events, modes = [], []
        k = k0
        while self.phase + k * dur < tf + dur:
            cycle_start = self.phase + k * dur
            for j, s in enumerate(sw):
                t_evt = cycle_start + s
                events.append(t_evt)
                modes.append(int(modes_cycle[j]))
            k += 1
        events = np.asarray(events)
        modes = np.asarray(modes)
        # Keep events strictly inside (t0, tf); the mode before the first
        # kept event is the one whose interval contains t0.
        keep = (events > t0) & (events < tf)
        first_after = int(np.searchsorted(events, t0, side="right"))
        lead_mode = modes[max(first_after - 1, 0)]
        kept_events = events[keep]
        kept_modes = modes[keep]
        mode_seq = np.concatenate([[lead_mode], kept_modes])
        if len(kept_events) > self.capacity:
            kept_events = kept_events[: self.capacity]
            mode_seq = mode_seq[: self.capacity + 1]
        return ModeSchedule.create(
            kept_events, mode_seq, capacity=self.capacity
        )


def time_until_next_touchdown(ms: ModeSchedule, t: float, leg: int) -> float:
    """Time from t until the leg's next planned swing->contact transition
    (+inf when none inside the schedule) — reference SingleLegLogic /
    GaitAdaptation::advanceSwingEvents."""
    events = np.asarray(ms.event_times, np.float64)
    modes = np.asarray(ms.mode_sequence)
    k = int(np.searchsorted(events, t, side="right"))
    in_contact = bool((int(modes[k]) >> leg) & 1)
    for j in range(k, min(len(events), int(ms.num_events))):
        nxt = bool((int(modes[j + 1]) >> leg) & 1)
        if not in_contact and nxt:
            return float(events[j] - t)
        in_contact = nxt
    return np.inf


def apply_early_touchdown(ms: ModeSchedule, t: float, early_legs) -> ModeSchedule:
    """Force the contact bit ON for the flagged legs from t until each leg's
    next planned touchdown (the reference's earlyTouchDownAdaptation:
    'removes the first swing phase for all legs flagged with earlyTouchdown',
    GaitAdaptation.h:63)."""
    events = np.asarray(ms.event_times, np.float64)
    modes = np.asarray(ms.mode_sequence, np.int64).copy()
    k0 = int(np.searchsorted(events, t, side="right"))
    n_ev = int(ms.num_events)
    for leg in np.nonzero(np.asarray(early_legs))[0]:
        in_contact_now = bool((int(modes[k0]) >> int(leg)) & 1)
        if in_contact_now:
            continue
        j = k0
        while j <= n_ev:
            if (int(modes[j]) >> int(leg)) & 1:
                break  # planned touchdown reached
            modes[j] |= 1 << int(leg)
            j += 1
    return ModeSchedule(
        event_times=np.asarray(ms.event_times),
        mode_sequence=modes.astype(np.int32),
        num_events=np.asarray(ms.num_events),
    )


@dataclasses.dataclass
class GaitAdaptationSettings:
    """Reference GaitAdaptationSettings (GaitAdaptation.h:15)."""

    early_touchdown_window: float = 0.1


class GaitAdaptation:
    """Contact-measurement-driven gait adaptation (reference GaitAdaptation,
    ocs2_switched_model_interface/logic/GaitAdaptation.h:19).

    Strategy (the reference's implemented case): a leg planned to SWING but
    MEASURED in contact within `early_touchdown_window` of its planned
    touchdown is flagged early-contact — its remaining swing is removed from
    the schedule, so the solver immediately treats it as a stance leg.  A
    leg must have lifted off since its last stance before a new touchdown
    can be recognized (hasLiftedSinceLastContact_)."""

    def __init__(
        self,
        settings: GaitAdaptationSettings = GaitAdaptationSettings(),
        num_legs: int = 4,
    ):
        self.settings = settings
        self._lifted = [False] * num_legs

    def advance(self, ms: ModeSchedule, measured_contacts, t: float) -> ModeSchedule:
        """One tick: update liftoff tracking and return the (possibly)
        adapted mode schedule."""
        desired = contact_flags_static(int(ms.mode_at_time(np.float32(t))))
        early = [False] * len(self._lifted)
        for leg in range(len(self._lifted)):
            planned_contact = desired[leg] > 0.5
            measured = bool(measured_contacts[leg])
            if not planned_contact and not measured:
                self._lifted[leg] = True
            if planned_contact and measured:
                self._lifted[leg] = False
            if (
                not planned_contact
                and measured
                and self._lifted[leg]
                and time_until_next_touchdown(ms, t, leg)
                <= self.settings.early_touchdown_window
            ):
                early[leg] = True
                self._lifted[leg] = False
        if any(early):
            return apply_early_touchdown(ms, t, early)
        return ms
