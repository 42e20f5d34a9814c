"""Door-opening closed loop: force-tracking NMPC + force-aware WBC + the
articulated door (BASELINE config #4; the reference demonstrates this on its
force-tracking branch in the push/pull-door Gazebo worlds,
qm_gazebo/launch/cs/{push,pull}_door.launch).

Scenario phases (host-side reference generation, re-planned every MPC cycle
from the *measured* door state — the reaching/levering/pushing equivalent of
the reference's target-publisher pipeline):

  1. reach  [0, t_reach):  EE pose target on the handle, no grasp, zero wrench.
  2. press  [t_reach, ...): grasp engaged (sim spring coupling on); wrench
     reference presses the lever down until the latch releases.
  3. push   (after latch release): wrench reference switches to a
     panel-normal push that swings the door open; the EE target follows the
     moving handle along its arc.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..config import QmConfig
from ..models import centroidal, kinematics, spatial
from ..models.model import RobotModel
from ..ocp.force import make_ocp_config_ft, widen_stage_data
from ..ocp.gait import GAIT_LIBRARY, GaitSchedule
from ..ocp.problem import build_stage_data
from ..ocp.reference import TargetTrajectories
from ..runtime.controller import QmController
from ..runtime.mrt import PolicyStore
from ..solver.sqp import SqpSolver
from ..wbc.wbc import WbcState
from .door import DoorConfig, DoorState, coupled_step, handle_position
from .sim import SimConfig, measured_rbd, sim_init


class DoorScenario(NamedTuple):
    """Door-opening sequencing (every constant is measurement-driven; the
    experiment log lives in the round-2 diag series).

    Sequence: reach -> press (lever past the latch) -> push (EE reference
    leads along the handle arc; the grasp spring transmits the drive) ->
    instant release at release_angle -> short settle -> brisk retract.

    Load-bearing findings baked in below:
    - the EE cost (mu 2000) out-muscles the base pose cost: an out-of-reach
      EE target DRAGS the base after it instead of failing to track, so
      push reach comes from lean_gain and targets are workspace-limited;
    - the grip spring (2000 N/m) dominates the light panel's momentum: any
      GRADUAL gate fade reels the swinging door back shut, so the let-go
      is a single control cycle, and the robot-side force step is absorbed
      by the counter-lean plus the post-release settle;
    - the stance arm's reach ceiling is panel ~ -0.42 at every lean gain;
      walking/trotting during or after the push measured unstable in all
      variants, so the door is released with momentum instead of escorted.
    """

    t_reach: float = 0.5        # settle + reach the handle
    t_unlatch_min: float = 0.3  # press at least this long before pushing
    # EE z-target depth below the handle while pressing the lever
    # (2000 N/m grasp spring: 15 mm ~ 30 N down, lever arm 0.1 m ~ 3 N m
    # against the 2 N m/rad return spring)
    press_depth: float = 0.015
    # shove end / coast start; the stance-arm reach ceiling is ~ -0.42
    open_target: float = -0.35
    # instant let-go at this angle (or t_coast_max); the light panel
    # (panel_inertia 2.4, tau = I/b = 12 s) then swings fully open on its
    # own momentum — measured to the -2.0 stop from a -0.38 release
    release_angle: float = -0.42
    # Coast window cap. 0.45 covers the grip-fade and un-lean ramps below
    # (the r4 rework shipped 0.02 — one MPC cycle — which made the ramps,
    # the unleaned release gate, and trot_at='coast' all inert, exactly the
    # r4 advisor finding; the 11 s r5 A/B measured the 0.45 coast cutting
    # the coast/done-phase MPC violation medians ~100x vs the 0.02 default)
    t_coast_max: float = 0.45
    coast_grip: float = 0.0     # gate target during the coast
    # Decoupled coast ramps (round-4 robustness work): the grip fade and the
    # base un-lean were one 0.3 s constant, which is wrong in BOTH
    # directions — a slow fade lets the stretched grasp spring BRAKE the
    # coasting door (measured: panel stalls at the open target), while a
    # fast coast releases with the robot still leaned and moving (measured:
    # forward dive within 0.4 s of the let-go on fp-level solver
    # perturbations). Fast fade frees the door's momentum; slow un-lean
    # sheds the ROBOT's momentum before the release gate opens.
    t_coast_grip: float = 0.3   # grip fade time within the coast
    t_coast_unlean: float = 0.3  # base un-lean ramp time within the coast
    # arc-lead rate of the EE reference: sets the door speed and with it
    # the grasp-spring transmission force; -0.5 measured a violent ride
    # (base z dips to 0.13 m mid-push), -0.3 keeps the push controlled
    door_rate_ref: float = -0.3
    # post-release: freeze the reference at the measured release pose for
    # t_settle, then retract the EE home over t_retract. BRISK on purpose:
    # the stand-with-arm-outstretched posture carries a slowly growing
    # pitch/roll oscillation (~2 s to divergence), so the arm comes home
    # before it grows.
    t_settle: float = 0.4
    t_retract: float = 1.0
    t_release_ramp: float = 0.0  # instant: see class docstring
    # capture-point offset: the robot crosses the release with ~0.2 m/s of
    # forward CoM velocity (the push lean keeps feeding it); freezing the
    # post-release base reference AT the release pose makes the controller
    # fight that momentum in place and it tips within ~0.4 s (measured, the
    # round-3 base trace). Instead the done-phase xy reference leads the
    # release pose by capture_gain * v_com_xy (the linear-inverted-pendulum
    # capture offset, ~sqrt(z/g) s), so the trot inserted at release steps
    # TO the momentum instead of against it; decays with the retract ramp.
    capture_gain: float = 0.35
    capture_max: float = 0.25   # m, offset clip
    # trot -> stance stand-down delay after the retract completes (the trot
    # inserted at release keeps stepping this long past settle+retract)
    t_stand_down: float = 0.5
    # ... and stand down only once the measured base xy speed is below this
    # (m/s): planting all four feet while the base still translates was the
    # collapse mode of both 11 s r5 baseline traces (the stance takes over
    # mid-stride and the robot stumbles sideways). The trot simply keeps
    # stepping until the momentum is actually shed.
    stand_down_speed: float = 0.15
    # Post-retract reference follow: once the arm is home, the xy/yaw
    # anchor low-passes toward the MEASURED pose (per MPC cycle). The
    # post-release trot carries a slow systematic drift (~0.15 m/s lateral
    # + yaw wander, the r3 'walk-off'); a frozen anchor turns that drift
    # into a growing tracking fight that ends in a stumble at ~2 s
    # post-release in every frozen-anchor variant (r5 V1-V6 series).
    # Following concedes the drift — the golden asserts attitude/height
    # bounds, not position — and hands the controller the same
    # target-at-current-pose problem the 10 s trot endurance golden
    # proves stable.
    follow_gain: float = 0.3
    # stance push: base reference lean toward the handle displacement
    # (fraction of the handle xy travel); the reach requirement — 0.15
    # measured the arm saturating before the open target
    lean_gain: float = 0.3
    # anticipatory LEFT counter-lean (m), scaled in with the panel angle:
    # the opening arc pulls the hand toward the hinge side and every
    # measured fall ended rolling right; pre-loading the CoM left buys the
    # margin that makes the instant release absorbable (the only measured
    # stable-through-release configurations carry it)
    lean_y: float = 0.05
    # handle spawn point relative to the spawn EE pose. The spawn arm pose
    # is the reach optimum in BOTH directions: placing the handle 0.18 m
    # closer measured the base backing up 0.29 m to fold the arm.
    handle_ahead: float = 0.06
    # step through the release: the let-go leaves the robot with forward
    # momentum the stance feet cannot absorb (measured: a slow forward
    # "controlled fall" at near-zero MPC violation ~1.4 s post-release);
    # inserting a trot at the release instant lets it catch that momentum
    # with a step, then stand down once settled
    trot_on_release: bool = True
    # when to insert that trot: "release" = the let-go instant (round-2/3
    # behavior), "coast" = the moment the push ends. The round-4 base-trace
    # diagnosis (scratch/r4): by the end of the push the grasp-spring lead
    # has dragged the base ~0.17 m forward at ~0.19 m/s — past the front
    # feet with the arm's mass ahead — so the robot NEEDS to step before
    # the release, not after; every stance-coast variant tipped within
    # 0.5 s while the trot-at-release catch was a numerics coin-flip.
    trot_at: str = "coast"
    # pull door (qm_description/urdf/doors/door_pull.urdf — the push door's
    # frame mounted mirrored, fixed-joint rpy +-1.5708 being the only URDF
    # difference): the hinge sits to the robot's LEFT and the panel swings
    # TOWARD the robot, so the drive phase pulls the handle in while the
    # base gives ground. Geometry only — the sequencing below is shared.
    pull: bool = False
    # --- alternative terminal behaviors (kept for experimentation; both
    # measured worse than release-with-momentum on the default door) ---
    # hold_open: push to open_target and keep gripping forever
    hold_open: bool = False
    # walk_in_at: insert a trot past this angle and transport the base
    # with the arc (measured: charges the robot through the doorway)
    walk_in_at: float = None
    walk: bool = False          # trot through the whole push (measured: falls)
    walk_gait: str = "trot"


# Pull-door preset (cs/pull_door_world.launch parity): mirrored mount plus
# re-tuned sequencing for the toward-the-robot swing. The drive phase PULLS
# the handle in, so the base gives ground with the arc (lean_gain up — the
# arm would fold against the body otherwise) and the lateral counter-lean
# flips sign (the hinge side, where the arc drags the hand, is now the LEFT).
PULL_SCENARIO = DoorScenario(
    pull=True,
    lean_gain=0.5,
    lean_y=-0.05,
    open_target=-0.30,
    release_angle=-0.36,
    door_rate_ref=-0.25,
)


@dataclass
class DoorLog:
    t: List[float] = field(default_factory=list)
    panel: List[float] = field(default_factory=list)
    lever: List[float] = field(default_factory=list)
    base_pose: List[np.ndarray] = field(default_factory=list)
    feet_z: List[np.ndarray] = field(default_factory=list)   # (4,) world foot heights
    ee_pos: List[np.ndarray] = field(default_factory=list)
    ee_err: List[float] = field(default_factory=list)
    wrench_plan: List[np.ndarray] = field(default_factory=list)
    mpc_viol: List[float] = field(default_factory=list)
    mpc_t: List[float] = field(default_factory=list)
    mpc_phase: List[str] = field(default_factory=list)
    safe: bool = True


class DoorOpeningRunner:
    """Closed-loop door opening with the full force-tracking stack."""

    def __init__(
        self,
        model: RobotModel,
        cfg: QmConfig,
        door_cfg: Optional[DoorConfig] = None,
        scenario: DoorScenario = DoorScenario(),
        sim_cfg: SimConfig = SimConfig(),
        control_decimation: int = 2,
        mpc_decimation: int = 10,
    ):
        self.model = model
        self.cfg = cfg
        self.scenario = scenario
        self.sim_cfg = sim_cfg
        # Door contact is a large, fast-changing disturbance relative to
        # trot: one SQP iteration per 100 Hz solve leaves the nonlinear
        # defects growing through the push (measured); two keeps them
        # bounded at twice the per-cycle cost (still real-time scale).
        cfg.sqp.sqp_iterations = max(cfg.sqp.sqp_iterations, 2)
        self.ocp = make_ocp_config_ft(model, cfg)
        self.solver = SqpSolver(model, self.ocp, cfg)
        self.controller = QmController(model, cfg, force_tracking=True)
        self.control_decimation = control_decimation
        self.mpc_decimation = mpc_decimation
        self.schedule = GaitSchedule()  # stance until the push inserts trot

        # Place the door FACING the robot: the panel plane runs along y
        # (hinge_yaw = pi/2) with the hinge 0.8 m to the robot's right, and
        # the handle a hand-width ahead of the spawn EE pose. Opening
        # (negative panel angle) then moves the handle mostly FORWARD, away
        # from the robot — the geometry of a real push door. (A panel along
        # x would sweep the handle sideways through a 0.8 m arc that no
        # fixed-base or walking reach can track; measured roll-over.)
        x0 = jnp.asarray(cfg.initial_state())
        _, p_ee = kinematics.ee_pose(model, x0[6:30])
        if door_cfg is None:
            handle_target = np.asarray(p_ee) + np.array(
                [scenario.handle_ahead, 0.0, 0.0])
            base = DoorConfig()
            ox, oy, oz = base.handle_offset
            # push: hinge 0.8 m to the robot's right (yaw +pi/2), opening
            # moves the handle AWAY (+x). pull: the mirrored mount (yaw
            # -pi/2, hinge 0.8 m to the robot's left), opening moves the
            # handle TOWARD the robot (-x) — door_pull.urdf's flipped frame.
            yaw0 = -np.pi / 2 if scenario.pull else np.pi / 2
            c, s = np.cos(yaw0), np.sin(yaw0)
            off = np.array([c * ox - s * oy, s * ox + c * oy])
            door_cfg = base._replace(
                hinge_yaw=yaw0,
                hinge_pos=(float(handle_target[0] - off[0]),
                           float(handle_target[1] - off[1])),
                handle_offset=(ox, oy, float(handle_target[2])),
                # hollow-core interior door (~9 kg slab: m w^2/3 = 2.4) —
                # DoorConfig's default 8.53 models a heavy solid slab; the
                # reference URDF's own panel inertial is a 0.1 kg
                # placeholder, so the lumped value is a free design choice
                # and the heavy slab measurably cannot be let go of by a
                # stance robot (its momentum/coast forces exceed the
                # balance margin at every tried release sequencing)
                panel_inertia=2.4,
            )
        self.door_cfg = door_cfg

    # --- reference generation per MPC cycle -------------------------------

    def _phase(self, t, door: DoorState):
        sc = self.scenario
        # sticky: grip jitter can let the lever spring back above the latch
        # threshold for a moment; once the latch released, it stays released
        if (float(door.lever) < self.door_cfg.latch_release
                or float(door.angle) < -1e-3):
            self._unlatched = True
        if getattr(self, "_done", False):
            return "done"  # grasp released, door open, hold posture
        if sc.hold_open:
            if getattr(self, "_holding", False) or float(door.angle) <= sc.open_target:
                self._holding = True
                return "hold"
        coasting = getattr(self, "_t_coast", None) is not None
        if (not sc.hold_open) and (coasting or float(door.angle) <= sc.open_target):
            if not coasting:
                self._t_coast = t
            unleaned = t >= self._t_coast + sc.t_coast_unlean  # ramp complete
            if ((float(door.angle) <= sc.release_angle and unleaned)
                    or t >= self._t_coast + sc.t_coast_max):
                self._done = True
                self._a_release = float(door.angle)
                self._t_done = t
                # the done ramp continues the coast's gate fade from its
                # current value (a restart from coast_grip would step)
                self._g_release = self._grasp("coast", t)
                return "done"
            return "coast"
        if t < sc.t_reach:
            return "reach"
        if getattr(self, "_unlatched", False) and t >= sc.t_reach + sc.t_unlatch_min:
            return "push"
        return "press"

    def _grasp(self, phase, t):
        """Grasp gate in [0, 1]: on through press/push, loosened through the
        coast (DoorScenario.coast_grip), ramped off after release."""
        if phase == "reach":
            return 0.0
        if phase == "hold":
            return 1.0  # never lets go
        if phase == "coast":
            # soften in step with the target-lead decay (see _targets):
            # simultaneous fast grip + target changes measured a lurch
            r = min(1.0, (t - self._t_coast) / max(self.scenario.t_coast_grip, 1e-9))
            return float((1.0 - r) * 1.0 + r * self.scenario.coast_grip)
        if phase == "done":
            r = self.scenario.t_release_ramp
            if r <= 0.0:
                return 0.0
            g0 = getattr(self, "_g_release", self.scenario.coast_grip)
            return float(g0 * np.clip(1.0 - (t - self._t_done) / r, 0.0, 1.0))
        return 1.0

    def _wrench_world(self, phase, F_meas):
        """Reference wrench ON THE ROBOT = the MEASURED grasp force, smoothed.

        Admittance design, the fix for a measured tip-over mode: a
        feedforward wrench reference the spring does not actually deliver
        makes the MPC lean against a phantom force (it plans contact forces
        for a +25 N reaction while the real stretch force is near zero) and
        the robot rolls over before the door moves. With the reference tied
        to the measured interaction force the solver's internal model always
        matches reality; the door is DRIVEN by the EE position reference
        marching along the handle arc, and the force follows the stretch.
        """
        w = np.zeros(6)
        # "done" stays admittance-tracked through the release ramp: F_meas
        # arrives pre-gated by the grasp gate, so w fades with the coupling
        if phase in ("press", "push", "coast", "hold", "done"):
            alpha = 0.5
            self._w_ref = (1 - alpha) * self._w_ref + alpha * np.asarray(F_meas)
            w[0:3] = self._w_ref
        else:
            self._w_ref = np.zeros(3)
        return w

    def _targets(self, phase, door: DoorState, ee_quat_hold, t=0.0):
        """EE target on the handle. During the push the target PREDICTS the
        handle's arc over the MPC horizon (a static current-handle target
        makes the arm lag the moving handle by a full reaction time —
        measured as a growing grasp-spring stretch); through the braking
        hold it keeps following the handle (the hand never lets go). After
        release (done) the arm RETRACTS to the home EE pose carried along
        with the base reference — holding the swung-away handle point keeps
        an unreachable target in the EE cost and the 1-iteration SQP
        violation ratchets up (measured 8.6e4)."""
        sc = self.scenario
        if phase == "push":
            # Predict the panel angle with a blend of the measured rate and
            # the arc-lead setpoint (so the target leads a static door),
            # saturated at the open target where the coast takes over.
            dts = np.linspace(0.0, 1.2, 8)
            # capped at the reference rate: an uncapped blend self-reinforces
            # (fast door -> fast lead -> more pull) and measured 0.7 rad/s at
            # the coast handoff, leaving no time to un-lean before the
            # release angle
            # capped at the reference rate: an uncapped blend self-reinforces
            # (fast door -> fast lead -> more pull; measured 0.7 rad/s at
            # the coast handoff)
            rate_pred = np.clip(
                0.5 * (float(door.rate) + sc.door_rate_ref),
                sc.door_rate_ref, 0.0,
            )
            angles = np.clip(
                float(door.angle) + rate_pred * dts,
                sc.open_target, 0.0,
            )
        elif phase == "coast":
            # ride the handle with the horizon lead DECAYING to zero over
            # 0.3 s: an instant switch from the push's led targets to a
            # static handle target re-plans the whole horizon in one step
            # (the terminal EE reference jumps ~0.25 m backward; measured
            # 1e3-scale violation spikes and a physical lurch at every
            # discontinuous variant), while a static lead keeps dragging
            # the base after the departing handle
            dts = np.linspace(0.0, 1.2, 8)
            beta = min(1.0, max(0.0, (t - self._t_coast)
                                / max(sc.t_coast_grip, 1e-9)))
            rate_pred = (1.0 - beta) * np.clip(
                0.5 * (float(door.rate) + sc.door_rate_ref),
                sc.door_rate_ref, 0.0,
            )
            angles = np.clip(
                float(door.angle) + rate_pred * dts,
                sc.release_angle, 0.0,
            )
        elif phase == "done":
            dts = np.array([0.0, 1e5])
            angles = np.full(2, self._a_release)
            # settle (s = 0: everything held at the measured release pose),
            # then smooth retract: measured EE at release -> home pose
            # transported by the base pose held at release (an instantaneous
            # jump of the EE target from the outstretched handle to the
            # retract point measurably tips the robot over)
            t0 = self._t_done + sc.t_settle
            if sc.t_retract <= 0.0:
                s = 0.0  # hold the release posture (see t_retract)
            else:
                s = min(1.0, max(0.0, (t - t0) / sc.t_retract))
            yaw_ref = self._x_done[9]
            c, sn = np.cos(yaw_ref), np.sin(yaw_ref)
            Rz2 = np.array([[c, -sn], [sn, c]])
            rel = self._ee_home[0:2] - np.asarray(self._x_nom)[6:8]
            cap_ee = np.clip(self.scenario.capture_gain * self._x_done[0:2],
                             -self.scenario.capture_max,
                             self.scenario.capture_max)
            p_ret = np.concatenate([
                self._x_done[6:8] + cap_ee + Rz2 @ rel, [self._ee_home[2]]
            ])
            p_t = (1.0 - s) * self._p_ee_done + s * p_ret
            quat = spatial.quat_mul(
                spatial.rot_to_quat(spatial.zyx_to_rot(
                    jnp.array([yaw_ref, 0.0, 0.0]))),
                ee_quat_hold,
            )
            x = np.asarray(self._x_nom).copy()
            # hold the release xy/yaw and RAMP the height/tilt reference from
            # the measured release pose to upright-nominal over the retract
            # (both step variants measured unstable: holding the crouched,
            # tilted release pose verbatim tips slowly; snapping to nominal
            # at release dives forward while walking momentum is still live);
            # the capture offset (see DoorScenario.capture_gain) leads the
            # frozen pose by the release CoM velocity so the recovery step
            # lands under the momentum.
            # The xy reference STAYS at the capture-led release pose — the
            # r4 traces blended it back to the SPAWN pose with the retract
            # ramp, which commands a 0.3-0.5 m walk home exactly while the
            # trot is told to stand down; both 11 s r5 baselines fell ~3 s
            # post-release in that commanded-translation window (lateral
            # walk-off -> collapse). Recovering in place removes the
            # commanded motion entirely; only height/tilt return to nominal.
            cap = np.clip(sc.capture_gain * self._x_done[0:2],
                          -sc.capture_max, sc.capture_max)
            x[6:8] = self._x_done[6:8] + cap
            x[8] = (1.0 - s) * self._x_done[8] + s * x[8]
            x[9] = yaw_ref
            x[10:12] = (1.0 - s) * self._x_done[10:12]
            xj = jnp.concatenate([jnp.asarray(x), jnp.asarray(p_t), quat])
            return TargetTrajectories.create(
                jnp.asarray(t + dts), jnp.stack([xj, xj]),
                jnp.zeros((2, 30)),
            )
        elif phase == "hold":
            # frozen on the held-open handle point; the grasp spring brakes
            # the door's (capped) momentum and keeps it there
            dts = np.array([0.0, 1e5])
            angles = np.full(2, sc.open_target)
        else:
            dts = np.array([0.0, 1e5])
            angles = np.full(2, float(door.angle))
        x_base = np.asarray(self._x_nom)
        if phase == "coast":
            c_un = min(1.0, max(0.0, (t - self._t_coast)
                                / max(sc.t_coast_unlean, 1e-9)))
            # Coast base anchor = the MEASURED base at coast entry plus the
            # LIP capture lead — NOT the spawn-anchored un-lean target. By
            # the end of the push the base is ~0.2 m past its spawn pose
            # (grasp-spring lead) and moving; referencing the spawn pose
            # plans the trot's footholds at the OLD footprint, so the robot
            # stays balanced on its front support edge through the whole
            # coast and tips 0.3-2 s after release (all five r5 11 s A/B
            # variants, incl. hold-lean and trot-at-release). Anchoring at
            # the measured state re-centers the planned footholds under the
            # actual robot; the capture term leads its residual momentum.
            cap_c = np.clip(sc.capture_gain * self._x_coast[0:2],
                            -sc.capture_max, sc.capture_max)
            coast_xy = self._x_coast[6:8] + cap_c
        states = []
        for a in angles:
            d = door.replace(angle=jnp.asarray(a, dtype=jnp.float64))
            p_t = np.asarray(handle_position(self.door_cfg, d, jnp.float64))
            if phase == "press":
                # press the lever by targeting below the handle
                p_t = p_t - np.array([0.0, 0.0, sc.press_depth])
            if phase == "coast":
                # workspace clip: an out-of-reach EE target does not make
                # the arm reach further, it DRAGS THE BASE through the
                # 2000-weight EE cost (measured 0.3 m of forward drift in
                # every un-clipped coast variant); the loose grip stretches
                # over the clipped gap while the door coasts free
                base_ref = coast_xy
                center = base_ref + (self._ee_home[0:2]
                                     - np.asarray(self._x_nom)[6:8])
                delta = p_t[0:2] - center
                dist = float(np.linalg.norm(delta))
                r_max = 0.12
                if dist > r_max:
                    p_t = p_t.copy()
                    p_t[0:2] = center + delta * (r_max / dist)
            x = x_base.copy()
            quat = ee_quat_hold
            if phase == "push" and sc.walk:
                # walking variant: the spawn geometry base<-handle is
                # rigid-transported with the panel, so the handle stays at
                # the spawn-relative reach and the whole body follows the
                # arc instead of leaning
                c, sn = np.cos(a), np.sin(a)
                Rz2 = np.array([[c, -sn], [sn, c]])
                rel = x_base[6:8] - self._handle0[0:2]
                x[6:8] = p_t[0:2] + Rz2 @ rel
                x[9] = a
                quat = spatial.quat_mul(
                    spatial.rot_to_quat(spatial.zyx_to_rot(
                        jnp.array([a, 0.0, 0.0]))),
                    ee_quat_hold,
                )
            elif phase in ("push", "hold"):
                # stance push/hold: lean the base reference a fraction of
                # the handle's travel; past the walk-in angle the base
                # additionally FOLLOWS the handle 1:1 (the trot carries it)
                x[6:8] = x_base[6:8] + sc.lean_gain * (
                    p_t[0:2] - self._handle0[0:2])
                x[7] += sc.lean_y * min(1.0, abs(a) / 0.3)
                if getattr(self, "_a_walk_in", None) is not None:
                    d_in = door.replace(angle=jnp.asarray(
                        self._a_walk_in, dtype=jnp.float64))
                    p_in = np.asarray(handle_position(
                        self.door_cfg, d_in, jnp.float64))
                    adv = p_t[0:2] - p_in[0:2]
                    # only the part beyond the walk-in point, minus the
                    # lean share already applied above
                    x[6:8] = x[6:8] + (1.0 - sc.lean_gain) * np.where(
                        np.abs(adv) > 0, adv, 0.0)
            elif phase == "coast":
                # ride loosely at the measured-anchor pose (see coast_xy
                # above); the lateral counter-lean still fades with c_un
                x[6:8] = coast_xy
                x[7] += (1.0 - c_un) * sc.lean_y
            states.append(jnp.concatenate([
                jnp.asarray(x), jnp.asarray(p_t), quat
            ]))
        return TargetTrajectories.create(
            jnp.asarray(t + dts), jnp.stack(states),
            jnp.zeros((len(angles), 30)),
        )

    # --- main loop --------------------------------------------------------

    def run(self, duration: float = 3.0) -> DoorLog:
        model, cfg, sc = self.model, self.cfg, self.scenario
        x_init = jnp.asarray(cfg.initial_state())
        q0 = centroidal.pinocchio_q(x_init)
        feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
        q0 = q0.at[2].add(self.sim_cfg.terrain_height - feet_z)
        self._x_nom = x_init.at[8].set(float(q0[2]))
        sim = sim_init(model, q0, cfg=self.sim_cfg)
        door = DoorState.init(dtype=jnp.float64)

        R_ee0, p_ee0 = kinematics.ee_pose(model, q0)
        ee_quat_hold = spatial.rot_to_quat(R_ee0)
        self._ee_home = np.asarray(p_ee0)
        self._done = False
        self._unlatched = False
        self._t_coast = None
        self._x_coast = None
        self._holding = False
        self._a_walk_in = None
        self._walking = False
        self._x_done = None
        self._p_ee_done = None
        self._t_done = 0.0
        self._handle0 = np.asarray(
            handle_position(self.door_cfg, door, jnp.float64))

        rbd_est = measured_rbd(model, sim)
        x_obs = centroidal.centroidal_state_from_rbd(model, rbd_est)
        self._w_ref = np.zeros(3)

        def make_stage(t, phase, sim, door):
            from .door import grasp_wrench

            targets = self._targets(phase, door, ee_quat_hold, t)
            stage = build_stage_data(model, cfg, self.schedule, targets, t)
            grasp_now = self._grasp(phase, t)
            F_meas = grasp_now * np.asarray(
                grasp_wrench(model, self.door_cfg, door, sim.q, sim.v)[0])
            w = self._wrench_world(phase, F_meas)
            n_nodes = stage.times.shape[0]
            return widen_stage_data(
                stage,
                np.full(n_nodes, grasp_now),
                np.tile(w, (n_nodes, 1)),
            )

        phase = self._phase(0.0, door)
        stage = make_stage(0.0, phase, sim, door)
        sol = self.solver.solve(stage, x_obs)
        sol = self.solver.solve(stage, x_obs, warm=(sol.times, sol.X, sol.U))
        policy = PolicyStore(times=sol.times, X=sol.X, U=sol.U)

        wbc_state = WbcState.init(dtype=x_init.dtype, nu=36)
        log = DoorLog()
        command = None
        n_steps = int(round(duration / self.sim_cfg.dt))
        dt = self.sim_cfg.dt
        ctrl_period = dt * self.control_decimation

        for step in range(n_steps):
            t = step * dt
            phase = self._phase(t, door)
            if self._t_coast is not None and self._x_coast is None:
                # measured state at coast entry: the coast reference anchor
                self._x_coast = np.asarray(
                    centroidal.centroidal_state_from_rbd(model, rbd_est))
            if phase == "push" and sc.walk and not self._walking:
                # walk with the door: trot from the first push cycle
                self._walking = True
                self.schedule.insert_template(
                    GAIT_LIBRARY[sc.walk_gait], t, t + 60.0)
            if (phase in ("push", "hold") and sc.walk_in_at is not None
                    and float(door.angle) <= sc.walk_in_at
                    and not self._walking):
                # step in: the stance arm is at its reach ceiling
                self._walking = True
                self._a_walk_in = float(door.angle)
                self.schedule.insert_template(
                    GAIT_LIBRARY[sc.walk_gait], t, t + 60.0)
            if (phase == "coast" and sc.trot_on_release
                    and sc.trot_at == "coast" and not self._walking):
                # step BEFORE the release: the push leaves the base moving
                # forward past the front feet (see trot_at docstring) — the
                # trot starts catching that momentum while the grip fades,
                # so the let-go happens mid-step instead of from a
                # statically-unstable stance
                self._walking = True
                self.schedule.insert_template(
                    GAIT_LIBRARY[sc.walk_gait], t, t + 60.0)
            if phase == "done" and self._x_done is None:
                # freeze the retract anchor at the measured release state
                self._x_done = np.array(
                    centroidal.centroidal_state_from_rbd(model, rbd_est))
                self._p_ee_done = np.asarray(rbd_est[48:51])
                if sc.trot_on_release and not self._walking:
                    # step through the release: catch the forward momentum
                    self._walking = True
                    self.schedule.insert_template(
                        GAIT_LIBRARY[sc.walk_gait], t, t + 60.0)
            rbd_np = np.asarray(rbd_est)
            settled = (
                float(np.linalg.norm(rbd_np[27:29])) < sc.stand_down_speed
                and abs(float(rbd_np[26])) < 2.0 * sc.stand_down_speed  # yaw rate
                and float(np.abs(rbd_np[1:3]).max()) < 0.15             # tilt
            )
            if (self._walking and self._x_done is not None
                    and t >= self._t_done + sc.t_settle + sc.t_retract + sc.t_stand_down
                    and settled):
                # keep trotting through the release + retract (the robot
                # carries walking momentum at release; an instant all-stance
                # schedule plants flags on airborne feet and the slow tip-over
                # that follows is measured) — stand down only once settled
                # AND actually slow (see DoorScenario.stand_down_speed)
                self._walking = False
                self.schedule.insert_template(
                    GAIT_LIBRARY["stance"], t, t + 60.0)
            grasp_now = self._grasp(phase, t)

            if step % self.mpc_decimation == 0 and step > 0:
                x_obs = centroidal.centroidal_state_from_rbd(model, rbd_est)
                if phase == "done" and self._x_done is not None:
                    # from the release on: anchor follows the measured pose
                    # (see DoorScenario.follow_gain). The r5 V7 trace is the
                    # measurement behind "from the release" rather than
                    # "after the retract": with the anchor frozen through
                    # settle+retract the robot collapsed at ~t_done+1.4
                    # (every frozen-anchor variant did, V1-V7), while the
                    # follow-mode window that followed RECOVERED it from a
                    # belly-down collapse back to standing — the follow
                    # reference is the stable regime, the frozen fight is
                    # the falling one.
                    meas = np.asarray(x_obs)
                    self._x_done[6:8] += sc.follow_gain * (
                        meas[6:8] - self._x_done[6:8])
                    self._x_done[9] += sc.follow_gain * (
                        meas[9] - self._x_done[9])
                    # the capture lead decays with the momentum it led
                    self._x_done[0:2] *= (1.0 - sc.follow_gain)
                stage = make_stage(t, phase, sim, door)
                sol = self.solver.solve(stage, x_obs, warm=(sol.times, sol.X, sol.U))
                policy = PolicyStore(times=sol.times, X=sol.X, U=sol.U)
                log.mpc_viol.append(float(sol.constraint_violation))
                log.mpc_t.append(t)
                log.mpc_phase.append(phase)

            if step % self.control_decimation == 0 or command is None:
                flags = jnp.asarray(
                    self.schedule.contact_flags_at(t), dtype=x_init.dtype
                )
                res = self.controller.tick(
                    policy, flags, rbd_est, wbc_state, t, ctrl_period,
                    grasp=grasp_now,
                )
                wbc_state = res.wbc_state
                command = jnp.stack([
                    res.command.pos_des, res.command.vel_des,
                    res.command.kp, res.command.kd, res.command.tau_ff,
                ])
                if not bool(res.safe):
                    log.safe = False
                    break
                p_h = np.asarray(handle_position(self.door_cfg, door, jnp.float64))
                log.t.append(t)
                log.panel.append(float(door.angle))
                log.lever.append(float(door.lever))
                log.base_pose.append(np.asarray(sim.q[0:6]))
                log.feet_z.append(np.asarray(
                    kinematics.contact_positions(model, sim.q)[:, 2]))
                log.ee_pos.append(np.asarray(rbd_est[48:51]))
                log.ee_err.append(float(np.linalg.norm(np.asarray(rbd_est[48:51]) - p_h)))
                log.wrench_plan.append(np.asarray(res.u_opt[30:36]))

            sim, door = coupled_step(
                model, self.sim_cfg, self.door_cfg, sim, door, command,
                latched=True, grasp_on=grasp_now,
            )
            rbd_est = measured_rbd(model, sim)

        return log
