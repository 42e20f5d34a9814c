from .gait import (
    GaitSchedule,
    ModeSequenceTemplate,
    ModeTimeline,
    GAIT_LIBRARY,
    mode_to_flags,
    flags_to_mode,
    STANCE,
    FLY,
)
from .swing import SwingConfig, compile_swing_references
from .reference import TargetTrajectories
from .problem import OcpConfig, StageData, build_stage_data, stage_cost, terminal_cost
