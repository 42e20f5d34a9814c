"""Gait command interface (GaitTopicPublisher / GaitJoyPublisher / GaitReceiver
replacement, qm_controllers/src/GaitTopicPublisher.cpp:75-105).

The ROS topic plumbing collapses to a direct host-side call: a named gait from
the 12-template library is inserted into the active GaitSchedule at the end of
the current MPC horizon — exactly when the reference's solver-synchronized
GaitReceiver applies it (at the next preSolverRun, taking effect after the
current horizon's committed plan).
"""
from __future__ import annotations

from ..ocp.gait import GAIT_LIBRARY, GaitSchedule, ModeSequenceTemplate


class GaitCommander:
    def __init__(self, schedule: GaitSchedule, time_horizon: float = 1.0):
        self.schedule = schedule
        self.time_horizon = time_horizon

    def command(self, gait_name: str, t_now: float):
        """Switch to a named gait (the '/gait_command_topic' role)."""
        if gait_name not in GAIT_LIBRARY:
            raise KeyError(
                f"unknown gait '{gait_name}'; available: {sorted(GAIT_LIBRARY)}"
            )
        template = GAIT_LIBRARY[gait_name]
        start = t_now + self.time_horizon
        self.schedule.insert_template(template, start, start + 2 * self.time_horizon)

    def command_template(self, template: ModeSequenceTemplate, t_now: float):
        start = t_now + self.time_horizon
        self.schedule.insert_template(template, start, start + 2 * self.time_horizon)

    def joy_buttons(self, buttons, t_now: float):
        """Joystick mapping (GaitJoyPublisher.cpp:35-60): button 0 -> trot,
        button 1 -> stance."""
        if buttons and buttons[0]:
            self.command("trot", t_now)
        elif len(buttons) > 1 and buttons[1]:
            self.command("stance", t_now)
