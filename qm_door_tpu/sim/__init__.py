from .sim import SimConfig, SimState, sim_init, sim_step, contact_flags_from_sim
from .closed_loop import ClosedLoopRunner, ClosedLoopLog
