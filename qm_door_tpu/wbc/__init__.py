from .qp import solve_qp
from .hoqp import Task, solve_hierarchy
from .wbc import WbcState, hierarchical_wbc, hierarchical_mpc_wbc
