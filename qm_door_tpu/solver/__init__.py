from .transcription import linearize_ocp, project_ocp, LqProblem, ProjectedLq
from .riccati import riccati_backward, riccati_forward, lqr_solve
from .sqp import SqpSolver, SqpSolution, sqp_iteration, evaluate_trajectory
