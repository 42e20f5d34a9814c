from .pallas_chol import spd_solve, spd_solve_reference
