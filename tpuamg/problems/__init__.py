from . import bidomain
from .solve import solve_system, make_preconditioner, SolveReport

__all__ = ["bidomain", "solve_system", "make_preconditioner", "SolveReport"]
