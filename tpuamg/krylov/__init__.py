from .cg import pcg, CGResult
from .minres import minres
from .gmres import gmres

__all__ = ["pcg", "CGResult", "minres", "gmres"]
