from .cg import pcg, pcg_split, CGResult
from .minres import minres
from .gmres import gmres

__all__ = ["pcg", "pcg_split", "CGResult", "minres", "gmres"]
