"""EMI 3D experiment driver.

Rebuild of /root/reference/src/emi_3d.py: split unit cube (utils.py:225),
reuses the EMI system builder (emi_3d.py:67), two-sided interface dof
union (emi_3d.py:134-138), sweep ncells = 2^2 .. (emi_3d.py:119).

Run:  python -m tpuamg.problems.emi_3d -nrefs 2 -precond metric
"""
from __future__ import annotations

from .emi_2d import run, PRECONDS
from .driver import standard_parser

if __name__ == "__main__":
    parser = standard_parser("metric", PRECONDS)
    args, _ = parser.parse_known_args()
    run(args, dim=3, start_exp=2, name="emi_3d")
