"""Bidomain 3D experiment driver.

Rebuild of /root/reference/src/bidomain_3d.py: same system builder as 2D
(the reference reuses bidomain_2d.get_system, bidomain_3d.py:59) on the
unit cube, sweep ncells = 2^3 .. 2^(2+nrefs) (bidomain_3d.py:113), 3D MMS
u1 = cos(pi(x+y+2z)), u2 = sin(pi(x-y+z)).

Run:  python -m tpuamg.problems.bidomain_3d -nrefs 2 -precond metric_mono
"""
from __future__ import annotations

from .bidomain_2d import run
from .driver import standard_parser

PRECONDS = ("hazmath", "hazmath_Schwarz", "hazmath_HEM", "metric",
            "metric_mono", "metric_hazmath")

if __name__ == "__main__":
    parser = standard_parser("hazmath", PRECONDS)
    args, _ = parser.parse_known_args()
    run(args, dim=3, start_exp=3, name="bidomain_3d")
