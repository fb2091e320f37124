"""Mixed-precision iterative refinement: f32 device Krylov inside an f64
defect-correction loop reaches the reference's tolerances (1e-8/1e-10 —
/root/reference/src/bidomain_2d.py:205, emi_2d.py:211) that plain f32
cannot (bottoms out ~1e-6 relative)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpuamg.fem import mms
from tpuamg.problems.bidomain import Params, get_mesh, get_system
from tpuamg.problems.solve import solve_system
from tpuamg.config import AMGParameters


@pytest.mark.parametrize("gamma", [1e0, 1e6])
def test_refinement_reaches_1e10_with_f32_inner(gamma):
    p = Params(2.0, 3.0, gamma)
    data = mms.setup_bidomain_mms(p, dim=2)
    mesh = get_mesh(16, 2)
    A, b, sizes, _ = get_system(mesh, data, p)
    prm = AMGParameters(cycle_type="v", dtype="float32")
    rep = solve_system(A, b, "metric_mono", sizes, params=prm,
                       tol=1e-10, maxiter=80, grid=((17, 17), 2),
                       dtype=jnp.float32, refine=8, inner_tol=1e-5)
    assert rep.converged, rep.r_norm
    rel = np.linalg.norm(b - A.matvec(rep.x)) / np.linalg.norm(b)
    assert rel < 1e-10, rel
    # a single f32 solve cannot reach this
    rep1 = solve_system(A, b, "metric_mono", sizes, params=prm,
                        tol=1e-10, maxiter=200, grid=((17, 17), 2),
                        dtype=jnp.float32)
    rel1 = np.linalg.norm(b - A.matvec(rep1.x)) / np.linalg.norm(b)
    assert rel1 > 1e-9   # f32 floor — documents why refinement exists


def test_refinement_noop_when_already_converged():
    p = Params(2.0, 3.0, 1e2)
    data = mms.setup_bidomain_mms(p, dim=2)
    mesh = get_mesh(8, 2)
    A, b, sizes, _ = get_system(mesh, data, p)
    rep = solve_system(A, b, "metric_mono", sizes, tol=1e-8, maxiter=60,
                       grid=((9, 9), 2), refine=4, inner_tol=1e-9)
    # f64 path: first correction already lands below tol -> few steps
    assert rep.converged
    assert len(rep.residuals) <= 4
