"""Problem-driver integration tests: EMI, 3D-1D pipeline (SURVEY.md §4)."""
import os

import numpy as np
import pytest

from tpuamg.fem import mms
from tpuamg.problems.emi import (Params, split_meshes, get_system,
                                 compute_errors)
from tpuamg.problems.solve import solve_system


def test_emi2d_rate_and_gamma():
    e0 = h0 = None
    for n in (16, 32):
        m1, m2, itf = split_meshes(n, 2)
        p = Params(2.0, 3.0, 5.0)
        data = mms.setup_emi_mms(p, dim=2)
        A, b, sizes, idofs = get_system(m1, m2, itf, data, p)
        rep = solve_system(A, b, "metric", sizes, idofs=idofs,
                           tol=1e-10, maxiter=200)
        assert rep.converged
        e1, _ = compute_errors(m1, m2, data, rep.x, sizes)
        if e0 is not None:
            rate = np.log(e1 / e0) / np.log(m1.hmin() / h0)
            assert 0.85 < rate < 1.2, rate
        e0, h0 = e1, m1.hmin()


def test_emi2d_p2_rate():
    """EMI P2 (the reference's -pdegree 2, emi_2d.py:58): H1 rate ~ 2."""
    e0 = h0 = None
    for n in (8, 16):
        m1, m2, itf = split_meshes(n, 2)
        p = Params(2.0, 3.0, 5.0)
        data = mms.setup_emi_mms(p, dim=2)
        A, b, sizes, idofs = get_system(m1, m2, itf, data, p, pdegree=2)
        rep = solve_system(A, b, "metric", sizes, idofs=idofs,
                           tol=1e-10, maxiter=300)
        assert rep.converged
        e1, e2 = compute_errors(m1, m2, data, rep.x, sizes, pdegree=2)
        if e0 is not None:
            rate = np.log(e1 / e0) / np.log(m1.hmin() / h0)
            assert 1.8 < rate < 2.3, rate
        e0, h0 = e1, m1.hmin()


def test_emi3d_p2_smoke():
    """3D EMI P2: assembles, solves, two-sided P2 interface dofs."""
    from tpuamg.fem.pk import P2Space
    m1, m2, itf = split_meshes(4, 3)
    p = Params(2.0, 3.0, 5.0)
    data = mms.setup_emi_mms(p, dim=3)
    A, b, sizes, idofs = get_system(m1, m2, itf, data, p, pdegree=2)
    idofs = np.unique(np.concatenate(
        [idofs, P2Space(m2).boundary_dofs((1,)) + sizes[0]]))
    rep = solve_system(A, b, "metric", sizes, idofs=idofs,
                       tol=1e-10, maxiter=300)
    assert rep.converged
    e1, e2 = compute_errors(m1, m2, data, rep.x, sizes, pdegree=2)
    assert e1 < 2.0 and e2 < 2.0


def test_emi2d_diag_precond():
    m1, m2, itf = split_meshes(16, 2)
    p = Params(2.0, 3.0, 5.0)
    data = mms.setup_emi_mms(p, dim=2)
    A, b, sizes, idofs = get_system(m1, m2, itf, data, p)
    from tpuamg.sparse.host import extract_diag_blocks
    blocks = extract_diag_blocks(A, sizes)
    rep = solve_system(A, b, "diag", sizes, blocks=blocks,
                       tol=1e-10, maxiter=300)
    assert rep.converged


def test_emi3d_smoke():
    m1, m2, itf = split_meshes(4, 3)
    p = Params(2.0, 3.0, 5.0)
    data = mms.setup_emi_mms(p, dim=3)
    A, b, sizes, idofs = get_system(m1, m2, itf, data, p)
    rep = solve_system(A, b, "metric", sizes, idofs=idofs,
                       tol=1e-10, maxiter=300)
    assert rep.converged
    e1, e2 = compute_errors(m1, m2, data, rep.x, sizes)
    assert e1 < 4.0 and e2 < 4.0   # coarse mesh; just sanity


def test_bidomain_3d_smoke():
    from tpuamg.problems.bidomain import (Params as BParams, get_mesh,
                                          get_system as bget,
                                          compute_errors as berr)
    p = BParams(2.0, 3.0, 1e4)
    data = mms.setup_bidomain_mms(p, dim=3)
    mesh = get_mesh(4, 3)
    A, b, sizes, _ = bget(mesh, data, p)
    idofs = np.arange(sizes[0], sum(sizes))
    rep = solve_system(A, b, "metric_mono", sizes, idofs=idofs,
                       tol=1e-8, maxiter=100)
    assert rep.converged and rep.niters < 40


def _write_neuron_h5(path, curve, extra_zero_edge=True):
    """Write a legacy-DOLFIN-layout HDF5 curve mesh: /mesh/coordinates,
    /mesh/topology, /curves group with per-edge radius values (0 = not
    part of the neuron, the marker the reference recolors,
    /root/reference/src/emi_3d1d.py:31-43)."""
    import h5py
    rng = np.random.default_rng(3)
    coords = curve.vertices
    topo = curve.cells.astype(np.int64)
    vals = rng.uniform(0.1, 1.0, len(topo))
    if extra_zero_edge:
        # spurious zero-marked edge to an otherwise-unused vertex: the
        # loader must drop both
        coords = np.vstack([coords, [[9.0, 9.0, 9.0]]])
        topo = np.vstack([topo, [[0, len(coords) - 1]]])
        vals = np.concatenate([vals, [0.0]])
    with h5py.File(path, "w") as h5:
        h5["/mesh/coordinates"] = coords
        h5["/mesh/topology"] = topo
        h5.create_group("curves")["values"] = vals


def test_load_neuron_h5(tmp_path):
    """DOLFIN-layout HDF5 round trip incl. /curves marker recoloring."""
    from tpuamg.problems.emi_3d1d import (load_neuron_h5,
                                          synthetic_neuron_curve)
    curve = synthetic_neuron_curve(n_main=10, n_branches=2)
    p = str(tmp_path / "neuron.h5")
    _write_neuron_h5(p, curve)
    m = load_neuron_h5(p)
    # the zero-marked edge and its orphan vertex are gone; the neuron
    # edges and vertices survive exactly
    assert m.num_vertices == curve.num_vertices
    assert len(m.cells) == len(curve.cells)
    assert np.allclose(m.vertices, curve.vertices)
    assert np.array_equal(np.sort(m.cells, axis=1),
                          np.sort(curve.cells, axis=1))


def test_emi_3d1d_neuron_h5_pipeline(tmp_path):
    """Real-mesh path end to end: HDF5 fixture -> -neuron_h5 dump ->
    offline solve (the production-scale pipeline of the reference)."""
    from tpuamg.problems.emi_3d1d import (main as emi_main,
                                          synthetic_neuron_curve)
    from tpuamg.problems.run_solver_3d1d import main as solver_main
    curve = synthetic_neuron_curve(n_main=10, n_branches=1)
    h5path = str(tmp_path / "neuron.h5")
    _write_neuron_h5(h5path, curve)
    d = str(tmp_path / "dump") + "/"
    o = str(tmp_path / "out") + "/"
    emi_main(["-gamma", "100", "-radius", "0.2", "-dump", "1",
              "-outdir", d, "-mesh_n", "6", "-neuron_h5", h5path])
    rep = solver_main(["-infile", "tpuamg/problems/input_metric.dat",
                       "-indir", d, "-outdir", o])
    assert rep.converged and rep.niters <= 30


def test_emi_3d1d_pipeline(tmp_path):
    """assemble -> dump -> offline solve -> load -> visualize round trip
    (SURVEY.md §3.4)."""
    from tpuamg.problems.emi_3d1d import main as emi_main
    from tpuamg.problems.run_solver_3d1d import main as solver_main
    from tpuamg.io_utils import read_solution

    dump = str(tmp_path / "dump") + "/"
    outd = str(tmp_path / "out") + "/"
    emi_main(["-gamma", "1", "-radius", "0.2", "-dump", "1",
              "-outdir", dump, "-mesh_n", "6"])
    for f in ("A.npy", "b.npy", "idofs.npy", "idofs3d.npy"):
        assert os.path.exists(os.path.join(dump, f))
    rep = solver_main(["-infile", "tpuamg/problems/input_metric.dat",
                       "-indir", dump, "-outdir", outd])
    assert rep.converged
    x = read_solution(outd)
    assert np.isfinite(x).all()
    # visualize
    import shutil
    shutil.copy(os.path.join(outd, "solution.txt"), dump)
    emi_main(["-gamma", "1", "-radius", "0.2", "-load_solution", dump,
              "-mesh_n", "6"])
    assert any(f.endswith(".vtu") for f in os.listdir(dump))


@pytest.mark.parametrize("gamma", ["1", "100000000"])
def test_emi_3d1d_gamma_robust(tmp_path, gamma):
    """Offline xd-1D solver must stay O(1) iterations across gamma —
    regression for the Schwarz-block truncation bug (weight-unaware
    mmsize capping silently dropped gamma-stiff couplings) and the
    nonsymmetric-GS-postsmoother bug (forward GS pre+post made the cycle
    nonsymmetric, invalidating CG)."""
    from tpuamg.problems.emi_3d1d import main as emi_main
    from tpuamg.problems.run_solver_3d1d import main as solver_main
    d = str(tmp_path / "dump") + "/"
    o = str(tmp_path / "out") + "/"
    emi_main(["-gamma", gamma, "-radius", "0.2", "-dump", "1",
              "-outdir", d, "-mesh_n", "6"])
    rep = solver_main(["-infile", "tpuamg/problems/input_metric.dat",
                       "-indir", d, "-outdir", o])
    assert rep.converged and rep.niters <= 25, (gamma, rep.niters)


def test_average_matrix_exactness():
    from tpuamg.fem import unit_cube_mesh
    from tpuamg.fem.coupling import average_matrix
    from tpuamg.problems.emi_3d1d import synthetic_neuron_curve
    mesh3d = unit_cube_mesh(6)
    curve = synthetic_neuron_curve(n_main=20, n_branches=2)
    c = np.array([1.0, -2.0, 0.5])
    f = mesh3d.vertices @ c + 0.3
    oncurve = curve.vertices @ c + 0.3
    for radius in (0.0, 0.04):
        Pi = average_matrix(mesh3d, curve, radius=radius)
        np.testing.assert_allclose(Pi.matvec(f), oncurve, atol=1e-10)


def test_bidomain_2d_driver_cli(tmp_path, monkeypatch):
    """End-to-end CLI driver writes reference-format result files."""
    monkeypatch.chdir(tmp_path)
    import sys
    from tpuamg.problems.bidomain_2d import run
    from tpuamg.problems.driver import standard_parser
    from tpuamg.problems.bidomain_2d import PRECONDS
    parser = standard_parser("metric_mono", PRECONDS)
    args, _ = parser.parse_known_args(
        ["-nrefs", "1", "-gamma", "100", "-precond", "metric_mono"])
    tables = run(args, dim=2, start_exp=4)
    assert len(tables.table_ksp) == 1
    from tpuamg.problems.driver import config_tag
    it_file = tmp_path / "results" / "bidomain_2d" / (
        f"iters_{config_tag(args)}.txt")
    assert it_file.exists()
    lines = it_file.read_text().strip().splitlines()
    assert lines[0].split() == ["ndofs", "niters", "cond", "timeKSP",
                                "r", "h"]
    assert len(lines) == 2
