"""IO-layer tests: dump/load round trip, .dat parsing, tables, VTU."""
import numpy as np

from tpuamg.sparse import HostCSR
from tpuamg.io_utils import (dump_system, load_system, write_solution,
                             read_solution, parse_dat_file,
                             dat_to_amg_parameters, tabulate_simple,
                             ResultWriter, print_red)


def test_dump_load_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n = 30
    d = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.2)
    A = HostCSR.from_dense(d)
    b = rng.standard_normal(n)
    dump_system(A, b, (18, 12), str(tmp_path))
    A2, b2, idofs, idofs3d = load_system(str(tmp_path))
    np.testing.assert_allclose(A2.toarray(), A.toarray())
    np.testing.assert_allclose(b2, b)
    assert idofs.tolist() == list(range(18, 30))
    assert idofs3d.tolist() == list(range(18))


def test_solution_roundtrip(tmp_path):
    x = np.linspace(-1, 1, 17)
    write_solution(str(tmp_path), x)
    np.testing.assert_allclose(read_solution(str(tmp_path)), x)


def test_dat_parser():
    amg, sol = dat_to_amg_parameters("tpuamg/problems/input_metric.dat")
    assert amg.amg_type == "ua"    # MUA: the robust xd-1D default
    assert amg.cycle_type == "v"
    assert amg.aggregation_type == "hem"
    assert amg.schwarz_levels == 1
    assert amg.schwarz_maxlvl == 2
    assert amg.schwarz_mmsize == 500
    assert amg.schwarz_type == "symmetric"
    assert sol.method == "cg"
    assert sol.tolerance == 1e-6
    assert sol.maxiter == 1000


def test_reference_dat_file_parses():
    """Our parser must read the reference's own input file."""
    raw = parse_dat_file("/root/reference/src/input_metric.dat")
    assert raw["linear_itsolver_type"] == 1
    assert raw["AMG_type"] == "SA"
    amg, sol = dat_to_amg_parameters(
        "/root/reference/src/input_metric.dat")
    assert amg.amg_type == "sa" and sol.tolerance == 1e-6


def test_tabulate_and_writer(tmp_path, capsys):
    t = tabulate_simple([(1, 2.5), (10, 0.125)], ["a", "b"])
    assert "a" in t and "0.125" in t
    w = ResultWriter(str(tmp_path / "r.txt"), ["x", "y"])
    w.write_row((1, 2))
    w.write_row((3, 4))
    lines = (tmp_path / "r.txt").read_text().strip().splitlines()
    assert lines == ["x y", "1 2", "3 4"]
    assert print_red("hello") is not None


def test_vtu_writer(tmp_path):
    from tpuamg.fem import unit_square_mesh
    from tpuamg.io_utils.vtk import write_vtu, write_pvd
    m = unit_square_mesh(3)
    p = write_vtu(str(tmp_path / "u.vtu"), m, np.ones(m.num_vertices))
    txt = open(p).read()
    assert "UnstructuredGrid" in txt and "connectivity" in txt
    pvd = write_pvd(str(tmp_path / "u.pvd"), ["u.vtu"])
    assert "Collection" in open(pvd).read()


def test_coupling_dump_roundtrip(tmp_path):
    """Pi/Mq metric-factor dump extension: A == AD + gamma R^T Mq R."""
    import numpy as np
    from tpuamg.fem import unit_cube_mesh
    from tpuamg.problems.emi_3d1d import (synthetic_neuron_curve,
                                          get_system)
    from tpuamg.io_utils import dump_system, load_system, load_coupling
    mesh3d = unit_cube_mesh(5)
    curve = synthetic_neuron_curve(n_main=8, n_branches=1)
    gamma = 1e4
    A, b, sizes, (Pi, Mq) = get_system(mesh3d, curve, gamma=gamma,
                                       coupling_radius=0.2,
                                       return_coupling=True)
    d = str(tmp_path / "d")
    dump_system(A, b, sizes, d, coupling=(Pi, Mq), gamma=gamma)
    A2, b2, idofs, idofs3d = load_system(d)
    g2, Pi2, Mq2 = load_coupling(d)
    assert g2 == gamma
    n3, n1 = sizes
    # rebuild gamma * R^T Mq R from the loaded factors and check that
    # A - (that) has no dependence on gamma in the coupling block
    R = np.zeros((n1, n3 + n1))
    R[:, :n3] = -Pi2.toarray()
    R[:, n3:] = np.eye(n1)
    M = R.T @ Mq2.toarray() @ R
    AD = A2.toarray() - g2 * M
    # AD must be block diagonal (no 3d-1d coupling left)
    assert np.abs(AD[:n3, n3:]).max() < 1e-8 * np.abs(A2.toarray()).max()
