"""Pedigree algebra: Meuwissen-Luo inbreeding, Henderson A-inverse, and
the COO segment-sum SpMV, all against dense tabular oracles."""
import numpy as np
import pytest

import miraculix_tpu as mx
from miraculix_tpu import pedigree as ped


def test_mrode_textbook_pedigree():
    """The 6-animal example from Mrode (Linear Models for the Prediction
    of Animal Breeding Values, ch. 2): known A and A^-1 entries."""
    #      animal: 1  2  3  4  5  6
    sire = np.array([0, 0, 1, 1, 4, 5])
    dam = np.array([0, 0, 2, 0, 3, 2])
    a = ped.a_matrix(sire, dam)
    # textbook values (Mrode Table 2.1)
    assert abs(a[4, 4] - 1.125) < 1e-12          # animal 5 inbred F=0.125
    assert abs(a[0, 2] - 0.5) < 1e-12            # parent-offspring
    assert abs(a[2, 4] - 0.625) < 1e-12
    assert abs(a[4, 5] - 0.6875) < 1e-12
    f = ped.inbreeding(sire, dam)
    np.testing.assert_allclose(f, np.diag(a) - 1, atol=1e-12)

    r, c, v = ped.a_inverse(sire, dam)
    ainv = np.zeros_like(a)
    np.add.at(ainv, (r, c), v)
    np.testing.assert_allclose(ainv, np.linalg.inv(a), atol=1e-10)


@pytest.mark.parametrize("unknown_rate", [0.0, 0.15])
def test_henderson_inverts_tabular(unknown_rate):
    sire, dam = ped.simulate_pedigree(300, n_founders=30, seed=2,
                                      unknown_rate=unknown_rate)
    a = ped.a_matrix(sire, dam)
    r, c, v = ped.a_inverse(sire, dam)
    ainv = np.zeros_like(a)
    np.add.at(ainv, (r, c), v)
    np.testing.assert_allclose(ainv @ a, np.eye(300), atol=1e-9)


def test_inbreeding_matches_tabular_diag():
    sire, dam = ped.simulate_pedigree(400, n_founders=25, seed=5)
    f = ped.inbreeding(sire, dam)
    a = ped.a_matrix(sire, dam)
    np.testing.assert_allclose(f, np.diag(a) - 1, atol=1e-12)
    assert f.max() > 0.01  # the simulated pedigree actually inbreeds


def test_no_inbreeding_override():
    sire, dam = ped.simulate_pedigree(100, n_founders=10, seed=3)
    r, c, v = ped.a_inverse(sire, dam, f=np.zeros(100))
    # classical rules: alpha in {1, 4/3, 2} only
    diag_alpha = v[(r == c)]
    assert np.all(np.isfinite(diag_alpha))


def test_pedigree_validation():
    with pytest.raises(ValueError):
        ped.check_pedigree(np.array([2, 0]), np.array([0, 0]))  # younger
    with pytest.raises(ValueError):
        ped.check_pedigree(np.array([0, 3]), np.array([0, 0]))  # out of rng


def test_sparse_coo_matvec_and_diag():
    rng = np.random.default_rng(0)
    sire, dam = ped.simulate_pedigree(256, n_founders=20, seed=7)
    r, c, v = ped.a_inverse(sire, dam)
    sp = ped.SparseCOO(r, c, v, (256, 256))
    dense = sp.to_dense()
    x = rng.standard_normal((256, 4)).astype(np.float32)
    got = np.asarray(sp.matvec(x))
    want = dense @ x
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5
    np.testing.assert_allclose(np.asarray(sp.diag()), np.diag(dense),
                               rtol=1e-6)
    # transpose apply on a rectangular slice
    sp12 = ped.SparseCOO(r[:100], c[:100], v[:100], (256, 256))
    d12 = sp12.to_dense()
    got_t = np.asarray(sp12.matvec(x, trans="t"))
    np.testing.assert_allclose(got_t, d12.T @ x, rtol=1e-4, atol=1e-5)


def test_read_pedigree_recodes_and_sorts(tmp_path):
    """Arbitrary labels, out-of-order lines, implicit founders, comments,
    NA conventions — the reader must land on a valid parents-first coding
    that reproduces the same A matrix as a hand-coded pedigree."""
    ped_file = tmp_path / "ped.txt"
    ped_file.write_text(
        "# toy pedigree\n"
        "calf1  bullA  cowB\n"          # parents defined BELOW / implicitly
        "calf2  bullA  NA\n"
        "cowB   .      0\n"
        "calf3  calf1  cowB\n"
    )
    sire, dam, labels = ped.read_pedigree(str(ped_file))
    n = len(labels)
    assert n == 5  # bullA added as implicit founder
    ped.check_pedigree(sire, dam)  # parents-first holds
    code = {lab: i + 1 for i, lab in enumerate(labels)}
    # relationships must match the hand-coded equivalent:
    # 1=bullA 2=cowB 3=calf1(1,2) 4=calf2(1,0) 5=calf3(3,2)
    hs = np.array([0, 0, 1, 1, 3])
    hd = np.array([0, 0, 2, 0, 2])
    a_hand = ped.a_matrix(hs, hd)
    a_got = ped.a_matrix(sire, dam)
    perm = np.array([code[x] - 1 for x in
                     ["bullA", "cowB", "calf1", "calf2", "calf3"]])
    np.testing.assert_allclose(a_got[np.ix_(perm, perm)], a_hand,
                               atol=1e-12)


def test_read_pedigree_rejects_cycle(tmp_path):
    f = tmp_path / "cyc.txt"
    f.write_text("a b 0\nb a 0\n")
    import pytest as _pt
    with _pt.raises(ValueError, match="cycle"):
        ped.read_pedigree(str(f))


def test_read_pedigree_rejects_conflict(tmp_path):
    f = tmp_path / "dup.txt"
    f.write_text("a 0 0\nb a 0\nb 0 0\n")
    import pytest as _pt
    with _pt.raises(ValueError, match="twice"):
        ped.read_pedigree(str(f))


def test_native_inbreeding_matches_python():
    """The C++ Meuwissen-Luo must agree with the Python oracle to 1 ulp
    (heap tie order differs, so bit-exactness is not guaranteed)."""
    from miraculix_tpu.io.native import get_lib
    if get_lib() is None:
        import pytest as _pt
        _pt.skip("native codec unavailable")
    sire, dam = ped.simulate_pedigree(3000, n_founders=60, seed=12,
                                      unknown_rate=0.08)
    f_native = ped.inbreeding(sire, dam)
    f_py = ped._inbreeding_py(sire, dam)
    np.testing.assert_allclose(f_native, f_py, atol=1e-12)
    assert f_native.max() > 0.01


def test_cli_pedigree_report(tmp_path, capsys):
    from miraculix_tpu import cli

    f = tmp_path / "ped.txt"
    f.write_text("a 0 0\nb 0 0\nc a b\nd a b\ne c d\n")
    out = str(tmp_path / "f.tsv")
    assert cli.main(["pedigree", str(f), "-o", out]) == 0
    lines = open(out).read().splitlines()
    assert len(lines) == 6
    got = {ln.split("\t")[0]: float(ln.split("\t")[3]) for ln in lines[1:]}
    assert got["e"] == 0.25  # full-sib mating
    assert got["c"] == 0.0
