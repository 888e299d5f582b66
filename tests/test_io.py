"""Reader unit tests: PDB, PSF, PRMTOP, XTC, COOR/XSC, units and fields."""

from __future__ import annotations

import os

import numpy as np
import pytest

from conftest import DATA_DIR, SYSTEMS_DIR

from torchmd_tpu.io import Molecule
from torchmd_tpu.io.namd import read_coor, read_xsc
from torchmd_tpu.io.pdb import read_pdb, write_pdb
from torchmd_tpu.io.prmtop import Prmtop


def test_pdb_fields_and_conect():
    d = read_pdb(os.path.join(SYSTEMS_DIR, "oscillator", "dummy.pdb"))
    assert len(d["name"]) == 2
    assert list(d["name"]) == ["AR", "AR"]
    assert d["bonds"].tolist() == [[0, 1]]
    np.testing.assert_allclose(d["coords"][0, :, 0], [51.58, 69.23, 34.13])


def test_pdb_cryst1():
    d = read_pdb(os.path.join(SYSTEMS_DIR, "argon", "argon_start.pdb"))
    assert d["crystalinfo"]["a"] == pytest.approx(77.395)


def test_psf_sections():
    m = Molecule(os.path.join(DATA_DIR, "1water", "structure.psf"))
    assert m.numAtoms == 3
    assert list(m.atomtype) == ["OT", "HT", "HT"]
    np.testing.assert_allclose(m.charge, [-0.834, 0.417, 0.417])
    np.testing.assert_allclose(m.masses, [15.9994, 1.008, 1.008])
    assert m.bonds.shape == (3, 2)
    assert m.angles.tolist() == [[1, 0, 2]]


def test_prmtop_tables():
    top = Prmtop(
        os.path.join(DATA_DIR, "prod_alanine_dipeptide_amber", "structure.prmtop")
    )
    assert top.natoms == 688
    # charges are converted out of AMBER internal units
    assert abs(top.charge.sum()) < 1e-6
    assert top.bonds.shape[0] == 687
    assert (top.bonds >= 0).all() and (top.bonds < 688).all()
    # water box: mostly O/H masses
    assert top.masses.max() > 15 and top.masses.min() > 1
    # LJ diagonal extraction gives sensible sigma/eps for oxygen
    rmin2, eps = top.lj_diag(int(top.atom_type_index[4]))
    assert 0 < eps < 1 and 0 < rmin2 < 3


def test_coor_xsc():
    d = os.path.join(DATA_DIR, "prod_alanine_dipeptide_amber")
    coords = read_coor(os.path.join(d, "input.coor"))
    assert coords.shape == (688, 3)
    box = read_xsc(os.path.join(d, "input.xsc"))
    np.testing.assert_allclose(box, [19.83881, 19.6193, 19.6342], atol=1e-4)


def test_xtc_frames_and_box():
    m = Molecule(os.path.join(DATA_DIR, "sodiumperiodic", "structure.psf"))
    m.read(os.path.join(DATA_DIR, "sodiumperiodic", "tmp.xtc"))
    assert m.nframes >= 1
    assert np.all(m.box[:, 0] > 10)
    # physically sane water O-H distances in the solvated frames
    if m.numAtoms > 3:
        d = np.linalg.norm(m.coords[1, :, 0] - m.coords[2, :, 0])
        assert 0.5 < d < 2.0


def test_pdb_write_roundtrip(tmp_path):
    m = Molecule(os.path.join(DATA_DIR, "1water", "structure.psf"))
    m.read(os.path.join(DATA_DIR, "1water", "structure.pdb"))
    out = tmp_path / "out.pdb"
    write_pdb(str(out), m)
    m2 = Molecule(str(out))
    np.testing.assert_allclose(
        m2.coords[:, :, 0], m.coords[:, :, 0], atol=1e-3
    )


def test_molecule_multiframe_dropframes():
    m = Molecule(os.path.join(DATA_DIR, "waterbox", "structure.psf"))
    m.read(os.path.join(DATA_DIR, "waterbox", "output.xtc"))
    assert m.nframes == 2
    first = m.coords[:, :, 0].copy()
    m.dropFrames(keep=0)
    assert m.nframes == 1
    np.testing.assert_array_equal(m.coords[:, :, 0], first)


def test_molecule_write_roundtrip(tmp_path):
    """Molecule.write dispatch: PDB single frame, XYZ multi-frame, DCD
    round-trips through the bundled readers."""
    import numpy as np

    from torchmd_tpu.io import Molecule

    rs = np.random.RandomState(0)
    mol = Molecule()
    mol.numAtoms = 5
    mol.name = np.array(["C1", "C2", "C3", "C4", "C5"], dtype=object)
    mol.resname = np.array(["LIG"] * 5, dtype=object)
    mol.element = np.array(["C"] * 5, dtype=object)
    mol.coords = rs.rand(5, 3, 3) * 10  # 3 frames
    mol.box = np.tile(np.array([[20.0], [20.0], [20.0]]), (1, 3))

    mol.write(tmp_path / "out.pdb", frame=1)
    back = Molecule(str(tmp_path / "out.pdb"))
    assert back.numAtoms == 5
    np.testing.assert_allclose(
        back.coords[:, :, 0], np.round(mol.coords[:, :, 1], 3), atol=1e-3
    )
    assert np.allclose(back.crystalinfo["a"], 20.0)

    mol.write(tmp_path / "out.xyz")
    text = (tmp_path / "out.xyz").read_text()
    assert text.count("\n5\n") + text.startswith("5\n") == 3  # 3 frames

    mol.write(tmp_path / "traj.dcd")
    from torchmd_tpu.io.dcd import read_dcd

    d = read_dcd(str(tmp_path / "traj.dcd"))
    assert d["coords"].shape == (5, 3, 3)
    np.testing.assert_allclose(d["coords"], mol.coords, atol=1e-5)


def test_xtc_writer_roundtrip(tmp_path):
    """XTC writer -> both decoders (native C++ first, pure-Python forced)
    reproduce coordinates to the storage precision (0.001 nm = 0.01 A)."""
    import numpy as np

    from torchmd_tpu.io.xtc import read_xtc, write_xtc

    rs = np.random.RandomState(0)
    natoms, nframes = 123, 4
    coords = rs.rand(natoms, 3, nframes) * 60.0 - 10.0
    box = np.tile(np.array([[40.0], [50.0], [60.0]]), (1, nframes))
    p = tmp_path / "t.xtc"
    write_xtc(str(p), coords, box, steps=range(0, 400, 100),
              times=[0.0, 0.5, 1.0, 1.5])

    d = read_xtc(str(p))
    assert d["coords"].shape == (natoms, 3, nframes)
    np.testing.assert_allclose(d["coords"], coords, atol=6e-3)
    np.testing.assert_allclose(d["box"], box, atol=1e-3)
    np.testing.assert_array_equal(d["step"], [0, 100, 200, 300])
    np.testing.assert_allclose(d["time"], [0.0, 0.5, 1.0, 1.5], atol=1e-6)

    # force the pure-Python decode path too
    import torchmd_tpu.io.xtc as xtcmod

    frames, boxes = [], []
    import struct

    with open(p, "rb") as f:
        while True:
            header = f.read(4)
            if len(header) < 4:
                break
            (magic,) = struct.unpack(">i", header)
            assert magic == 1995
            na, step = struct.unpack(">2i", f.read(8))
            f.read(4)
            f.read(36)
            c, ls = xtcmod._decompress_frame(f)
            assert ls == na == natoms
            frames.append(c * 10.0)
    np.testing.assert_allclose(
        np.stack(frames, axis=2), coords, atol=6e-3
    )


def test_xtc_writer_tiny_system(tmp_path):
    """<= 9 atoms: uncompressed float storage branch."""
    import numpy as np

    from torchmd_tpu.io.xtc import read_xtc, write_xtc

    coords = np.arange(5 * 3 * 2, dtype=np.float64).reshape(5, 3, 2)
    write_xtc(str(tmp_path / "s.xtc"), coords)
    d = read_xtc(str(tmp_path / "s.xtc"))
    np.testing.assert_allclose(d["coords"], coords, atol=1e-4)


def test_xtc_writer_matches_reference_file(tmp_path):
    """Re-encode a reference-bundled trajectory and re-read it: coordinates
    survive within one quantization step."""
    import os

    import numpy as np

    from conftest import DATA_DIR
    from torchmd_tpu.io.xtc import read_xtc, write_xtc

    src = os.path.join(DATA_DIR, "waterbox", "output.xtc")
    if not os.path.exists(src):
        import glob

        cands = glob.glob(os.path.join(DATA_DIR, "*", "*.xtc"))
        assert cands, "no bundled xtc found"
        src = cands[0]
    d = read_xtc(src)
    out = str(tmp_path / "re.xtc")
    write_xtc(out, d["coords"], d["box"], steps=d["step"], times=d["time"])
    d2 = read_xtc(out)
    np.testing.assert_allclose(d2["coords"], d["coords"], atol=6e-3)
    np.testing.assert_allclose(d2["box"], d["box"], atol=1e-3)
