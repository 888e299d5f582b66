"""Native C++ layer: build, parity with the pure-Python implementations."""

from __future__ import annotations

import time

import numpy as np
import pytest

from torchmd_tpu import native


@pytest.fixture(scope="module")
def lib():
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain available")
    return native.get_lib()


def test_parse_floats(lib):
    text = b"  1.5 -2e3\n 3.25E-2  7   \n-0.125"
    out = native.parse_floats(text)
    np.testing.assert_allclose(out, [1.5, -2000.0, 0.0325, 7.0, -0.125])


def test_parse_floats_matches_python_on_prmtop(lib):
    raw = open(
        "tests/data/prod_alanine_dipeptide_amber/structure.prmtop", "rb"
    ).read().decode()
    # grab the CHARGE section body
    body = raw.split("%FLAG CHARGE")[1].split("%FLAG")[0]
    body = "\n".join(
        ln for ln in body.splitlines() if not ln.startswith("%FORMAT")
    )
    a = native.parse_floats(body.encode())
    b = np.array(body.split(), dtype=np.float64)
    np.testing.assert_array_equal(a, b)


def test_xtc_decode_matches_python(lib):
    import torchmd_tpu.io.xtc as xtcmod

    for path in (
        "tests/data/waterbox/output.xtc",
        "tests/data/sodiumperiodic/tmp.xtc",
        "tests/systems/cg/cg_structure.xtc",
    ):
        with open(path, "rb") as f:
            data = f.read()
        coords_n, box_n, steps_n, times_n = native.xtc_decode(data)

        # pure-Python decoder (bypass the native fast path)
        frames, boxes, steps, times = [], [], [], []
        import struct
        import io

        fh = io.BytesIO(data)
        while True:
            header = fh.read(4)
            if len(header) < 4:
                break
            (magic,) = struct.unpack(">i", header)
            assert magic == 1995
            natoms, step = struct.unpack(">2i", fh.read(8))
            (t,) = struct.unpack(">f", fh.read(4))
            box = np.array(struct.unpack(">9f", fh.read(36))).reshape(3, 3)
            c, lsize = xtcmod._decompress_frame(fh)
            frames.append(c * 10.0)
            boxes.append(np.diag(box) * 10.0)
            steps.append(step)
            times.append(t)
        coords_p = np.stack(frames, axis=2)
        box_p = np.stack(boxes, axis=1)

        np.testing.assert_allclose(coords_n, coords_p, atol=1e-9)
        np.testing.assert_allclose(box_n, box_p, atol=1e-6)
        np.testing.assert_array_equal(steps_n, steps)


def test_native_xtc_is_faster(lib):
    with open("tests/data/waterbox/output.xtc", "rb") as f:
        data = f.read()

    t0 = time.perf_counter()
    for _ in range(20):
        native.xtc_decode(data)
    t_native = time.perf_counter() - t0

    import io
    import struct
    import torchmd_tpu.io.xtc as xtcmod

    def py_decode():
        fh = io.BytesIO(data)
        while True:
            header = fh.read(4)
            if len(header) < 4:
                return
            fh.read(12)
            fh.read(36)
            xtcmod._decompress_frame(fh)

    t0 = time.perf_counter()
    for _ in range(20):
        py_decode()
    t_py = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)
