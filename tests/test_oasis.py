"""OASIS reader/writer: roundtrip, hand-crafted binary fixtures, modal
state, repetitions, CBLOCK, and rasterization through the shared layout
path."""

import struct
import zlib

import numpy as np
import pytest

from lithographysimulator_tpu import OpticsConfig
from lithographysimulator_tpu.io import (
    mask_from_layout,
    read_oasis,
    write_oasis,
)
from lithographysimulator_tpu.io.oasis import MAGIC, _real_f64, _sint, _string, _uint

SQUARE = np.array([(100.0, 100.0), (300.0, 100.0), (300.0, 300.0),
                   (100.0, 300.0)])


def test_roundtrip_polygons(tmp_path):
    tri = np.array([(0.0, 0.0), (400.0, 0.0), (200.0, 350.0)])
    p = write_oasis(tmp_path / "a.oas", {"TOP": [(1, SQUARE), (2, tri)]})
    lib = read_oasis(p)
    assert set(lib.cells) == {"TOP"}
    polys = lib.flatten("TOP")
    assert len(polys) == 2
    np.testing.assert_allclose(polys[0].xy_nm, SQUARE)
    np.testing.assert_allclose(polys[1].xy_nm, tri)
    assert polys[0].layer == 1 and polys[1].layer == 2


def test_roundtrip_placements(tmp_path):
    p = write_oasis(
        tmp_path / "b.oas",
        {"CHILD": [(1, SQUARE)], "TOP": []},
        placements={"TOP": [("CHILD", (1000.0, 500.0), 1.0, 90.0, False),
                            ("CHILD", (0.0, 0.0), 2.0, 0.0, True)]})
    lib = read_oasis(p)
    polys = lib.flatten("TOP")
    assert len(polys) == 2
    # 90-degree rotation + translation
    rot = SQUARE @ np.array([[0.0, 1.0], [-1.0, 0.0]]) + [1000.0, 500.0]
    np.testing.assert_allclose(polys[0].xy_nm, rot, atol=1e-9)
    # mirrored (y -> -y) then magnified 2x
    refl = SQUARE * [2.0, -2.0]
    np.testing.assert_allclose(polys[1].xy_nm, refl, atol=1e-9)


def _rec(*parts):
    return b"".join(parts)


def _start(unit_per_um=1000.0):
    return _rec(MAGIC, _uint(1), _string("1.0"), _real_f64(unit_per_um),
                _uint(0), *([_uint(0)] * 12))


def _end():
    return _rec(_uint(2), b"\x00" * 253, _uint(0))


def test_handcrafted_rectangle_with_repetition():
    """Byte-level fixture: RECTANGLE with a 3x2 grid repetition and modal
    layer reuse by a second implicit-field rectangle."""
    blob = _rec(
        _start(),
        _uint(14), _string("TOP"),        # CELL by name
        _uint(15),                         # XYABSOLUTE
        # RECTANGLE: W H X Y R D L = 0x40|0x20|0x10|0x08|0x04|0x02|0x01
        _uint(20), bytes([0x7F]),
        _uint(5),                          # layer
        _uint(0),                          # datatype
        _uint(40),                         # width (db units)
        _uint(30),                         # height
        _sint(10), _sint(20),              # x, y
        _uint(1), _uint(1), _uint(0),      # repetition type 1: 3 cols, 2 rows
        _uint(100), _uint(200),            # dx, dy
        # second RECTANGLE reusing every modal field except position
        _uint(20), bytes([0x10 | 0x08]),
        _sint(1000), _sint(1000),
        _end(),
    )
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as d:
        f = pathlib.Path(d) / "r.oas"
        f.write_bytes(blob)
        lib = read_oasis(f)
    polys = lib.flatten("TOP")
    assert len(polys) == 7  # 3x2 grid + 1 modal reuse
    assert all(p.layer == 5 for p in polys)
    # db unit = 1000/um -> 1 nm; first rect at (10, 20), last grid copy at
    # (10+200, 20+200)
    mins = np.array([p.xy_nm.min(axis=0) for p in polys])
    assert (mins[0] == [10, 20]).all()
    widths = [np.ptp(p.xy_nm[:, 0]) for p in polys]
    assert all(w == 40 for w in widths)
    assert (mins[6] == [1000, 1000]).all()


def test_handcrafted_manhattan_pointlist():
    """POLYGON with a type-0 (alternating 1-delta) point list gets its
    implicit closing vertex (OASIS 7.7.8)."""
    blob = _rec(
        _start(),
        _uint(14), _string("TOP"),
        _uint(15),
        # POLYGON: P X Y D L
        _uint(21), bytes([0x20 | 0x10 | 0x08 | 0x02 | 0x01]),
        _uint(1), _uint(0),
        _uint(0),                       # point-list type 0 (horizontal first)
        _uint(3),                       # three explicit deltas
        _sint(100), _sint(50), _sint(-60),  # E 100, N 50, W 60
        _sint(0), _sint(0),             # x, y
        _end(),
    )
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as d:
        f = pathlib.Path(d) / "m.oas"
        f.write_bytes(blob)
        lib = read_oasis(f)
    (poly,) = lib.flatten("TOP")
    # vertices: (0,0) (100,0) (100,50) (40,50) + implied (40,?) closing:
    # alternation continues vertically? 3 deltas, horizontal first ->
    # next is vertical: implied vertex shares x with last, y with first
    np.testing.assert_allclose(
        poly.xy_nm, [[0, 0], [100, 0], [100, 50], [40, 50], [40, 0]])


def test_handcrafted_cellname_table_and_placement():
    """CELL by refnum + PLACEMENT by refnum resolve through CELLNAME,
    including forward references."""
    blob = _rec(
        _start(),
        _uint(3), _string("CHILD"),      # CELLNAME refnum 0 (implicit)
        _uint(3), _string("TOP"),        # CELLNAME refnum 1
        _uint(13), _uint(1),             # CELL by refnum -> TOP
        _uint(15),
        # PLACEMENT (17): C N X Y, no rotation bits
        _uint(17), bytes([0x80 | 0x40 | 0x20 | 0x10]),
        _uint(0),                        # -> CHILD
        _sint(500), _sint(-250),
        _uint(13), _uint(0),             # CELL by refnum -> CHILD
        _uint(15),
        _uint(20), bytes([0x40 | 0x20 | 0x10 | 0x08 | 0x02 | 0x01]),
        _uint(1), _uint(0), _uint(10), _uint(10), _sint(0), _sint(0),
        _end(),
    )
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as d:
        f = pathlib.Path(d) / "p.oas"
        f.write_bytes(blob)
        lib = read_oasis(f)
    polys = lib.flatten("TOP")
    assert len(polys) == 1
    np.testing.assert_allclose(polys[0].xy_nm.min(axis=0), [500, -250])


def test_cblock_decompression():
    """A CBLOCK-wrapped cell parses identically to the plain stream."""
    body = _rec(
        _uint(14), _string("TOP"),
        _uint(15),
        _uint(20), bytes([0x40 | 0x20 | 0x10 | 0x08 | 0x02 | 0x01]),
        _uint(1), _uint(0), _uint(40), _uint(30), _sint(10), _sint(20),
    )
    comp = zlib.compress(body)[2:-4]  # raw DEFLATE (strip zlib header/adler)
    blob = _rec(
        _start(),
        _uint(34), _uint(0), _uint(len(body)), _uint(len(comp)), comp,
        _end(),
    )
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as d:
        f = pathlib.Path(d) / "c.oas"
        f.write_bytes(blob)
        lib = read_oasis(f)
    (poly,) = lib.flatten("TOP")
    np.testing.assert_allclose(poly.xy_nm.min(axis=0), [10, 20])


def test_text_skipped_with_warning():
    blob = _rec(
        _start(),
        _uint(14), _string("TOP"),
        _uint(15),
        # TEXT: C X Y T L with explicit string
        _uint(19), bytes([0x40 | 0x10 | 0x08 | 0x02 | 0x01]),
        _uint(3), _uint(0), _string("label"), _sint(5), _sint(5),
        _uint(20), bytes([0x40 | 0x20 | 0x10 | 0x08 | 0x02 | 0x01]),
        _uint(1), _uint(0), _uint(40), _uint(30), _sint(0), _sint(0),
        _end(),
    )
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as d:
        f = pathlib.Path(d) / "t.oas"
        f.write_bytes(blob)
        with pytest.warns(UserWarning, match="TEXT"):
            lib = read_oasis(f)
    assert len(lib.flatten("TOP")) == 1


def test_mask_from_layout_dispatches_oasis(tmp_path):
    cfg = OpticsConfig(pixel_number=32)
    p = write_oasis(tmp_path / "m.oas", {"TOP": [(1, SQUARE)]})
    mask = mask_from_layout(p, cfg, layer=1)
    g = np.asarray(mask.geometry)
    # 200x200 nm square at 25 nm pixels = 8x8 = 64 px
    assert g.sum() == 64


def test_bad_magic_rejected(tmp_path):
    f = tmp_path / "x.oas"
    f.write_bytes(b"GARBAGE")
    with pytest.raises(ValueError, match="magic"):
        read_oasis(f)
