"""Third-party GDSII interop: parse a byte stream NOT produced by this
repo's writer (VERDICT r3 #5 — the round-trip tests in test_io.py validate
the reader mostly against write_gds, which would hide shared blind spots).

The fixture below is hand-assembled record by record, with its own
independent excess-64 REAL8 encoder, foreign record ordering quirks
(repeated closing vertex, NUL-padded odd names, ELFLAGS/PLEX noise records,
a TEXT annotation), and the full STRANS transform stack. Geometry is pinned
EXACTLY against hand-computed coordinates. (Reference: GDSII import is an
unchecked roadmap item there, /root/reference/README.md:20.)
"""

import math
import struct
import warnings

import numpy as np
import pytest

from lithographysimulator_tpu.io.gdsii import read_gds, write_gds

# -- independent record assembler (deliberately NOT reusing io.gdsii's
#    writer helpers: this emulates a foreign tool) --------------------------


def _real8(value: float) -> bytes:
    """Excess-64 base-16 REAL8, implemented independently via frexp."""
    if value == 0.0:
        return b"\x00" * 8
    sign = 0x8000000000000000 if value < 0 else 0
    value = abs(value)
    # value = m2 * 2**e2 with m2 in [0.5, 1)
    m2, e2 = math.frexp(value)
    # convert to base 16: exponent must be a multiple of 4 bits
    shift = e2 % 4
    e16 = (e2 - shift) // 4 + (1 if shift else 0)
    m16 = m2 * 2.0 ** (shift - (4 if shift else 0))
    mantissa = int(round(m16 * (1 << 56)))
    if mantissa >= (1 << 56):
        mantissa >>= 4
        e16 += 1
    return struct.pack(">Q", sign | ((e16 + 64) << 56) | mantissa)


def _rec(rectype: int, datatype: int, payload: bytes = b"") -> bytes:
    return struct.pack(">HBB", 4 + len(payload), rectype, datatype) + payload


def _ascii(rectype: int, text: str) -> bytes:
    data = text.encode("ascii")
    if len(data) % 2:
        data += b"\x00"
    return _rec(rectype, 0x06, data)


def _xy(points) -> bytes:
    flat = np.asarray(points, np.int64).reshape(-1)
    return _rec(0x10, 0x03, b"".join(struct.pack(">i", int(v)) for v in flat))


_TS = struct.pack(">12h", 2019, 7, 1, 12, 0, 0, 2019, 7, 1, 12, 0, 0)


def _foreign_stream(db_unit_m: float = 1e-9) -> bytes:
    """A two-cell library as another tool would emit it."""
    out = [
        _rec(0x00, 0x02, struct.pack(">h", 600)),          # HEADER v600
        _rec(0x01, 0x02, _TS),                              # BGNLIB
        _ascii(0x02, "FOREIGN.DB"),                         # LIBNAME (even)
        _rec(0x03, 0x05, _real8(1e-3) + _real8(db_unit_m)),  # UNITS
        # ---- cell UNIT: one 10x10 BOUNDARY on layer 5 / datatype 2 ------
        _rec(0x05, 0x02, _TS),                              # BGNSTR
        _ascii(0x06, "UNIT"),
        _rec(0x08, 0x00),                                   # BOUNDARY
        _rec(0x26, 0x01, struct.pack(">H", 0)),             # ELFLAGS (noise)
        _rec(0x0D, 0x02, struct.pack(">h", 5)),             # LAYER 5
        _rec(0x0E, 0x02, struct.pack(">h", 2)),             # DATATYPE 2
        _xy([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]),  # closed ring
        _rec(0x11, 0x00),                                   # ENDEL
        _rec(0x07, 0x00),                                   # ENDSTR
        # ---- cell TOP: PATHs, a TEXT annotation, SREF + AREF ------------
        _rec(0x05, 0x02, _TS),
        _ascii(0x06, "TOP"),                                # odd name -> NUL
        # PATH pathtype 2 (extended ends), width 8, vertical centerline
        _rec(0x09, 0x00),                                   # PATH
        _rec(0x0D, 0x02, struct.pack(">h", 3)),
        _rec(0x0E, 0x02, struct.pack(">h", 0)),
        _rec(0x21, 0x02, struct.pack(">h", 2)),             # PATHTYPE 2
        _rec(0x0F, 0x03, struct.pack(">i", 8)),             # WIDTH 8
        _xy([(0, 0), (0, 30)]),
        _rec(0x11, 0x00),
        # PATH pathtype 0 (butt), width 4, horizontal
        _rec(0x09, 0x00),
        _rec(0x0D, 0x02, struct.pack(">h", 3)),
        _rec(0x0E, 0x02, struct.pack(">h", 1)),
        _rec(0x21, 0x02, struct.pack(">h", 0)),
        _rec(0x0F, 0x03, struct.pack(">i", 4)),
        _xy([(50, 0), (70, 0)]),
        _rec(0x11, 0x00),
        # PATH pathtype 1 (round caps), width 6
        _rec(0x09, 0x00),
        _rec(0x0D, 0x02, struct.pack(">h", 4)),
        _rec(0x0E, 0x02, struct.pack(">h", 0)),
        _rec(0x21, 0x02, struct.pack(">h", 1)),
        _rec(0x0F, 0x03, struct.pack(">i", 6)),
        _xy([(100, 0), (100, 20)]),
        _rec(0x11, 0x00),
        # TEXT annotation: no mask geometry, must be skipped with a warning
        _rec(0x0C, 0x00),                                   # TEXT
        _rec(0x0D, 0x02, struct.pack(">h", 63)),
        _rec(0x16, 0x02, struct.pack(">h", 0)),             # TEXTTYPE
        _xy([(1, 1)]),
        _ascii(0x19, "ignore me"),                          # STRING
        _rec(0x11, 0x00),
        # SREF with the full STRANS stack: mirror + mag 2 + angle 90
        _rec(0x0A, 0x00),                                   # SREF
        _ascii(0x12, "UNIT"),                               # SNAME
        _rec(0x1A, 0x01, struct.pack(">H", 0x8000)),        # STRANS mirror
        _rec(0x1B, 0x05, _real8(2.0)),                      # MAG 2
        _rec(0x1C, 0x05, _real8(90.0)),                     # ANGLE 90
        _xy([(100, 50)]),
        _rec(0x11, 0x00),
        # AREF: 3 cols x 2 rows, col pitch 30, row pitch 20
        _rec(0x0B, 0x00),                                   # AREF
        _ascii(0x12, "UNIT"),
        _rec(0x13, 0x02, struct.pack(">hh", 3, 2)),         # COLROW
        _xy([(200, 0), (290, 0), (200, 40)]),
        _rec(0x11, 0x00),
        _rec(0x07, 0x00),                                   # ENDSTR
        _rec(0x04, 0x00),                                   # ENDLIB
    ]
    return b"".join(out)


@pytest.fixture
def foreign_gds(tmp_path):
    p = tmp_path / "foreign.gds"
    p.write_bytes(_foreign_stream())
    return p


def test_foreign_real8_is_independent_but_compatible():
    """The test's own REAL8 encoder agrees with the reader's decoder on
    representative values (guards the fixture itself)."""
    from lithographysimulator_tpu.io.gdsii import _real8_to_float

    for v in (1e-3, 1e-9, 2.5e-10, 2.0, 90.0, -45.0, 0.0, 123.456):
        assert _real8_to_float(_real8(v)) == pytest.approx(v, rel=1e-14)


def test_foreign_library_structure(foreign_gds):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the TEXT skip warning
        lib = read_gds(foreign_gds)
    assert lib.name == "FOREIGN.DB"
    assert lib.unit_nm == pytest.approx(1.0, rel=1e-12)
    assert set(lib.cells) == {"UNIT", "TOP"}
    unit = lib.cells["UNIT"]
    assert len(unit.polygons) == 1
    poly = unit.polygons[0]
    assert (poly.layer, poly.datatype) == (5, 2)
    # repeated closing vertex dropped
    np.testing.assert_array_equal(
        poly.xy_nm, [(0, 0), (10, 0), (10, 10), (0, 10)])
    top = lib.cells["TOP"]
    assert len(top.references) == 2
    sref, aref = top.references
    assert (sref.mag, sref.angle_deg, sref.reflect_x) == (2.0, 90.0, True)
    assert (aref.cols, aref.rows) == (3, 2)
    assert aref.col_step_nm == pytest.approx((30.0, 0.0))
    assert aref.row_step_nm == pytest.approx((0.0, 20.0))


def test_foreign_text_element_warns(foreign_gds):
    with pytest.warns(UserWarning, match="TEXT element skipped"):
        read_gds(foreign_gds)


def test_foreign_paths_expand_exactly(foreign_gds):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        lib = read_gds(foreign_gds)
    polys = lib.cells["TOP"].polygons
    # pathtype 2: rectangle extended by width/2 at both ends
    ext = polys[0]
    assert ext.layer == 3 and ext.datatype == 0
    np.testing.assert_allclose(
        np.sort(ext.xy_nm, axis=0),
        np.sort(np.array([(-4, -4), (-4, 34), (4, 34), (4, -4)], float),
                axis=0))
    # pathtype 0: flush butt rectangle
    butt = polys[1]
    assert butt.datatype == 1
    np.testing.assert_allclose(
        np.sort(butt.xy_nm, axis=0),
        np.sort(np.array([(50, -2), (50, 2), (70, 2), (70, -2)], float),
                axis=0))
    # pathtype 1: body rectangle + two round caps (discs at the ends)
    round_polys = [p for p in polys[2:] if p.layer == 4]
    assert len(round_polys) == 3
    body, cap_a, cap_b = round_polys
    np.testing.assert_allclose(
        np.sort(body.xy_nm, axis=0),
        np.sort(np.array([(97, 0), (103, 0), (97, 20), (103, 20)], float),
                axis=0))
    for cap, center in ((cap_a, (100, 0)), (cap_b, (100, 20))):
        radii = np.hypot(*(cap.xy_nm - np.asarray(center, float)).T)
        np.testing.assert_allclose(radii, 3.0, rtol=1e-12)


def test_foreign_strans_flatten_exact(foreign_gds):
    """SREF with mirror-then-rotate-then-magnify lands the UNIT square at
    the hand-computed coordinates: M = mag*R(90)*diag(1,-1) = [[0,2],[2,0]],
    so (x, y) -> (2y + 100, 2x + 50)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        lib = read_gds(foreign_gds)
    flat = lib.flatten("TOP")
    sref_polys = [p for p in flat if p.layer == 5]
    assert len(sref_polys) == 1 + 6  # SREF + 3x2 AREF instances
    np.testing.assert_allclose(
        sref_polys[0].xy_nm,
        [(100, 50), (100, 70), (120, 70), (120, 50)], atol=1e-9)
    # AREF instances: origin (200, 0) + c*(30, 0) + r*(20... row pitch (0? )
    expected_origins = [(200 + 30 * c, 0 + 20 * r)
                        for r in range(2) for c in range(3)]
    got_origins = sorted(tuple(p.xy_nm[0]) for p in sref_polys[1:])
    assert got_origins == sorted((float(x), float(y))
                                 for x, y in expected_origins)


def test_foreign_db_unit_scaling(tmp_path):
    """Coordinates resolve through UNITS: a 10 nm database unit scales all
    geometry by 10."""
    p = tmp_path / "coarse.gds"
    p.write_bytes(_foreign_stream(db_unit_m=1e-8))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        lib = read_gds(p)
    assert lib.unit_nm == pytest.approx(10.0, rel=1e-12)
    np.testing.assert_array_equal(
        lib.cells["UNIT"].polygons[0].xy_nm,
        [(0, 0), (100, 0), (100, 100), (0, 100)])


def test_foreign_roundtrip_bit_stable(foreign_gds, tmp_path):
    """Writer round-trip through the foreign fixture: flatten -> write_gds
    -> read_gds preserves the geometry, and writing the SAME content twice
    is byte-identical."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        lib = read_gds(foreign_gds)
    flat = lib.flatten("TOP")
    cells = {"FLAT": [(p.layer, p.xy_nm) for p in flat]}
    out1 = tmp_path / "rt1.gds"
    out2 = tmp_path / "rt2.gds"
    write_gds(out1, cells, unit_nm=1.0)
    write_gds(out2, cells, unit_nm=1.0)
    assert out1.read_bytes() == out2.read_bytes()  # bit-stable
    back = read_gds(out1)
    flat2 = back.flatten("FLAT")
    assert len(flat2) == len(flat)
    for a, b in zip(flat, flat2):
        assert a.layer == b.layer
        # the writer snaps to the integer db grid (1 nm here): exact for
        # the fixture's integer geometry, < 1 db unit for the round caps
        np.testing.assert_allclose(b.xy_nm, a.xy_nm, atol=1.0)
