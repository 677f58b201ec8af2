"""Minimal GDSII stream-format reader/writer for mask layout import.

Covers the subset that defines mask geometry: library/structure framing,
BOUNDARY (polygon) and BOX elements with LAYER/DATATYPE/XY, and flat SREF
placements with optional translation (no rotation/magnification/arrays in
this round). Units are resolved through the UNITS record so coordinates come
back in nanometers regardless of the file's database unit.

GDSII import is an unchecked roadmap item of the reference
(reference ``README.md:20``); format per the Calma GDSII Stream Format
Manual (public record layout: 2-byte length, 1-byte record type, 1-byte data
type, big-endian payloads).
"""

from __future__ import annotations

import dataclasses
import struct
from pathlib import Path

import numpy as np

# Record types
HEADER, BGNLIB, LIBNAME, UNITS, ENDLIB = 0x00, 0x01, 0x02, 0x03, 0x04
BGNSTR, STRNAME, ENDSTR = 0x05, 0x06, 0x07
BOUNDARY, PATH, SREF = 0x08, 0x09, 0x0A
LAYER, DATATYPE, XY, ENDEL = 0x0D, 0x0E, 0x10, 0x11
SNAME, BOX, BOXTYPE = 0x12, 0x2D, 0x2E

_DT_NONE, _DT_INT16, _DT_INT32, _DT_REAL8, _DT_ASCII = 0x00, 0x02, 0x03, 0x05, 0x06


@dataclasses.dataclass
class GDSPolygon:
    layer: int
    datatype: int
    xy_nm: np.ndarray  # (v, 2) float64, closed ring NOT repeated


@dataclasses.dataclass
class GDSCell:
    name: str
    polygons: list
    references: list  # (cell_name, (dx_nm, dy_nm))


@dataclasses.dataclass
class GDSLibrary:
    name: str
    unit_nm: float  # database unit in nm
    cells: dict

    def flatten(self, cell_name: str | None = None, *, max_depth: int = 16):
        """All polygons of a cell with SREF translations applied."""
        if cell_name is None:
            referenced = {r[0] for c in self.cells.values() for r in c.references}
            tops = [n for n in self.cells if n not in referenced]
            if not tops:
                raise ValueError("no top cell found")
            cell_name = tops[0]

        out = []

        def walk(name, offset, depth):
            if depth > max_depth:
                raise ValueError("SREF nesting too deep (cycle?)")
            cell = self.cells[name]
            for poly in cell.polygons:
                out.append(GDSPolygon(poly.layer, poly.datatype,
                                      poly.xy_nm + np.asarray(offset)))
            for ref_name, delta in cell.references:
                walk(ref_name, (offset[0] + delta[0], offset[1] + delta[1]),
                     depth + 1)

        walk(cell_name, (0.0, 0.0), 0)
        return out


def _real8_to_float(data: bytes) -> float:
    """GDSII 8-byte excess-64 base-16 float."""
    (word,) = struct.unpack(">Q", data)
    if word == 0:
        return 0.0
    sign = -1.0 if word >> 63 else 1.0
    exponent = ((word >> 56) & 0x7F) - 64
    mantissa = (word & 0x00FFFFFFFFFFFFFF) / float(1 << 56)
    return sign * mantissa * (16.0 ** exponent)


def _float_to_real8(value: float) -> bytes:
    if value == 0.0:
        return b"\x00" * 8
    sign = 0
    if value < 0:
        sign = 1
        value = -value
    exponent = 0
    while value >= 1.0:
        value /= 16.0
        exponent += 1
    while value < 1.0 / 16.0:
        value *= 16.0
        exponent -= 1
    mantissa = int(value * (1 << 56))
    mantissa = min(mantissa, (1 << 56) - 1)
    return struct.pack(">Q", (sign << 63) | ((exponent + 64) << 56) | mantissa)


def _records(blob: bytes):
    pos = 0
    while pos + 4 <= len(blob):
        length, rectype, datatype = struct.unpack(">HBB", blob[pos : pos + 4])
        if length < 4:
            break
        yield rectype, datatype, blob[pos + 4 : pos + length]
        pos += length


def read_gds(path) -> GDSLibrary:
    blob = Path(path).read_bytes()
    lib_name = ""
    unit_nm = 1.0
    cells: dict[str, GDSCell] = {}
    cell = None
    element = None  # dict while inside BOUNDARY/BOX/SREF

    for rectype, _dt, payload in _records(blob):
        if rectype == LIBNAME:
            lib_name = payload.rstrip(b"\x00").decode("ascii", "replace")
        elif rectype == UNITS:
            # payload: user-unit-per-db-unit, db-unit-in-meters
            db_unit_m = _real8_to_float(payload[8:16])
            unit_nm = db_unit_m * 1e9
        elif rectype == BGNSTR:
            cell = GDSCell(name="", polygons=[], references=[])
        elif rectype == STRNAME and cell is not None:
            cell.name = payload.rstrip(b"\x00").decode("ascii", "replace")
        elif rectype == ENDSTR and cell is not None:
            cells[cell.name] = cell
            cell = None
        elif rectype in (BOUNDARY, BOX):
            element = {"kind": "poly", "layer": 0, "datatype": 0, "xy": None}
        elif rectype == SREF:
            element = {"kind": "sref", "sname": "", "xy": None}
        elif rectype == LAYER and element is not None:
            element["layer"] = struct.unpack(">h", payload[:2])[0]
        elif rectype in (DATATYPE, BOXTYPE) and element is not None:
            element["datatype"] = struct.unpack(">h", payload[:2])[0]
        elif rectype == SNAME and element is not None:
            element["sname"] = payload.rstrip(b"\x00").decode("ascii", "replace")
        elif rectype == XY and element is not None:
            coords = np.frombuffer(payload, dtype=">i4").astype(np.float64)
            element["xy"] = coords.reshape(-1, 2)
        elif rectype == ENDEL and element is not None and cell is not None:
            if element["kind"] == "poly" and element["xy"] is not None:
                xy = element["xy"]
                if len(xy) >= 4 and np.array_equal(xy[0], xy[-1]):
                    xy = xy[:-1]  # drop the repeated closing vertex
                cell.polygons.append(GDSPolygon(
                    element["layer"], element["datatype"], xy * unit_nm))
            elif element["kind"] == "sref" and element["xy"] is not None:
                dx, dy = element["xy"][0] * unit_nm
                cell.references.append((element["sname"], (dx, dy)))
            element = None
        elif rectype == ENDLIB:
            break

    return GDSLibrary(name=lib_name, unit_nm=unit_nm, cells=cells)


def write_gds(path, cells: dict, *, unit_nm: float = 1.0,
              lib_name: str = "LITHO") -> Path:
    """Write a flat library: ``cells`` maps name -> list of (layer, (v, 2)
    xy-in-nm arrays). Database unit = ``unit_nm`` nanometers."""

    def rec(rectype, datatype, payload=b""):
        return struct.pack(">HBB", 4 + len(payload), rectype, datatype) + payload

    def ascii_rec(rectype, text):
        data = text.encode("ascii")
        if len(data) % 2:
            data += b"\x00"
        return rec(rectype, _DT_ASCII, data)

    ts = struct.pack(">12h", 2026, 1, 1, 0, 0, 0, 2026, 1, 1, 0, 0, 0)
    out = [rec(HEADER, _DT_INT16, struct.pack(">h", 600)),
           rec(BGNLIB, _DT_INT16, ts),
           ascii_rec(LIBNAME, lib_name),
           rec(UNITS, _DT_REAL8,
               _float_to_real8(1e-3) + _float_to_real8(unit_nm * 1e-9))]
    for name, polys in cells.items():
        out.append(rec(BGNSTR, _DT_INT16, ts))
        out.append(ascii_rec(STRNAME, name))
        for layer, xy in polys:
            v = np.asarray(xy, np.float64) / unit_nm
            closed = np.vstack([v, v[:1]]).astype(">i4")
            out.append(rec(BOUNDARY, _DT_NONE))
            out.append(rec(LAYER, _DT_INT16, struct.pack(">h", layer)))
            out.append(rec(DATATYPE, _DT_INT16, struct.pack(">h", 0)))
            out.append(rec(XY, _DT_INT32, closed.tobytes()))
            out.append(rec(ENDEL, _DT_NONE))
        out.append(rec(ENDSTR, _DT_NONE))
    out.append(rec(ENDLIB, _DT_NONE))
    path = Path(path)
    path.write_bytes(b"".join(out))
    return path
