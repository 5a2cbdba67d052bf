"""NetCDF classic (CDF-1/CDF-2) codec — pure stdlib, public format spec
(the NetCDF classic file format is a published, frozen on-disk layout:
magic 'CDF\\x01'/'CDF\\x02', big-endian, header = numrecs + dim_list +
gatt_list + var_list, then fixed-size variable data).

Reference capability: ``RS_FromNetCDF`` / ``RS_NetCDFInfo``
(``RasterConstructors.java:76-110``, ucar netcdf-java there). This engine
reads 2-D numeric variables as rasters; HDF5-backed NetCDF-4 buffers
dispatch to the stdlib HDF5 reader (``sources/hdf5.py`` — r6). A matching
writer keeps the pair round-trip testable without any external fixture.
"""

from __future__ import annotations

import struct

import numpy as np

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type -> (struct char, numpy dtype, size)
_TYPES = {
    1: ("b", np.int8, 1),     # NC_BYTE
    2: ("s", None, 1),        # NC_CHAR
    3: (">i2", np.dtype(">i2"), 2),   # NC_SHORT
    4: (">i4", np.dtype(">i4"), 4),   # NC_INT
    5: (">f4", np.dtype(">f4"), 4),   # NC_FLOAT
    6: (">f8", np.dtype(">f8"), 8),   # NC_DOUBLE
}


def _pad4(n: int) -> int:
    return (n + 3) & ~3


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.o = 0

    def u32(self) -> int:
        v = struct.unpack_from(">I", self.b, self.o)[0]
        self.o += 4
        return v

    def name(self) -> str:
        n = self.u32()
        s = self.b[self.o:self.o + n].decode("ascii")
        self.o += _pad4(n)
        return s

    def values(self, nc_type: int, n: int):
        if nc_type == 2:
            s = self.b[self.o:self.o + n]
            self.o += _pad4(n)
            return s.decode("latin1")
        dt = _TYPES[nc_type][1]
        size = _TYPES[nc_type][2]
        out = np.frombuffer(self.b, dtype=dt if dt is not None else np.int8,
                            count=n, offset=self.o)
        self.o += _pad4(n * size)
        return out


def parse_netcdf(buf: bytes) -> dict:
    """Parse the classic header + fixed variables. Returns
    {dims: [(name, len)], gatts: {...}, vars: {name: {dims, shape, type,
    atts, data}}} (record variables are listed but not materialized)."""
    if buf[:8] == b"\x89HDF\r\n\x1a\n":
        # NetCDF-4 files ARE HDF5 files — dispatch to the stdlib HDF5
        # reader (sources/hdf5.py) and present the classic dict shape
        from sedona_spark.sources.hdf5 import parse_hdf5

        dims: list[tuple[str, int]] = []
        variables: dict[str, dict] = {}
        for nm, a in parse_hdf5(buf).items():
            dnames = []
            for axis, ln in enumerate(a.shape):
                dn = f"{nm}_d{axis}"
                dims.append((dn, ln))
                dnames.append(dn)
            t = (6 if a.dtype.kind == "f" and a.dtype.itemsize == 8
                 else 5 if a.dtype.kind == "f"
                 else 4)
            variables[nm] = {"dims": dnames, "shape": a.shape,
                             "type": t, "atts": {}, "data": a}
        return {"dims": dims, "gatts": {}, "vars": variables}
    if buf[:3] != b"CDF":
        raise NotImplementedError(
            "not a NetCDF file (classic CDF or HDF5-backed NetCDF-4)")
    version = buf[3]
    if version not in (1, 2):
        raise NotImplementedError("only CDF-1/CDF-2 classic supported")
    off_fmt = ">I" if version == 1 else ">Q"
    off_size = 4 if version == 1 else 8
    r = _Reader(buf)
    r.o = 4
    numrecs = r.u32()

    def tag_list(expect: int) -> int:
        tag = r.u32()
        n = r.u32()
        if n and tag != expect:
            raise ValueError("malformed NetCDF header")
        return n

    dims = []
    for _ in range(tag_list(_NC_DIMENSION)):
        nm = r.name()
        dims.append((nm, r.u32()))

    def atts() -> dict:
        out = {}
        for _ in range(tag_list(_NC_ATTRIBUTE)):
            nm = r.name()
            t = r.u32()
            n = r.u32()
            v = r.values(t, n)
            out[nm] = v if isinstance(v, str) else (
                v.tolist() if len(v) > 1 else v[0].item())
        return out

    gatts = atts()
    variables: dict[str, dict] = {}
    for _ in range(tag_list(_NC_VARIABLE)):
        nm = r.name()
        nd = r.u32()
        dim_ids = [r.u32() for _ in range(nd)]
        va = atts()
        t = r.u32()
        vsize = r.u32()
        begin = struct.unpack_from(off_fmt, r.b, r.o)[0]
        r.o += off_size
        shape = tuple(dims[d][1] for d in dim_ids)
        rec = shape and shape[0] == 0
        data = None
        if not rec and t in _TYPES and t != 2:
            cnt = int(np.prod(shape)) if shape else 1
            data = np.frombuffer(
                buf, dtype=_TYPES[t][1], count=cnt, offset=begin
            ).reshape(shape)
        variables[nm] = {
            "dims": [dims[d][0] for d in dim_ids],
            "shape": shape if not rec else (numrecs,) + shape[1:],
            "type": t,
            "atts": va,
            "data": data,
        }
    return {"dims": dims, "gatts": gatts, "vars": variables}


def netcdf_info(buf: bytes) -> str:
    """RS_NetCDFInfo analog: one line per variable —
    'name(dim1=len1, dim2=len2) :type'."""
    p = parse_netcdf(buf)
    dimlen = dict(p["dims"])
    lines = []
    for nm, v in sorted(p["vars"].items()):
        ds = ", ".join(f"{d}={dimlen[d]}" for d in v["dims"])
        lines.append(f"{nm}({ds}) :{v['type']}")
    return "\n".join(lines)


def netcdf_variable_as_raster(buf: bytes, var: str):
    """RS_FromNetCDF analog: a 2-D numeric variable as (uint8 array
    clipped to the engine codec range, w, h) plus the variable's raw
    float min/max (for callers that need the unquantized stats)."""
    p = parse_netcdf(buf)
    if var not in p["vars"]:
        raise KeyError(f"variable {var!r} not in file")
    v = p["vars"][var]
    if v["data"] is None or len(v["shape"]) != 2:
        raise ValueError(f"variable {var!r} is not a fixed 2-D grid")
    a = np.asarray(v["data"], dtype=np.float64)
    lo, hi = float(a.min()), float(a.max())
    q = np.clip(a, 0, 255).astype(np.uint8)
    return q[:, :, None], a.shape[1], a.shape[0], lo, hi


def encode_netcdf(variables: dict[str, np.ndarray]) -> bytes:
    """Minimal classic writer (CDF-1): 2-D NC_INT/NC_DOUBLE variables on
    shared dimensions — the round-trip half of the codec pair."""
    dims: list[tuple[str, int]] = []
    dim_ix: dict[tuple[str, int], int] = {}
    var_dims: dict[str, list[int]] = {}
    for nm, a in variables.items():
        ids = []
        for axis, ln in enumerate(a.shape):
            key = (f"{nm}_d{axis}", ln)
            shared = None
            for k, i in dim_ix.items():
                if k[1] == ln:
                    shared = i
                    break
            if shared is None:
                dim_ix[key] = len(dims)
                dims.append((key[0], ln))
                shared = dim_ix[key]
            ids.append(shared)
        var_dims[nm] = ids

    def name(s: str) -> bytes:
        b = s.encode("ascii")
        return struct.pack(">I", len(b)) + b.ljust(_pad4(len(b)), b"\0")

    head = b"CDF\x01" + struct.pack(">I", 0)
    head += struct.pack(">II", _NC_DIMENSION, len(dims))
    for nm, ln in dims:
        head += name(nm) + struct.pack(">I", ln)
    head += struct.pack(">II", 0, 0)  # no global atts
    # variable headers need data offsets — two-pass layout
    payloads = {}
    for nm, a in variables.items():
        if np.issubdtype(a.dtype, np.integer):
            t, raw = 4, np.asarray(a, dtype=">i4").tobytes()
        else:
            t, raw = 6, np.asarray(a, dtype=">f8").tobytes()
        payloads[nm] = (t, raw)
    hdr_size = len(head) + struct.pack(">II", _NC_VARIABLE,
                                       len(variables)).__len__()
    var_hdrs = []
    for nm, a in variables.items():
        h = name(nm) + struct.pack(">I", len(var_dims[nm]))
        h += b"".join(struct.pack(">I", d) for d in var_dims[nm])
        h += struct.pack(">II", 0, 0)  # no atts
        h += struct.pack(">II", payloads[nm][0],
                          _pad4(len(payloads[nm][1])))
        h += struct.pack(">I", 0)  # begin patched later
        var_hdrs.append([nm, h])
    data_off = hdr_size + sum(len(h) for _, h in var_hdrs)
    out = bytearray(head + struct.pack(">II", _NC_VARIABLE,
                                       len(variables)))
    off = data_off
    for nm, h in var_hdrs:
        h = h[:-4] + struct.pack(">I", off)
        off += _pad4(len(payloads[nm][1]))
        out += h
    for nm, _ in var_hdrs:
        raw = payloads[nm][1]
        out += raw.ljust(_pad4(len(raw)), b"\0")
    return bytes(out)
