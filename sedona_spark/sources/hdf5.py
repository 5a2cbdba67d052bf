"""Minimal HDF5 codec (pure stdlib) — the NetCDF-4 carrier format.

NetCDF-4 files ARE HDF5 files (netCDF-4 uses HDF5 as its storage layer),
so the ``RS_FromNetCDF`` seam for modern files is an HDF5 reader. This
module implements the published HDF5 File Format Specification's classic
bottom layer, the subset every netCDF-4 classic-model file uses:

* version-0 superblock (8-byte offsets/lengths),
* version-1 object headers,
* root group via symbol-table message → v1 B-tree (node type 0) →
  SNOD symbol-table nodes → local heap link names,
* dataspace (simple, ≤3 dims) / datatype (fixed-point + IEEE float,
  little-endian) / data-layout v3 messages,
* CONTIGUOUS layout and CHUNKED layout (v1 B-tree node type 1) with the
  DEFLATE, SHUFFLE and FLETCHER32 filter pipeline — ``nc_def_var_deflate
  (shuffle=1)`` + ``nc_def_var_fletcher32`` cover what the netCDF-4 C
  library can attach to a classic-model variable.

Out of scope (documented seam, raise ``NotImplementedError``): v2+
superblocks, fractal-heap "new style" groups, the patented szip filter,
variable-length/compound datatypes. Real-world netCDF-4 classic-model
output from the C library defaults to exactly the supported shapes.

A matching writer keeps the pair round-trip testable with no external
fixture (same philosophy as the classic-CDF pair in ``netcdf.py``).

Reference capability: ``RasterConstructors.java:76-110`` reads NetCDF
via ucar netcdf-java, which carries HDF5 support for NetCDF-4.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF

# message type ids
_MSG_DATASPACE = 0x0001
_MSG_DATATYPE = 0x0003
_MSG_FILL_VALUE = 0x0005
_MSG_LAYOUT = 0x0008
_MSG_FILTER = 0x000B
_MSG_SYMBOL_TABLE = 0x0011

_FILTER_DEFLATE = 1
_FILTER_SHUFFLE = 2
_FILTER_FLETCHER32 = 3


def _shuffle_bytes(raw: bytes, itemsize: int) -> bytes:
    """HDF5 SHUFFLE filter forward pass: regroup element bytes so all
    byte-0s come first, then all byte-1s, … (makes deflate see long
    same-significance runs). Trailing ``len % itemsize`` bytes are
    copied unchanged at the end — the H5Zshuffle leftover rule, which
    matters when an upstream FLETCHER32 appended a 4-byte checksum."""
    if itemsize <= 1:
        return raw
    cut = (len(raw) // itemsize) * itemsize
    a = np.frombuffer(raw[:cut], dtype=np.uint8).reshape(-1, itemsize)
    return a.T.tobytes() + raw[cut:]


def _deshuffle_bytes(raw: bytes, itemsize: int) -> bytes:
    if itemsize <= 1:
        return raw
    cut = (len(raw) // itemsize) * itemsize
    a = np.frombuffer(raw[:cut], dtype=np.uint8).reshape(itemsize, -1)
    return a.T.tobytes() + raw[cut:]


def _fletcher32(data: bytes) -> int:
    """HDF5 ``H5_checksum_fletcher32``: big-endian 16-bit word Fletcher
    sums, folded after each ≤360-word block exactly where the reference
    C implementation folds (the fold is not a pure mod-65535, so block
    boundaries are part of the definition)."""
    n2 = len(data) // 2
    words = np.frombuffer(data[: n2 * 2], dtype=">u2").astype(np.uint64)
    s1 = np.uint64(0)
    s2 = np.uint64(0)
    for b0 in range(0, n2, 360):
        blk = words[b0:b0 + 360]
        t = np.uint64(len(blk))
        # within-block closed form of {s1 += w; s2 += s1} per word
        s2 = s2 + t * s1 + ((np.uint64(len(blk)) - np.arange(
            len(blk), dtype=np.uint64)) * blk).sum()
        s1 = s1 + blk.sum()
        s1 = (s1 & np.uint64(0xFFFF)) + (s1 >> np.uint64(16))
        s2 = (s2 & np.uint64(0xFFFF)) + (s2 >> np.uint64(16))
    if len(data) % 2:
        s1 = s1 + np.uint64(data[-1] << 8)
        s2 = s2 + s1
        s1 = (s1 & np.uint64(0xFFFF)) + (s1 >> np.uint64(16))
        s2 = (s2 & np.uint64(0xFFFF)) + (s2 >> np.uint64(16))
    s1 = (s1 & np.uint64(0xFFFF)) + (s1 >> np.uint64(16))
    s2 = (s2 & np.uint64(0xFFFF)) + (s2 >> np.uint64(16))
    return int((s2 << np.uint64(16)) | s1)

# numpy dtype -> (class, size, signed) for fixed-point; floats special
_INT_DTYPES = {
    np.dtype("uint8"): (1, False), np.dtype("int8"): (1, True),
    np.dtype("uint16"): (2, False), np.dtype("int16"): (2, True),
    np.dtype("uint32"): (4, False), np.dtype("int32"): (4, True),
    np.dtype("uint64"): (8, False), np.dtype("int64"): (8, True),
}


def _align8(n: int) -> int:
    return (n + 7) & ~7


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------


def _dt_message(dt: np.dtype) -> bytes:
    """Datatype message body for a little-endian fixed-point or IEEE
    float type (HDF5 spec IV.A.2.d)."""
    if dt in _INT_DTYPES:
        size, signed = _INT_DTYPES[dt]
        b0 = 0x08 if signed else 0x00  # bit0 order=LE, bit3 sign
        return struct.pack(
            "<B3BI2H", (1 << 4) | 0, b0, 0, 0, size, 0, size * 8)
    if dt == np.dtype("float32"):
        return struct.pack(
            "<B3BI2H4B I", (1 << 4) | 1, 0x20, 31, 0, 4, 0, 32,
            23, 8, 0, 23, 127)
    if dt == np.dtype("float64"):
        return struct.pack(
            "<B3BI2H4B I", (1 << 4) | 1, 0x20, 63, 0, 8, 0, 64,
            52, 11, 0, 52, 1023)
    raise NotImplementedError(f"hdf5: unsupported dtype {dt}")


def _messages_block(msgs: list[tuple[int, bytes]]) -> bytes:
    out = bytearray()
    for mtype, body in msgs:
        body = body.ljust(_align8(len(body)), b"\0")
        out += struct.pack("<HHB3x", mtype, len(body), 0) + body
    return bytes(out)


def _object_header(msgs: list[tuple[int, bytes]]) -> bytes:
    block = _messages_block(msgs)
    return (struct.pack("<BBHII", 1, 0, len(msgs), 1, len(block))
            + b"\0\0\0\0" + block)


def _msg_body_offsets(msgs: list[tuple[int, bytes]]) -> list[int]:
    """Offset of each message BODY inside an _object_header() blob —
    computed arithmetically (a byte-pattern search could false-match
    e.g. a dimension value inside an earlier message)."""
    offs, o = [], 16  # 12-byte v1 prefix + 4 alignment pad
    for _mtype, body in msgs:
        offs.append(o + 8)  # 8-byte message header
        o += 8 + _align8(len(body))
    return offs


def encode_hdf5(
    variables: dict[str, np.ndarray],
    chunk_rows: int | None = None,
    deflate: int | None = None,
    shuffle: bool = False,
    fletcher32: bool = False,
) -> bytes:
    """Write 2-D (or 1-D/3-D) numeric arrays as root-group datasets.

    ``chunk_rows`` splits each array into row-block chunks (chunked
    layout + B-tree); ``deflate``/``shuffle``/``fletcher32`` add the
    corresponding filters at that level, in netCDF-4's pipeline order
    (FLETCHER32 → SHUFFLE → DEFLATE, the order ``nc4hdf.c`` registers
    them). Default is the contiguous layout.
    """
    if not variables:
        raise ValueError("hdf5: at least one variable is required")
    if ((deflate is not None or shuffle or fletcher32)
            and chunk_rows is None):
        chunk_rows = max(1, next(iter(variables.values())).shape[0])
    names = sorted(variables)

    # local heap data segment: offset 8 reserved (free-list), names after
    heap_data = bytearray(b"\0" * 8)
    name_off = {}
    for nm in names:
        name_off[nm] = len(heap_data)
        raw = nm.encode("ascii") + b"\0"
        heap_data += raw.ljust(_align8(len(raw)), b"\0")

    pieces: list[bytes] = []
    addr = [0]

    def put(b: bytes) -> int:
        a = addr[0]
        pieces.append(b)
        addr[0] += len(b)
        return a

    put(b"\0" * 96)  # superblock placeholder (patched last)

    # dataset object headers come later; reserve layout by building the
    # fixed group machinery first
    heap_seg_addr_pos = []  # patch later

    # root object header (symbol table msg patched after btree/heap laid)
    root_hdr_addr = addr[0]
    put(_object_header([(_MSG_SYMBOL_TABLE, b"\0" * 16)]))

    heap_hdr_addr = addr[0]
    put(struct.pack("<4sB3xQQQ", b"HEAP", 0, len(heap_data), _UNDEF, 0))
    heap_seg_addr_pos.append(heap_hdr_addr + 24)
    heap_data_addr = put(bytes(heap_data))

    # one SNOD with every dataset entry (k_leaf is sized to fit)
    snod_addr = addr[0]
    snod = bytearray(struct.pack("<4sBBH", b"SNOD", 1, 0, len(names)))
    entry_hdr_pos = {}
    for nm in names:
        entry_hdr_pos[nm] = snod_addr + len(snod) + 8
        snod += struct.pack("<QQII16x", name_off[nm], 0, 0, 0)
    put(bytes(snod))

    btree_addr = addr[0]
    put(struct.pack(
        "<4sBBHQQQQQ", b"TREE", 0, 0, 1, _UNDEF, _UNDEF,
        name_off[names[0]], snod_addr, name_off[names[-1]]))

    # datasets
    hdr_addr = {}
    for nm in names:
        a = np.ascontiguousarray(variables[nm])
        dt = a.dtype.newbyteorder("<")
        a = a.astype(dt, copy=False)
        msgs = [
            (_MSG_DATASPACE,
             struct.pack("<BBB5x", 1, a.ndim, 0)
             + b"".join(struct.pack("<Q", d) for d in a.shape)),
            (_MSG_DATATYPE, _dt_message(a.dtype)),
        ]
        if chunk_rows is None:
            raw = a.tobytes()
            body = struct.pack("<BBQQ", 3, 1, 0, len(raw))
            msgs.append((_MSG_LAYOUT, body))
            hdr_addr[nm] = put(_object_header(msgs))
            # contiguous data address = 2 bytes (ver+class) into the
            # layout message body, which is the last message
            data_addr_pos = (hdr_addr[nm]
                             + _msg_body_offsets(msgs)[-1] + 2)
            daddr = put(raw)
            _patch(pieces, data_addr_pos, struct.pack("<Q", daddr))
        else:
            cshape = (min(chunk_rows, a.shape[0]),) + a.shape[1:]
            recs_f, nf = b"", 0
            if fletcher32:
                # fletcher32: id=3, namelen=0, flags=0, no client values
                recs_f += struct.pack("<HHHH", _FILTER_FLETCHER32, 0, 0, 0)
                nf += 1
            if shuffle:
                # shuffle: id=2, 1 client value = element size in bytes
                recs_f += struct.pack(
                    "<HHHH", _FILTER_SHUFFLE, 0, 0, 1) + struct.pack(
                    "<I", a.dtype.itemsize) + b"\0" * 4
                nf += 1
            if deflate is not None:
                # deflate: id=1, namelen=0, flags=0, 1 client value
                recs_f += struct.pack(
                    "<HHHH", _FILTER_DEFLATE, 0, 0, 1) + struct.pack(
                    "<I", deflate) + b"\0" * 4
                nf += 1
            if nf:
                msgs.append((_MSG_FILTER,
                             struct.pack("<BB6x", 1, nf) + recs_f))
            body = struct.pack("<BBB", 3, 2, a.ndim + 1)
            body += struct.pack("<Q", 0)  # btree addr patched below
            for d in cshape:
                body += struct.pack("<I", d)
            body += struct.pack("<I", a.dtype.itemsize)
            msgs.append((_MSG_LAYOUT, body))
            hdr = _object_header(msgs)
            hdr_addr[nm] = put(hdr)
            # chunk B-tree address = 3 bytes (ver+class+ndims) into the
            # layout message body (the last message)
            bt_pos = hdr_addr[nm] + _msg_body_offsets(msgs)[-1] + 3
            # chunks (row blocks)
            recs = []
            for r0 in range(0, a.shape[0], cshape[0]):
                chunk = np.zeros(cshape, dtype=a.dtype)
                src = a[r0:r0 + cshape[0]]
                chunk[: src.shape[0]] = src
                raw = chunk.tobytes()
                if fletcher32:
                    raw += struct.pack("<I", _fletcher32(raw))
                if shuffle:
                    raw = _shuffle_bytes(raw, a.dtype.itemsize)
                if deflate is not None:
                    raw = zlib.compress(raw, deflate)
                caddr = put(raw)
                recs.append((len(raw), (r0,) + (0,) * (a.ndim - 1),
                             caddr))
            cbt = bytearray(struct.pack(
                "<4sBBHQQ", b"TREE", 1, 0, len(recs), _UNDEF, _UNDEF))
            for nbytes, offs, caddr in recs:
                cbt += struct.pack("<II", nbytes, 0)
                for o in offs:
                    cbt += struct.pack("<Q", o)
                cbt += struct.pack("<Q", 0)  # element-dim offset
                cbt += struct.pack("<Q", caddr)
            # final key (upper bound)
            cbt += struct.pack("<II", 0, 0)
            for d in a.shape:
                cbt += struct.pack("<Q", d)
            cbt += struct.pack("<Q", 0)
            cbt_addr = put(bytes(cbt))
            _patch(pieces, bt_pos, struct.pack("<Q", cbt_addr))

    blob = bytearray(b"".join(pieces))
    # patch SNOD entry header addresses
    for nm in names:
        blob[entry_hdr_pos[nm]:entry_hdr_pos[nm] + 8] = struct.pack(
            "<Q", hdr_addr[nm])
    # patch root symbol-table message (btree + heap header addresses);
    # it is the root header's only message: body at prefix(16) + hdr(8)
    st_off = root_hdr_addr + 16 + 8
    blob[st_off:st_off + 16] = struct.pack("<QQ", btree_addr,
                                           heap_hdr_addr)
    # patch heap data segment address
    p = heap_seg_addr_pos[0]
    blob[p:p + 8] = struct.pack("<Q", heap_data_addr)
    # superblock
    sb = _SIG + struct.pack(
        "<BBBBBBBBHHIQQQQ", 0, 0, 0, 0, 0, 8, 8, 0,
        max(4, len(names)), 16, 0,
        0, _UNDEF, len(blob), _UNDEF)
    sb += struct.pack("<QQII16x", 0, root_hdr_addr, 0, 0)
    blob[: len(sb)] = sb
    return bytes(blob)


def _patch(pieces: list[bytes], pos: int, data: bytes) -> None:
    off = 0
    for i, p in enumerate(pieces):
        if off <= pos < off + len(p):
            b = bytearray(p)
            b[pos - off:pos - off + len(data)] = data
            pieces[i] = bytes(b)
            return
        off += len(p)
    raise AssertionError("patch position out of range")


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------


def _parse_datatype(body: bytes) -> np.dtype:
    cls_ver = body[0]
    cls = cls_ver & 0x0F
    bits0 = body[1]
    size = struct.unpack_from("<I", body, 4)[0]
    if bits0 & 0x01:
        raise NotImplementedError("hdf5: big-endian datatypes")
    if cls == 0:  # fixed-point
        signed = bool(bits0 & 0x08)
        return np.dtype(f"<{'i' if signed else 'u'}{size}")
    if cls == 1:  # float
        if size == 4:
            return np.dtype("<f4")
        if size == 8:
            return np.dtype("<f8")
    raise NotImplementedError(f"hdf5: datatype class {cls} size {size}")


def _parse_messages(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    ver, _res, nmsg, _ref, hsize = struct.unpack_from("<BBHII", buf, addr)
    if ver != 1:
        raise NotImplementedError("hdf5: only v1 object headers")
    o = addr + 16
    end = o + hsize
    msgs = []
    while o < end and len(msgs) < nmsg:
        mtype, msize, _flags = struct.unpack_from("<HHB", buf, o)
        body = buf[o + 8:o + 8 + msize]
        # object header continuation (0x0010): follow it
        if mtype == 0x0010:
            caddr, clen = struct.unpack_from("<QQ", body, 0)
            msgs.extend(_parse_cont(buf, caddr, clen, nmsg - len(msgs)))
        else:
            msgs.append((mtype, body))
        o += 8 + msize
    return msgs


def _parse_cont(buf: bytes, addr: int, length: int, room: int):
    o, end, out = addr, addr + length, []
    while o < end and len(out) < room:
        mtype, msize, _flags = struct.unpack_from("<HHB", buf, o)
        out.append((mtype, buf[o + 8:o + 8 + msize]))
        o += 8 + msize
    return out


def _read_chunked(buf: bytes, bt_addr: int, shape, cshape, dt,
                  filters) -> np.ndarray:
    out = np.zeros(shape, dtype=dt)
    ndim = len(shape)

    def walk(a: int) -> None:
        sig, ntype, lvl, used = struct.unpack_from("<4sBBH", buf, a)
        if sig != b"TREE" or ntype != 1:
            raise ValueError("hdf5: bad chunk B-tree node")
        o = a + 8 + 16  # skip siblings
        for _ in range(used):
            nbytes, _mask = struct.unpack_from("<II", buf, o)
            offs = struct.unpack_from(f"<{ndim}Q", buf, o + 8)
            o += 8 + 8 * (ndim + 1)  # key incl. element-dim offset
            child = struct.unpack_from("<Q", buf, o)[0]
            o += 8
            if lvl > 0:
                walk(child)
                continue
            raw = buf[child:child + nbytes]
            for fid, vals in reversed(filters):
                if fid == _FILTER_DEFLATE:
                    raw = zlib.decompress(raw)
                elif fid == _FILTER_SHUFFLE:
                    raw = _deshuffle_bytes(
                        raw, vals[0] if vals else dt.itemsize)
                elif fid == _FILTER_FLETCHER32:
                    want = struct.unpack("<I", raw[-4:])[0]
                    raw = raw[:-4]
                    if _fletcher32(raw) != want:
                        raise ValueError(
                            "hdf5: fletcher32 checksum mismatch")
                else:
                    raise NotImplementedError(f"hdf5: filter id {fid}")
            chunk = np.frombuffer(raw, dtype=dt).reshape(cshape)
            sl = tuple(
                slice(offs[d], min(offs[d] + cshape[d], shape[d]))
                for d in range(ndim))
            out[sl] = chunk[tuple(
                slice(0, sl[d].stop - sl[d].start) for d in range(ndim))]

    walk(bt_addr)
    return out


def _read_dataset(buf: bytes, addr: int) -> np.ndarray:
    dims: tuple[int, ...] = ()
    dt: np.dtype | None = None
    filters: list[tuple[int, list[int]]] = []
    layout = None
    for mtype, body in _parse_messages(buf, addr):
        if mtype == _MSG_DATASPACE:
            ver, ndim, flags = struct.unpack_from("<BBB", body, 0)
            off = 8 if ver == 1 else 4
            dims = struct.unpack_from(f"<{ndim}Q", body, off)
        elif mtype == _MSG_DATATYPE:
            dt = _parse_datatype(body)
        elif mtype == _MSG_FILTER:
            nf = body[1]
            o = 8 if body[0] == 1 else 2
            for _ in range(nf):
                fid, nlen, _fl, ncv = struct.unpack_from("<HHHH", body, o)
                o += 8 + _align8(nlen)
                vals = list(struct.unpack_from(f"<{ncv}I", body, o))
                o += 4 * ncv + (4 if ncv % 2 else 0)
                filters.append((fid, vals))
        elif mtype == _MSG_LAYOUT:
            ver, lclass = struct.unpack_from("<BB", body, 0)
            if ver != 3:
                raise NotImplementedError("hdf5: layout message v!=3")
            if lclass == 1:
                a, sz = struct.unpack_from("<QQ", body, 2)
                layout = ("contig", a, sz)
            elif lclass == 2:
                ndimp1 = body[2]
                bt = struct.unpack_from("<Q", body, 3)[0]
                cdims = struct.unpack_from(f"<{ndimp1}I", body, 11)
                layout = ("chunked", bt, cdims[:-1])
            else:
                raise NotImplementedError("hdf5: compact layout")
    if dt is None or layout is None or not dims:
        raise ValueError("hdf5: dataset header incomplete")
    if layout[0] == "contig":
        _k, a, sz = layout
        return np.frombuffer(buf, dtype=dt,
                             count=int(np.prod(dims)),
                             offset=a).reshape(dims)
    _k, bt, cshape = layout
    return _read_chunked(buf, bt, dims, cshape, dt, filters)


def parse_hdf5(buf: bytes) -> dict[str, np.ndarray]:
    """Root-group datasets of an HDF5 (netCDF-4) byte buffer as
    ``{name: ndarray}``."""
    if buf[:8] != _SIG:
        raise ValueError("not an HDF5 file")
    if buf[8] != 0:
        raise NotImplementedError("hdf5: superblock version > 0")
    if buf[13] != 8 or buf[14] != 8:
        raise NotImplementedError("hdf5: offsets/lengths size != 8")
    root_hdr = struct.unpack_from("<Q", buf, 24 + 8 * 4 + 8)[0]
    bt_addr = heap_addr = None
    for mtype, body in _parse_messages(buf, root_hdr):
        if mtype == _MSG_SYMBOL_TABLE:
            bt_addr, heap_addr = struct.unpack_from("<QQ", body, 0)
    if bt_addr is None:
        raise NotImplementedError(
            "hdf5: root group has no symbol table (new-style group)")
    heap_data = struct.unpack_from("<Q", buf, heap_addr + 24)[0]

    out: dict[str, np.ndarray] = {}

    def name_at(off: int) -> str:
        end = buf.index(b"\0", heap_data + off)
        return buf[heap_data + off:end].decode("ascii")

    def walk_group(a: int) -> None:
        sig, ntype, lvl, used = struct.unpack_from("<4sBBH", buf, a)
        if sig == b"SNOD":
            o = a + 8
            for _ in range(used):
                noff, hdr = struct.unpack_from("<QQ", buf, o)
                o += 40
                out[name_at(noff)] = _read_dataset(buf, hdr)
            return
        if sig != b"TREE" or ntype != 0:
            raise ValueError("hdf5: bad group B-tree node")
        o = a + 8 + 16 + 8  # siblings + key0
        for _ in range(used):
            child = struct.unpack_from("<Q", buf, o)[0]
            o += 16  # child + next key
            walk_group(child)

    walk_group(bt_addr)
    return out
