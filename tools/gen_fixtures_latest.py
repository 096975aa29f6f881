#!/usr/bin/env python3
"""Fixtures for the newer-libhdf5 layouts (`libver='latest'` and the
superblock v1/v2 generations between).

Extends gen_fixtures.py (which emits the libhdf5-1.8 subset real Imaris
files use) with an independent writer for:

- superblock v1 (v0 + the 4-byte indexed-storage-K block) and v2/v3
  (root object header direct + checksum trailer);
- version-2 object headers (`OHDR`), including an `OCHK` continuation
  block on one group;
- new-style COMPACT groups: Link Info + one hard Link message per child
  (no symbol tables / local heaps at all);
- attribute message v3;
- dataset layout message v4: compact (class 0), contiguous (class 1),
  and chunked with the Single-Chunk index (class 2, index type 1,
  filtered);
- filter pipeline message v2.

Checksums (superblock v2/v3 trailer, OHDR/OCHK) are written as zeros:
the Scala reader does not verify them, and nothing else in this
container reads HDF5. Voxel content follows the same v() contract as
gen_fixtures.py, so specs assert voxel-exact reads.

Fixture inventory (written into src/test/resources/fixtures/):
- ims_sbv1.ims    — superblock v1, otherwise identical to ims_64
- ims_sbv2.ims    — superblock v2, v2 headers, contiguous level-0 data
- ims_latest.ims  — superblock v3, v2 headers, link groups, 3-level
                    pyramid: L0 chunked(single-chunk idx, gzip+shuffle),
                    L1 contiguous, L2 compact; attrs v3; one OCHK
- ims_dense.ims   — dense storage: DataSetInfo links in a fractal heap +
                    type-5 v2 B-tree (10 links > the 8-link compact
                    limit), Image attrs dense (type-8 B-tree), L0
                    Fixed-Array chunk index (gzip+shuffle), L1 Implicit
                    chunk index (unfiltered), L2 Extensible-Array index
                    (unfiltered; 4 inline elements + EADB data blocks),
                    L3 v2-B-tree index (gzip+shuffle, type-11 records)
"""
import os
import struct
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gen_fixtures as gf  # noqa: E402

UNDEF = gf.UNDEF


class WriterV1(gf.Writer):
    """gen_fixtures.Writer with a version-1 superblock (4 extra bytes of
    indexed-storage K before the address block; root STE at 60)."""

    def __init__(self):
        self.f = gf.F()
        sb = bytearray()
        sb += b"\x89HDF\r\n\x1a\n"
        sb += struct.pack("<BBBB", 1, 0, 0, 0)   # sb ver=1, fs ver, root ver, reserved
        sb += struct.pack("<BBBB", 0, 8, 8, 0)   # shmsg ver, sizeof off/len, reserved
        sb += struct.pack("<HH", 4, 16)          # group leaf K, group internal K
        sb += struct.pack("<I", 0)               # consistency flags
        sb += struct.pack("<HH", 32, 0)          # v1: indexed-storage K + reserved
        sb += struct.pack("<QQQQ", 0, UNDEF, 0, UNDEF)  # base, freespace, EOF, driver
        sb += struct.pack("<QQII16s", 0, 0, 0, 0, b"\x00" * 16)  # root STE
        self.f.w(bytes(sb))
        assert self.f.tell() == 100

    def finish(self, root_children, path):
        root = self.group(root_children)
        self.f.patch(68, struct.pack("<Q", root))  # root OH addr (STE@60 + 8)
        self.f.patch(44, struct.pack("<Q", self.f.tell()))  # EOF
        with open(path, "wb") as fh:
            fh.write(self.f.b)


def msg2(mtype, body):
    """One v2 object-header message (no creation-order field)."""
    return struct.pack("<BHB", mtype, len(body), 0) + body


def dataspace2(dims):
    return struct.pack("<BBBB", 2, len(dims), 0, 1) + b"".join(
        struct.pack("<Q", d) for d in dims)


def dtype_u2_body():
    # class 0 fixed-point v1, little-endian unsigned, 2 bytes, 16 bits
    return struct.pack("<BBBBIHH", 0x10, 0x00, 0x00, 0x00, 2, 0, 16)


def attr3(name, value):
    nm = name.encode() + b"\x00"
    dt = struct.pack("<BBBBI", 0x13, 0x00, 0x00, 0x00, len(value))  # S{n} string
    ds = struct.pack("<BBBB", 2, 0, 0, 0)  # v2 scalar dataspace
    head = struct.pack("<BBHHHB", 3, 0, len(nm), len(dt), len(ds), 0)
    return msg2(0x000C, head + nm + dt + ds + value)


def link_hard(name, oh_addr):
    nm = name.encode()
    body = struct.pack("<BBB", 1, 0, len(nm)) + nm + struct.pack("<Q", oh_addr)
    return msg2(0x0006, body)


def link_info():
    # ver, flags=0, fractal heap UNDEF, name-index btree UNDEF
    return msg2(0x0002, struct.pack("<BBQQ", 1, 0, UNDEF, UNDEF))


def filters2():
    # filter pipeline v2: shuffle(2) then deflate(1)
    out = struct.pack("<BB", 2, 2)
    out += struct.pack("<HHH", 2, 0, 1) + struct.pack("<I", 2)  # shuffle, cd=[2]
    out += struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6)  # deflate, cd=[6]
    return msg2(0x000B, out)


class WriterLatest:
    """Superblock v2/v3 + OHDR-v2 + compact-link-group writer."""

    def __init__(self, sb_version=3):
        self.f = gf.F()
        self.sb_version = sb_version
        sb = bytearray()
        sb += b"\x89HDF\r\n\x1a\n"
        sb += struct.pack("<BBBB", sb_version, 8, 8, 0)  # ver, szoff, szlen, flags
        sb += struct.pack("<QQQQ", 0, UNDEF, 0, 0)       # base, ext, EOF, root OH
        sb += struct.pack("<I", 0)                       # checksum (unverified)
        self.f.w(bytes(sb))
        assert self.f.tell() == 48

    def ohdr(self, messages, continuation_msgs=None):
        """Write a v2 object header; optionally spill `continuation_msgs`
        into an OCHK continuation block referenced from chunk 0."""
        self.f.pad()
        cont_placeholder = None
        blob = b"".join(messages)
        if continuation_msgs is not None:
            cont_placeholder = msg2(0x0010, struct.pack("<QQ", 0, 0))
            blob += cont_placeholder
        addr = self.f.tell()
        self.f.w(b"OHDR" + struct.pack("<BB", 2, 0x02)  # flags: 4-byte chunk0 size
                 + struct.pack("<I", len(blob)) + blob + b"\x00" * 4)
        if continuation_msgs is not None:
            cblob = b"".join(continuation_msgs)
            self.f.pad()
            cont_addr = self.f.tell()
            clen = 4 + len(cblob) + 4  # OCHK sig + messages + checksum
            self.f.w(b"OCHK" + cblob + b"\x00" * 4)
            # patch the continuation message body (addr, len) inside chunk0
            cont_off = addr + 10 + len(blob) - len(cont_placeholder) + 4
            self.f.patch(cont_off, struct.pack("<QQ", cont_addr, clen))
        return addr

    def group(self, children, attrs=None, attrs_in_continuation=False):
        msgs = [link_info()] + [link_hard(n, a) for n, a in sorted(children.items())]
        amsgs = [attr3(k, v.encode()) for k, v in (attrs or {}).items()]
        if attrs_in_continuation and amsgs:
            return self.ohdr(msgs, continuation_msgs=amsgs)
        return self.ohdr(msgs + amsgs)

    def dataset_chunked_single(self, data):
        """Whole array as ONE gzip+shuffle chunk, layout v4 single-chunk index."""
        raw = data.tobytes()
        enc = zlib.compress(gf.shuffle(raw, 2), 6)
        self.f.pad()
        daddr = self.f.w(enc)
        dims = data.shape
        # libhdf5 encodes chunk dimensionality as rank+1 with a trailing
        # element-size pseudo-dimension (H5D__chunk_construct), so a 3-D
        # uint16 dataset writes ndims=4, chunk dims [cz,cy,cx,2]
        chunk_dims = dims + (data.dtype.itemsize,)
        lay = struct.pack("<BBBBB", 4, 2, 0x02, len(chunk_dims), 4)  # v4, chunked, filtered-single, rank+1 dims, 4-byte enc
        lay += b"".join(struct.pack("<I", d) for d in chunk_dims)
        lay += struct.pack("<B", 1)                    # index: Single Chunk
        lay += struct.pack("<QI", len(enc), 0)         # filtered size + mask
        lay += struct.pack("<Q", daddr)
        return self.ohdr([
            msg2(0x0001, dataspace2(dims)),
            msg2(0x0003, dtype_u2_body()),
            filters2(),
            msg2(0x0008, lay)])

    def dataset_contiguous(self, data):
        raw = data.tobytes()
        self.f.pad()
        daddr = self.f.w(raw)
        lay = struct.pack("<BB", 4, 1) + struct.pack("<QQ", daddr, len(raw))
        return self.ohdr([
            msg2(0x0001, dataspace2(data.shape)),
            msg2(0x0003, dtype_u2_body()),
            msg2(0x0008, lay)])

    def dataset_compact(self, data):
        raw = data.tobytes()
        lay = struct.pack("<BBH", 4, 0, len(raw)) + raw
        return self.ohdr([
            msg2(0x0001, dataspace2(data.shape)),
            msg2(0x0003, dtype_u2_body()),
            msg2(0x0008, lay)])

    # ---- dense storage: fractal heap + v2 B-tree ------------------------

    def fractal_heap(self, objects, offset_size, length_size):
        """Write a fractal heap with ONE direct root block holding all
        `objects` (spec III.G). Returns (frhp_addr, [heap_id bytes])."""
        hdr_size = 4 + 1 + 8 + offset_size  # FHDB: sig, ver, heap hdr, block offset
        offs, pos = [], hdr_size
        for o in objects:
            offs.append(pos)
            pos += len(o)
        block_size = 512
        while block_size < pos:
            block_size *= 2
        self.f.pad()
        fhdb = self.f.tell()
        body = b"FHDB" + struct.pack("<B", 0) + struct.pack("<Q", 0)  # hdr addr patched
        body += (0).to_bytes(offset_size, "little")  # block offset 0
        body += b"".join(objects)
        body += b"\x00" * (block_size - len(body))   # free space
        self.f.w(body)
        heap_id_len = 1 + offset_size + length_size
        self.f.pad()
        frhp = self.f.tell()
        h = bytearray()
        h += b"FRHP" + struct.pack("<B", 0)
        h += struct.pack("<HHB", heap_id_len, 0, 0)       # id len, filter len, flags
        h += struct.pack("<I", 1 << (8 * length_size - 1))  # max managed obj size
        h += struct.pack("<QQ", 0, UNDEF)                 # next huge id, huge btree
        h += struct.pack("<QQ", 0, UNDEF)                 # free space, fs manager
        h += struct.pack("<QQ", block_size, block_size)   # managed space, allocated
        h += struct.pack("<QQ", pos, len(objects))        # iterator offset, n managed
        h += struct.pack("<QQQQ", 0, 0, 0, 0)             # huge/tiny sizes+counts
        h += struct.pack("<HQQ", 4, block_size, 65536)    # width, start size, max direct
        h += struct.pack("<HH", 8 * offset_size, 0)       # max heap bits, start rows
        h += struct.pack("<Q", fhdb)                      # root block
        h += struct.pack("<HI", 0, 0)                     # cur rows (direct root), checksum
        self.f.w(bytes(h))
        self.f.patch(fhdb + 5, struct.pack("<Q", frhp))
        ids = [b"\x00" + o.to_bytes(offset_size, "little")
               + len(obj).to_bytes(length_size, "little")
               for o, obj in zip(offs, objects)]
        return frhp, ids

    def btree_v2(self, btype, records, record_size):
        """Depth-0 v2 B-tree: one BTLF leaf + BTHD header (spec III.A.2)."""
        assert all(len(r) == record_size for r in records)
        self.f.pad()
        leaf = self.f.tell()
        self.f.w(b"BTLF" + struct.pack("<BB", 0, btype)
                 + b"".join(records) + b"\x00" * 4)
        self.f.pad()
        hdr = self.f.tell()
        self.f.w(b"BTHD" + struct.pack("<BB", 0, btype)
                 + struct.pack("<IHH", 2048, record_size, 0)  # node size, rec size, depth
                 + struct.pack("<BB", 100, 40)                # split / merge percent
                 + struct.pack("<QHQ", leaf, len(records), len(records))
                 + b"\x00" * 4)
        return hdr

    def dense_group(self, children, attrs=None):
        """Group whose links live in a fractal heap + type-5 name B-tree
        (what libhdf5 writes above 8 links/group)."""
        objs = [link_body(n, a) for n, a in sorted(children.items())]
        frhp, ids = self.fractal_heap(objs, offset_size=4, length_size=2)
        recs = [struct.pack("<I", h) + hid for h, hid in sorted(
            (lookup3(n.encode()), hid) for n, hid in zip(sorted(children), ids))]
        bt = self.btree_v2(5, recs, 11)
        li = msg2(0x0002, struct.pack("<BBQQ", 1, 0, frhp, bt))
        amsgs = [attr3(k, v.encode()) for k, v in (attrs or {}).items()]
        return self.ohdr([li] + amsgs)

    def group_dense_attrs(self, children, attrs):
        """Group whose ATTRIBUTES live in a fractal heap + type-8 B-tree
        (libhdf5 goes dense above 8 attrs — real Imaris `libver=latest`
        Image groups carry 10)."""
        objs = [attr3_body(k, v.encode()) for k, v in sorted(attrs.items())]
        frhp, ids = self.fractal_heap(objs, offset_size=4, length_size=3)
        recs = [hid + struct.pack("<BII", 0, i, h) for h, i, hid in sorted(
            (lookup3(n.encode()), i, hid)
            for i, (n, hid) in enumerate(zip(sorted(attrs), ids)))]
        bt = self.btree_v2(8, recs, 17)
        ai = msg2(0x0015, struct.pack("<BBQQ", 0, 0, frhp, bt))
        msgs = [link_info()] + [link_hard(n, a) for n, a in sorted(children.items())]
        return self.ohdr(msgs + [ai])

    # ---- v4 chunk indexes: Fixed Array + Implicit -----------------------

    def _chunks(self, data, cz, cy, cx):
        """Full-size chunks in row-major grid order (HDF5 pads partials)."""
        z, y, x = data.shape
        for iz in range(0, z, cz):
            for iy in range(0, y, cy):
                for ix in range(0, x, cx):
                    blk = np.zeros((cz, cy, cx), dtype=data.dtype)
                    part = data[iz:iz + cz, iy:iy + cy, ix:ix + cx]
                    blk[:part.shape[0], :part.shape[1], :part.shape[2]] = part
                    yield blk

    def _layout_v4(self, chunk, index_tail):
        chunk_dims = tuple(chunk) + (2,)  # rank+1 with element size
        lay = struct.pack("<BBBBB", 4, 2, 0, len(chunk_dims), 4)
        lay += b"".join(struct.pack("<I", d) for d in chunk_dims)
        return lay + index_tail

    def dataset_chunked_fixed_array(self, data, chunk):
        """gzip+shuffle chunks indexed by a Fixed Array (client 1)."""
        cz, cy, cx = chunk
        entries = []
        for blk in self._chunks(data, cz, cy, cx):
            enc = zlib.compress(gf.shuffle(blk.tobytes(), 2), 6)
            self.f.pad()
            entries.append((self.f.w(enc), len(enc)))
        self.f.pad()
        fadb = self.f.tell()
        self.f.w(b"FADB" + struct.pack("<BB", 0, 1) + struct.pack("<Q", 0)
                 + b"".join(struct.pack("<QII", a, sz, 0) for a, sz in entries)
                 + b"\x00" * 4)
        self.f.pad()
        fahd = self.f.tell()
        self.f.w(b"FAHD" + struct.pack("<BBBB", 0, 1, 16, 10)  # client 1, entry 16, page bits 10
                 + struct.pack("<QQ", len(entries), fadb) + b"\x00" * 4)
        self.f.patch(fadb + 6, struct.pack("<Q", fahd))
        lay = self._layout_v4(chunk,
                              struct.pack("<BB", 3, 10) + struct.pack("<Q", fahd))
        return self.ohdr([
            msg2(0x0001, dataspace2(data.shape)),
            msg2(0x0003, dtype_u2_body()),
            filters2(),
            msg2(0x0008, lay)])

    def dataset_chunked_implicit(self, data, chunk):
        """Unfiltered chunks in a dense array (Implicit index, type 2)."""
        cz, cy, cx = chunk
        self.f.pad()
        base = self.f.tell()
        for blk in self._chunks(data, cz, cy, cx):
            self.f.w(blk.tobytes())
        lay = self._layout_v4(chunk,
                              struct.pack("<B", 2) + struct.pack("<Q", base))
        return self.ohdr([
            msg2(0x0001, dataspace2(data.shape)),
            msg2(0x0003, dtype_u2_body()),
            msg2(0x0008, lay)])

    def dataset_chunked_ext_array(self, data, chunk):
        """Unfiltered chunks indexed by an Extensible Array (index type 4,
        client 0 — what libhdf5 picks for ONE unlimited dimension):
        idx_blk_elmts elements inline in the EAIB index block, the rest in
        directly-addressed EADB data blocks following the H5EA growth rule
        (row u: 2^(u//2) blocks of dblk_min*2^((u+1)//2) elements); super
        blocks never materialize at fixture scale, matching libhdf5."""
        cz, cy, cx = chunk
        addrs = []
        for blk in self._chunks(data, cz, cy, cx):
            self.f.pad()
            addrs.append(self.f.w(blk.tobytes()))
        n = len(addrs)
        max_bits, idx_elmts, dblk_min, sup_min, page_bits = 32, 4, 2, 4, 10
        off_size = (max_bits + 7) // 8
        direct = []  # capacity of each directly-addressed data block
        for u in range(2 * (sup_min.bit_length() - 1)):
            direct += [dblk_min << ((u + 1) // 2)] * (1 << (u // 2))
        dblk_addrs, dblk_sizes = [], []
        idx = idx_elmts
        for per in direct:
            if idx >= n:
                dblk_addrs.append(UNDEF)
                continue
            take = min(per, n - idx)
            self.f.pad()
            a = self.f.tell()
            body = b"EADB" + struct.pack("<BB", 0, 0) + struct.pack("<Q", 0)
            body += idx.to_bytes(off_size, "little")  # block offset
            body += b"".join(struct.pack("<Q", x) for x in addrs[idx:idx + take])
            body += struct.pack("<Q", UNDEF) * (per - take)  # unset slots
            body += b"\x00" * 4                              # checksum
            self.f.w(body)
            dblk_addrs.append(a)
            dblk_sizes.append(len(body))
            idx += take
        assert idx >= n, "fixture outgrew the direct data blocks"
        nsblks_total = 1 + (max_bits - (dblk_min.bit_length() - 1))
        self.f.pad()
        eaib = self.f.tell()
        body = b"EAIB" + struct.pack("<BB", 0, 0) + struct.pack("<Q", 0)
        inline = addrs[:idx_elmts] + [UNDEF] * max(0, idx_elmts - n)
        body += b"".join(struct.pack("<Q", a) for a in inline)
        body += b"".join(struct.pack("<Q", a) for a in dblk_addrs)
        body += struct.pack("<Q", UNDEF) * (nsblks_total - len(direct))  # sblk addrs
        body += b"\x00" * 4
        self.f.w(body)
        self.f.pad()
        eahd = self.f.tell()
        h = b"EAHD" + struct.pack("<BBBBBBBB", 0, 0, 8, max_bits,
                                  idx_elmts, dblk_min, sup_min, page_bits)
        h += struct.pack("<QQQQQQ", 0, 0, len(dblk_sizes), sum(dblk_sizes), n, n)
        h += struct.pack("<Q", eaib) + b"\x00" * 4
        self.f.w(h)
        self.f.patch(eaib + 6, struct.pack("<Q", eahd))
        for a in dblk_addrs:
            if a != UNDEF:
                self.f.patch(a + 6, struct.pack("<Q", eahd))
        lay = self._layout_v4(chunk, struct.pack(
            "<BBBBBB", 4, max_bits, idx_elmts, sup_min, dblk_min, page_bits)
            + struct.pack("<Q", eahd))
        return self.ohdr([
            msg2(0x0001, dataspace2(data.shape)),
            msg2(0x0003, dtype_u2_body()),
            msg2(0x0008, lay)])

    def dataset_chunked_btree_v2(self, data, chunk):
        """gzip+shuffle chunks indexed by a type-11 v2 B-tree (index type
        5 — what libhdf5 picks for >1 unlimited dimension). Records carry
        (address, 4-byte chunk size, filter mask, 3 scaled offsets)."""
        cz, cy, cx = chunk
        gy = -(-data.shape[1] // cy)
        gx = -(-data.shape[2] // cx)
        recs = []
        for i, blk in enumerate(self._chunks(data, cz, cy, cx)):
            enc = zlib.compress(gf.shuffle(blk.tobytes(), 2), 6)
            self.f.pad()
            a = self.f.w(enc)
            iz, iy, ix = i // (gy * gx), (i // gx) % gy, i % gx
            recs.append(struct.pack("<QIIQQQ", a, len(enc), 0, iz, iy, ix))
        bt = self.btree_v2(11, recs, 40)
        lay = self._layout_v4(chunk, struct.pack("<BIBB", 5, 2048, 100, 40)
                              + struct.pack("<Q", bt))
        return self.ohdr([
            msg2(0x0001, dataspace2(data.shape)),
            msg2(0x0003, dtype_u2_body()),
            filters2(),
            msg2(0x0008, lay)])

    def finish(self, root_children, path):
        root = self.group(root_children)
        self.f.patch(28, struct.pack("<Q", self.f.tell()))  # EOF
        self.f.patch(36, struct.pack("<Q", root))           # root OH
        with open(path, "wb") as fh:
            fh.write(self.f.b)


def _rot(x, k):
    return ((x << k) | (x >> (32 - k))) & 0xFFFFFFFF


def lookup3(data, initval=0):
    """Jenkins lookup3 hashlittle (public domain; libhdf5 H5_checksum_lookup3)
    — the name hash stored in v2 B-tree link/attr records. The Scala reader
    walks every record rather than hashing, so this is for format fidelity.
    """
    a = b = c = (0xDEADBEEF + len(data) + initval) & 0xFFFFFFFF
    i, length = 0, len(data)
    while length > 12:
        a = (a + int.from_bytes(data[i:i + 4], "little")) & 0xFFFFFFFF
        b = (b + int.from_bytes(data[i + 4:i + 8], "little")) & 0xFFFFFFFF
        c = (c + int.from_bytes(data[i + 8:i + 12], "little")) & 0xFFFFFFFF
        a = (a - c) & 0xFFFFFFFF; a ^= _rot(c, 4); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= _rot(a, 6); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= _rot(b, 8); b = (b + a) & 0xFFFFFFFF
        a = (a - c) & 0xFFFFFFFF; a ^= _rot(c, 16); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= _rot(a, 19); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= _rot(b, 4); b = (b + a) & 0xFFFFFFFF
        i += 12
        length -= 12
    if length > 0:
        tail = data[i:] + b"\x00" * (12 - length)
        a = (a + int.from_bytes(tail[0:4], "little")) & 0xFFFFFFFF
        b = (b + int.from_bytes(tail[4:8], "little")) & 0xFFFFFFFF
        c = (c + int.from_bytes(tail[8:12], "little")) & 0xFFFFFFFF
        c ^= b; c = (c - _rot(b, 14)) & 0xFFFFFFFF
        a ^= c; a = (a - _rot(c, 11)) & 0xFFFFFFFF
        b ^= a; b = (b - _rot(a, 25)) & 0xFFFFFFFF
        c ^= b; c = (c - _rot(b, 16)) & 0xFFFFFFFF
        a ^= c; a = (a - _rot(c, 4)) & 0xFFFFFFFF
        b ^= a; b = (b - _rot(a, 14)) & 0xFFFFFFFF
        c ^= b; c = (c - _rot(b, 24)) & 0xFFFFFFFF
    return c


def attr3_body(name, value):
    """v3 attribute message BODY (what dense attr heaps store)."""
    nm = name.encode() + b"\x00"
    dt = struct.pack("<BBBBI", 0x13, 0x00, 0x00, 0x00, len(value))
    ds = struct.pack("<BBBB", 2, 0, 0, 0)
    head = struct.pack("<BBHHHB", 3, 0, len(nm), len(dt), len(ds), 0)
    return head + nm + dt + ds + value


def link_body(name, oh_addr):
    """v1 hard-link message BODY (what dense link heaps store)."""
    nm = name.encode()
    return struct.pack("<BBB", 1, 0, len(nm)) + nm + struct.pack("<Q", oh_addr)


def image_attrs(true_shape):
    tz, ty, tx = true_shape
    return {
        "X": str(tx), "Y": str(ty), "Z": str(tz),
        "ExtMin0": "0.0", "ExtMin1": "0.0", "ExtMin2": "0.0",
        "ExtMax0": str(float(tx)), "ExtMax1": str(float(ty)),
        "ExtMax2": str(float(tz)), "Unit": "um",
    }


def make_sbv1(path):
    w = WriterV1()
    ds = w.chunked_dataset(gf.voxels((64, 64, 64), 0), (16, 32, 32), {"gzip", "shuffle"})
    ch = w.group({"Data": ds})
    tp = w.group({"Channel 0": ch})
    rl = w.group({"TimePoint 0": tp})
    dataset_grp = w.group({"ResolutionLevel 0": rl})
    image = w.group_with_attrs(image_attrs((64, 64, 64)))
    info = w.group({"Image": image})
    w.finish({"DataSet": dataset_grp, "DataSetInfo": info}, path)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


def make_latest(path, sb_version):
    w = WriterLatest(sb_version)
    levels = {}
    specs = [((64, 64, 64), "chunked"), ((32, 32, 32), "contiguous"),
             ((16, 16, 16), "compact")]
    if sb_version == 2:  # smaller variant: contiguous only
        specs = [((64, 64, 64), "contiguous")]
    for lvl, (shape, kind) in enumerate(specs):
        data = gf.voxels(shape, lvl)
        ds = (w.dataset_chunked_single(data) if kind == "chunked"
              else w.dataset_contiguous(data) if kind == "contiguous"
              else w.dataset_compact(data))
        ch = w.group({"Data": ds})
        tp = w.group({"Channel 0": ch})
        levels[f"ResolutionLevel {lvl}"] = w.group({"TimePoint 0": tp})
    dataset_grp = w.group(levels)
    # attrs ride an OCHK continuation on the Image group (v2-header path)
    image = w.group({}, attrs=image_attrs((64, 64, 64)), attrs_in_continuation=True)
    info = w.group({"Image": image})
    w.finish({"DataSet": dataset_grp, "DataSetInfo": info}, path)
    print(f"wrote {path} (sb v{sb_version}, {os.path.getsize(path)} bytes)")


def make_dense(path):
    """Dense-storage fixture: DataSetInfo holds 10 child links (fractal
    heap + type-5 B-tree), Image carries its 10 attrs densely (type-8
    B-tree), and the pyramid exercises every remaining v4 chunk index:
    L0 Fixed-Array (gzip+shuffle), L1 Implicit (unfiltered), L2
    Extensible-Array (unfiltered, inline + EADB data blocks), L3 v2
    B-tree (gzip+shuffle, type-11 records)."""
    w = WriterLatest(3)
    writers = {
        "fixed_array": WriterLatest.dataset_chunked_fixed_array,
        "implicit": WriterLatest.dataset_chunked_implicit,
        "ext_array": WriterLatest.dataset_chunked_ext_array,
        "btree_v2": WriterLatest.dataset_chunked_btree_v2,
    }
    levels = {}
    for lvl, (shape, chunk, kind) in enumerate([
            ((64, 64, 64), (32, 32, 32), "fixed_array"),
            ((32, 32, 32), (16, 16, 16), "implicit"),
            ((16, 16, 16), (8, 8, 8), "ext_array"),
            ((8, 8, 8), (4, 4, 4), "btree_v2")]):
        data = gf.voxels(shape, lvl)
        ds = writers[kind](w, data, chunk)
        ch = w.group({"Data": ds})
        tp = w.group({"Channel 0": ch})
        levels[f"ResolutionLevel {lvl}"] = w.group({"TimePoint 0": tp})
    dataset_grp = w.group(levels)
    image = w.group_dense_attrs({}, image_attrs((64, 64, 64)))
    # 10 children (> 8) → libhdf5 would store these links densely
    info_children = {"Image": image}
    for i in range(9):
        info_children[f"Channel {i} Info"] = w.group({})
    info = w.dense_group(info_children)
    w.finish({"DataSet": dataset_grp, "DataSetInfo": info}, path)
    print(f"wrote {path} (dense links/attrs + FA/implicit chunks, "
          f"{os.path.getsize(path)} bytes)")


def main(outdir):
    os.makedirs(outdir, exist_ok=True)
    make_sbv1(f"{outdir}/ims_sbv1.ims")
    make_latest(f"{outdir}/ims_sbv2.ims", 2)
    make_latest(f"{outdir}/ims_latest.ims", 3)
    make_dense(f"{outdir}/ims_dense.ims")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/fixtures")
