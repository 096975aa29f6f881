#!/usr/bin/env python3
"""Generate synthetic Imaris (.ims) HDF5 fixtures per FIXTURES.md §1.

This is a from-scratch, pure-python HDF5 *writer* (no h5py in this
environment). It emits the exact subset of HDF5 1.8 that real Imaris files
use — superblock v0, symbol-table groups (local heap + B-tree v1 + SNOD),
v1 object headers, chunked datasets indexed by B-tree v1, filters
deflate(1)/shuffle(2)/lz4(32004) — and nothing else. It is intentionally an
independent implementation from the Scala reader in
src/main/scala/graft/sources/, so the two cross-validate each other.

Voxel content contract (FIXTURES.md): level-l voxel value at (z,y,x) is
  v(z,y,x,l) = ((z*73856093) ^ (y*19349663) ^ (x*83492791) ^ (l*2654435761)) mod 65536
so tests verify voxel-exact reads without stored goldens. Padding voxels
(beyond the true shape, inside the stored/padded shape) are zero.
"""
import struct, zlib, os, sys, json
import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


def voxels(shape, level):
    z, y, x = np.meshgrid(
        np.arange(shape[0], dtype=np.int64),
        np.arange(shape[1], dtype=np.int64),
        np.arange(shape[2], dtype=np.int64),
        indexing="ij",
    )
    v = (z * 73856093) ^ (y * 19349663) ^ (x * 83492791) ^ (level * 2654435761)
    return (v % 65536).astype("<u2")


def lz4_literal_block(data):
    """LZ4 block encoding using literal-only sequences (valid, not compact)."""
    out = bytearray()
    n = len(data)
    # one sequence: token literal-length + extended bytes + literals
    tok_lit = min(n, 15)
    out.append(tok_lit << 4)
    if n >= 15:
        rest = n - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out += data
    return bytes(out)


def lz4_hdf5(data, block_size=1 << 20):
    """HDF5 lz4 filter (32004) framing: u64BE total, u32BE block size,
    then per block u32BE compressed size + block bytes."""
    out = bytearray()
    out += struct.pack(">Q", len(data))
    out += struct.pack(">I", block_size)
    for off in range(0, len(data), block_size):
        blk = data[off:off + block_size]
        comp = lz4_literal_block(blk)
        if len(comp) == len(blk):  # == means "stored raw" per the filter spec
            comp += b"\x00"        # literal encoding is never smaller; avoid collision
        out += struct.pack(">I", len(comp))
        out += comp
    return bytes(out)


def shuffle(data, itemsize):
    a = np.frombuffer(data, dtype=np.uint8).reshape(-1, itemsize)
    return a.T.tobytes()


class F:
    """Append-only file image with patching."""

    def __init__(self):
        self.b = bytearray()

    def tell(self):
        return len(self.b)

    def w(self, data):
        off = len(self.b)
        self.b += data
        return off

    def pad(self, align=8):
        while len(self.b) % align:
            self.b += b"\x00"

    def patch(self, off, data):
        self.b[off:off + len(data)] = data


def msg(mtype, body):
    """One v1 object-header message, 8-byte padded body."""
    pad = (-len(body)) % 8
    body = body + b"\x00" * pad
    return struct.pack("<HHB3s", mtype, len(body), 0, b"\x00" * 3) + body


def object_header(messages):
    blob = b"".join(messages)
    return (
        struct.pack("<BBHII", 1, 0, len(messages), 1, len(blob))
        + b"\x00" * 4  # align messages to 8
        + blob
    )


def dataspace_msg(dims):
    body = struct.pack("<BBB5s", 1, len(dims), 0, b"\x00" * 5)
    for d in dims:
        body += struct.pack("<Q", d)
    return msg(0x0001, body)


def dtype_u2_msg():
    # class 0 fixed-point, v1; LE, unsigned; size 2; offset 0 precision 16
    body = struct.pack("<B3sI", 0x10, b"\x00\x00\x00", 2) + struct.pack("<HH", 0, 16)
    return msg(0x0003, body)


def dtype_s1():
    # class 3 string, v1; size 1; null-padded ascii
    return struct.pack("<B3sI", 0x13, b"\x00\x00\x00", 1)


def layout_chunked_msg(chunk, btree_addr):
    body = struct.pack("<BBB", 3, 2, len(chunk) + 1)
    body += struct.pack("<Q", btree_addr)
    for c in chunk:
        body += struct.pack("<I", c)
    body += struct.pack("<I", 2)  # element size
    return msg(0x0008, body)


def filter_pipeline_msg(filters):
    """filters: list of (id, name, [client_vals])"""
    body = struct.pack("<BB2s4s", 1, len(filters), b"\x00" * 2, b"\x00" * 4)
    for fid, name, vals in filters:
        nameb = (name.encode() + b"\x00") if name else b""
        namelen = len(nameb)
        nameb += b"\x00" * ((-namelen) % 8)
        body += struct.pack("<HHHH", fid, namelen, 0, len(vals))
        body += nameb
        for v in vals:
            body += struct.pack("<I", v)
        if len(vals) % 2 == 1:
            body += b"\x00" * 4
    return msg(0x000B, body)


def attr_msg(name, value_bytes):
    """v1 attribute message: S1-array attribute (Imaris byte-string style)."""
    nameb = name.encode() + b"\x00"
    nameb_p = nameb + b"\x00" * ((-len(nameb)) % 8)
    dt = dtype_s1()
    dt_p = dt + b"\x00" * ((-len(dt)) % 8)
    ds = struct.pack("<BBB5sQ", 1, 1, 0, b"\x00" * 5, len(value_bytes))
    ds_p = ds + b"\x00" * ((-len(ds)) % 8)
    body = (
        struct.pack("<BBHHH", 1, 0, len(nameb), len(dt), len(ds))
        + nameb_p + dt_p + ds_p + value_bytes
    )
    return msg(0x000C, body)


def symtab_msg(btree_addr, heap_addr):
    return msg(0x0011, struct.pack("<QQ", btree_addr, heap_addr))


class Writer:
    def __init__(self):
        self.f = F()
        # superblock v0 placeholder; patch root OH addr + EOF later
        sb = bytearray()
        sb += b"\x89HDF\r\n\x1a\n"
        sb += struct.pack("<BBBB", 0, 0, 0, 0)   # sb ver, fs ver, root ver, reserved
        sb += struct.pack("<BBBB", 0, 8, 8, 0)   # shmsg ver, sizeof offsets, sizeof lengths, reserved
        sb += struct.pack("<HH", 4, 16)          # group leaf K, group internal K
        sb += struct.pack("<I", 0)               # consistency flags
        sb += struct.pack("<QQQQ", 0, UNDEF, 0, UNDEF)  # base, freespace, EOF, driver
        # root symbol table entry: link name offset, OH addr, cache 0
        sb += struct.pack("<QQII16s", 0, 0, 0, 0, b"\x00" * 16)
        self.f.w(bytes(sb))
        self.root_oh_patch = 0x18 + 0x20 + 8  # offset of root OH addr in the entry
        # ^ 8(sig)+4+4+4+4(Ks,flags)=24; +32 (4 addrs)=56; entry starts at 56; OH addr at 56+8=64
        assert self.f.tell() == 96

    def local_heap(self, names):
        """Returns (heap_addr, {name: offset}). Data segment inline after header."""
        data = bytearray(b"\x00" * 8)  # empty string at offset 0
        offs = {}
        for n in names:
            offs[n] = len(data)
            data += n.encode() + b"\x00"
            while len(data) % 8:
                data += b"\x00"
        self.f.pad()
        addr = self.f.tell()
        hdr_size = 4 + 1 + 3 + 8 + 8 + 8  # sig, ver, reserved, size, freelist, dataaddr
        data_addr = addr + hdr_size
        self.f.w(b"HEAP" + struct.pack("<B3sQQQ", 0, b"\x00" * 3, len(data), UNDEF, data_addr))
        self.f.w(bytes(data))
        return addr, offs

    def snod(self, entries):
        """entries: list of (heap_name_offset, oh_addr) sorted by name."""
        self.f.pad()
        addr = self.f.tell()
        out = b"SNOD" + struct.pack("<BBH", 1, 0, len(entries))
        for name_off, oh in entries:
            out += struct.pack("<QQII16s", name_off, oh, 0, 0, b"\x00" * 16)
        self.f.w(out)
        return addr

    def btree_group(self, key_lo, key_hi, snod_addr):
        self.f.pad()
        addr = self.f.tell()
        out = b"TREE" + struct.pack("<BBH", 0, 0, 1)
        out += struct.pack("<QQ", UNDEF, UNDEF)
        out += struct.pack("<QQQ", key_lo, snod_addr, key_hi)
        self.f.w(out)
        return addr

    def group(self, children):
        """children: {name: oh_addr}. Returns group OH addr."""
        names = sorted(children)
        heap_addr, offs = self.local_heap(names)
        entries = [(offs[n], children[n]) for n in names]
        snod_addr = self.snod(entries)
        key_lo = offs[names[0]] if names else 0
        key_hi = offs[names[-1]] if names else 0
        bt = self.btree_group(key_lo, key_hi, snod_addr)
        self.f.pad()
        oh = self.f.tell()
        self.f.w(object_header([symtab_msg(bt, heap_addr)]))
        return oh

    def group_with_attrs(self, attrs):
        """Empty group whose object header carries S1-array attributes."""
        heap_addr, _ = self.local_heap([])
        snod_addr = self.snod([])
        bt = self.btree_group(0, 0, snod_addr)
        self.f.pad()
        oh = self.f.tell()
        msgs = [symtab_msg(bt, heap_addr)]
        for k, v in attrs.items():
            msgs.append(attr_msg(k, v.encode()))
        self.f.w(object_header(msgs))
        return oh

    def chunked_dataset(self, data, chunk, filters):
        """data: numpy <u2 3-D array (stored shape). filters: subset of
        {'gzip','shuffle','lz4'}. Returns dataset OH addr."""
        shape = data.shape
        grid = [(shape[i] + chunk[i] - 1) // chunk[i] for i in range(3)]
        chunk_records = []  # (offset_zyx, stored_addr, stored_len)
        for cz in range(grid[0]):
            for cy in range(grid[1]):
                for cx in range(grid[2]):
                    z0, y0, x0 = cz * chunk[0], cy * chunk[1], cx * chunk[2]
                    # full-size chunk, zero-padded at edges (HDF5 stores full chunks)
                    full = np.zeros(chunk, dtype="<u2")
                    sl = data[z0:z0 + chunk[0], y0:y0 + chunk[1], x0:x0 + chunk[2]]
                    full[: sl.shape[0], : sl.shape[1], : sl.shape[2]] = sl
                    raw = full.tobytes()
                    enc = raw
                    if "shuffle" in filters:
                        enc = shuffle(enc, 2)
                    if "gzip" in filters:
                        enc = zlib.compress(enc, 6)
                    if "lz4" in filters:
                        enc = lz4_hdf5(enc)
                    self.f.pad()
                    addr = self.f.w(enc)
                    chunk_records.append(((z0, y0, x0), addr, len(enc)))

        def key(rec):
            (z0, y0, x0), _, ln = rec
            return struct.pack("<II", ln, 0) + struct.pack("<QQQQ", z0, y0, x0, 0)

        final_key = struct.pack("<II", 0, 0) + struct.pack(
            "<QQQQ", shape[0], shape[1], shape[2], 0
        )

        # leaves of <=32 entries, one internal node if more than one leaf
        leaves = [chunk_records[i:i + 32] for i in range(0, len(chunk_records), 32)]
        leaf_addrs = []
        for li, leaf in enumerate(leaves):
            self.f.pad()
            addr = self.f.tell()
            out = b"TREE" + struct.pack("<BBH", 1, 0, len(leaf))
            out += struct.pack("<QQ", UNDEF, UNDEF)  # sibling links: reader walks children
            for rec in leaf:
                out += key(rec) + struct.pack("<Q", rec[1])
            nxt = leaves[li + 1][0] if li + 1 < len(leaves) else None
            out += key(nxt) if nxt else final_key
            self.f.w(out)
            leaf_addrs.append(addr)
        if len(leaf_addrs) == 1:
            bt = leaf_addrs[0]
        else:
            self.f.pad()
            bt = self.f.tell()
            out = b"TREE" + struct.pack("<BBH", 1, 1, len(leaf_addrs))
            out += struct.pack("<QQ", UNDEF, UNDEF)
            for li, la in enumerate(leaf_addrs):
                out += key(leaves[li][0]) + struct.pack("<Q", la)
            out += final_key
            self.f.w(out)

        fmsgs = []
        fl = []
        if "shuffle" in filters:
            fl.append((2, "", [2]))
        if "gzip" in filters:
            fl.append((1, "", [6]))
        if "lz4" in filters:
            fl.append((32004, "lz4", [1 << 20]))
        if fl:
            fmsgs.append(filter_pipeline_msg(fl))
        self.f.pad()
        oh = self.f.tell()
        self.f.w(
            object_header(
                [dataspace_msg(shape), dtype_u2_msg(), layout_chunked_msg(chunk, bt)]
                + fmsgs
            )
        )
        return oh

    def finish(self, root_children, path):
        root = self.group(root_children)
        self.f.patch(64, struct.pack("<Q", root))
        self.f.patch(40, struct.pack("<Q", self.f.tell()))  # EOF addr
        with open(path, "wb") as fh:
            fh.write(self.f.b)


def make_ims(path, true_shape, stored_shapes, chunk, filters, ext_um=None):
    """stored_shapes: list per level. Voxel content = formula on the TRUE
    region, zeros in padding."""
    w = Writer()
    levels = {}
    tz, ty, tx = true_shape
    for lvl, st in enumerate(stored_shapes):
        # true shape at this level: ceil-div walk of representative factors
        if lvl == 0:
            lt = true_shape
        else:
            prev, curr = stored_shapes[lvl - 1], st
            f = [max(1, round(prev[i] / curr[i])) for i in range(3)]
            pt = levels[lvl - 1]["true"]
            lt = tuple((pt[i] + f[i] - 1) // f[i] for i in range(3))
        data = np.zeros(st, dtype="<u2")
        data[: lt[0], : lt[1], : lt[2]] = voxels(lt, lvl)
        ds = w.chunked_dataset(data, chunk, filters)
        ch = w.group({"Data": ds})
        tp = w.group({"Channel 0": ch})
        rl = w.group({"TimePoint 0": tp})
        levels[lvl] = {"oh": rl, "true": lt}
    dataset_grp = w.group({f"ResolutionLevel {l}": levels[l]["oh"] for l in levels})
    ez, ey, ex = ext_um if ext_um else (float(tz), float(ty), float(tx))
    image = w.group_with_attrs(
        {
            "X": str(tx), "Y": str(ty), "Z": str(tz),
            "ExtMin0": "0.0", "ExtMin1": "0.0", "ExtMin2": "0.0",
            "ExtMax0": str(ex), "ExtMax1": str(ey), "ExtMax2": str(ez),
            "Unit": "um",
        }
    )
    info = w.group({"Image": image})
    w.finish({"DataSet": dataset_grp, "DataSetInfo": info}, path)
    print(f"wrote {path}: true={true_shape} levels={[s for s in stored_shapes]} filters={filters} ({os.path.getsize(path)} bytes)")


def main(outdir):
    os.makedirs(outdir, exist_ok=True)
    make_ims(f"{outdir}/ims_64.ims", (64, 64, 64), [(64, 64, 64)], (16, 32, 32), {"gzip", "shuffle"})
    make_ims(f"{outdir}/ims_64_lz4.ims", (64, 64, 64), [(64, 64, 64)], (16, 32, 32), {"lz4"})
    make_ims(f"{outdir}/ims_padded.ims", (100, 100, 100), [(128, 128, 128)], (32, 64, 64), {"gzip"})
    make_ims(f"{outdir}/ims_pyramid.ims", (64, 128, 128), [(64, 128, 128), (32, 64, 64), (16, 32, 32)], (16, 32, 32), {"gzip"})
    make_ims(f"{outdir}/ims_aniso.ims", (60, 120, 240), [(64, 128, 256), (64, 64, 128)], (16, 32, 32), {"gzip"})
    make_ims(f"{outdir}/ims_tiny_edge.ims", (33, 65, 17), [(64, 128, 64)], (16, 32, 32), set())
    # acquisition.json manifests (FIXTURES.md §2)
    man = f"{outdir}/manifests"
    os.makedirs(man, exist_ok=True)
    json.dump(
        {
            "schema_version": "1.0.0",
            "tiles": [
                {
                    "file_name": "ims_64.ims",
                    "coordinate_transformations": [
                        {"type": "scale", "scale": ["0.748", "0.748", "1.0"]},
                        {"type": "translation", "translation": ["1.2", "3.4", "5.6"]},
                    ],
                }
            ],
        },
        open(f"{man}/acquisition_v1.json", "w"), indent=1,
    )
    json.dump(
        {
            "schema_version": "2.0.0",
            "data_streams": [
                {"configurations": [{"images": [{
                    "image_to_acquisition_transform": [
                        {"object_type": "Scale", "scale": ["0.748", "0.748", "1.0"]},
                        {"object_type": "Translation", "translation": ["1.2", "3.4", "5.6"]},
                    ]}]}]}
            ],
        },
        open(f"{man}/acquisition_v2.json", "w"), indent=1,
    )
    open(f"{man}/acquisition_corrupt.json", "w").write("{ not json !!")
    json.dump({"schema_version": "1.0.0", "tiles": []}, open(f"{man}/acquisition_no_tile.json", "w"))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/fixtures")
