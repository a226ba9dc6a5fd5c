#!/usr/bin/env python3
"""Dev-time CCITT G3/G4 fax conformance harness (driver-side tooling,
like the DuckDB oracle — NOT part of the library).

Two directions against the SYSTEM libtiff:
  check <dir>   every <name>_k{-1,0}.bin (raw CCITT stream written by
                graft.kernel.CcittFax.encode via the Drive scratch
                main) is wrapped in a minimal single-strip TIFF
                (Compression 4 for K<0 / 3 for K=0, PhotometricMinIsWhite
                per BlackIs1=true planes) and decoded with libtiff's
                TIFFReadScanline; the scanlines must equal <name>.pix
                byte-exactly. Proves the encoder emits streams a strict
                third-party decoder accepts.
  gen <dir>     encodes deterministic bilevel planes with libtiff's own
                G4 / G3-1D(EOL) / G3-2D(EOL) coders and dumps the raw
                strip bytes as <name>.bin + the plane as <name>.pix —
                third-party streams this repo's decoder must match
                (pinned by CcittConformanceSpec from
                src/test/resources/ccitt).
"""
import ctypes, os, random, struct, sys

lib = ctypes.CDLL("libtiff.so.6")
lib.TIFFOpen.restype = ctypes.c_void_p
lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
lib.TIFFReadScanline.restype = ctypes.c_int
lib.TIFFReadScanline.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_uint32, ctypes.c_uint16]
lib.TIFFWriteScanline.restype = ctypes.c_int
lib.TIFFWriteScanline.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_uint32, ctypes.c_uint16]
lib.TIFFClose.argtypes = [ctypes.c_void_p]
# TIFFSetField is varargs; declare per-call below
lib.TIFFSetField.restype = ctypes.c_int

T_WIDTH, T_LENGTH, T_BPS, T_COMP, T_PHOTO = 256, 257, 258, 259, 262
T_STRIPOFF, T_SPP, T_RPS, T_STRIPBC = 273, 277, 278, 279
T_T4OPTIONS = 292
T_ROWS_PER_STRIP = 278
COMP_G3, COMP_G4 = 3, 4


def wrap_tiff(path, data, cols, rows, k):
    """Minimal little-endian single-strip TIFF around a raw CCITT stream."""
    comp = COMP_G4 if k < 0 else COMP_G3
    entries = [
        (T_WIDTH, 3, 1, cols), (T_LENGTH, 3, 1, rows), (T_BPS, 3, 1, 1),
        (T_COMP, 3, 1, comp), (T_PHOTO, 3, 1, 0),
        (T_STRIPOFF, 4, 1, 0),  # patched below
        (T_SPP, 3, 1, 1), (T_RPS, 3, 1, rows), (T_STRIPBC, 4, 1, len(data)),
    ]
    if k > 0:
        entries.insert(5, (T_T4OPTIONS, 4, 1, 1))  # bit0: 2-D rows present
    entries.sort()
    hdr = struct.pack("<2sHI", b"II", 42, 8)
    ifd = struct.pack("<H", len(entries))
    data_off = 8 + 2 + 12 * len(entries) + 4
    body = b""
    for tag, typ, cnt, val in entries:
        if tag == T_STRIPOFF:
            val = data_off
        body += struct.pack("<HHII", tag, typ, cnt, val)
    with open(path, "wb") as f:
        f.write(hdr + ifd + body + struct.pack("<I", 0) + data)


def decode_tiff(path, cols, rows):
    tif = lib.TIFFOpen(path.encode(), b"r")
    if not tif:
        return None
    stride = (cols + 7) // 8
    buf = ctypes.create_string_buffer(stride + 8)
    out = b""
    ok = True
    for y in range(rows):
        if lib.TIFFReadScanline(tif, buf, y, 0) != 1:
            ok = False
            break
        out += buf.raw[:stride]
    lib.TIFFClose(tif)
    return out if ok else None


def check(d):
    bad = total = 0
    for f in sorted(os.listdir(d)):
        if not f.endswith(".bin") or "_k" not in f:
            continue
        stem = f[:-4]
        dims, k = stem.rsplit("_k", 1)
        cols, rows = map(int, dims.rsplit("_", 1)[1].split("x"))
        k = int(k)
        data = open(os.path.join(d, f), "rb").read()
        exp = open(os.path.join(d, stem + ".pix"), "rb").read()
        tifp = os.path.join(d, stem + ".tif")
        wrap_tiff(tifp, data, cols, rows, k)
        got = decode_tiff(tifp, cols, rows)
        total += 1
        if got is None:
            print(stem, "LIBTIFF REJECTED"); bad += 1
        elif got != exp:
            print(stem, "MISMATCH"); bad += 1
    print(f"{total - bad}/{total} EXACT" + ("" if bad == 0 else f" — {bad} FAILURES"))
    return 1 if bad else 0


def set_int(tif, tag, v):
    # varargs call: the handle must be wrapped or ctypes truncates it
    lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag), ctypes.c_int(v))


FIXTURES = [
    ("noise_61x40", 61, 40, "noise"), ("runs_128x32", 128, 32, "runs"),
    ("edges_100x17", 100, 17, "edges"), ("black_48x24", 48, 24, "black"),
    ("text_200x60", 200, 60, "text"),
]


def make_plane(cols, rows, kind, seed):
    rnd = random.Random(seed)
    stride = (cols + 7) // 8
    px = bytearray(stride * rows)
    def setp(x, y):
        px[y * stride + (x >> 3)] |= 0x80 >> (x & 7)
    if kind == "noise":
        for y in range(rows):
            for x in range(cols):
                if rnd.random() < 0.35:
                    setp(x, y)
    elif kind == "runs":
        for y in range(rows):
            for x in range(cols):
                if (x // (3 + y % 9)) % 2 == 0:
                    setp(x, y)
    elif kind == "edges":
        for y in range(rows):
            setp(0, y); setp(cols - 1, y)
    elif kind == "black":
        for y in range(rows):
            for x in range(cols):
                setp(x, y)
    elif kind == "text":  # sparse glyph-ish strokes
        for _ in range(rows * 4):
            x0, y0 = rnd.randrange(cols - 4), rnd.randrange(rows)
            for dx in range(rnd.randrange(1, 5)):
                setp(x0 + dx, y0)
    return bytes(px)


def gen(d):
    os.makedirs(d, exist_ok=True)
    for name, cols, rows, kind in FIXTURES:
        px = make_plane(cols, rows, kind, hash(name) & 0xffff)
        stride = (cols + 7) // 8
        for label, comp, t4 in (("g4", COMP_G4, None),
                                ("g31d", COMP_G3, 0), ("g32d", COMP_G3, 1)):
            tifp = os.path.join(d, f"{name}_{label}.tif")
            tif = lib.TIFFOpen(tifp.encode(), b"w")
            set_int(tif, T_WIDTH, cols); set_int(tif, T_LENGTH, rows)
            set_int(tif, T_BPS, 1); set_int(tif, T_SPP, 1)
            set_int(tif, T_COMP, comp); set_int(tif, T_PHOTO, 0)
            set_int(tif, T_ROWS_PER_STRIP, rows)
            if t4 is not None:
                set_int(tif, T_T4OPTIONS, t4)
            for y in range(rows):
                row = ctypes.create_string_buffer(px[y * stride:(y + 1) * stride], stride)
                assert lib.TIFFWriteScanline(tif, row, y, 0) == 1
            lib.TIFFClose(tif)
            # pull the raw strip back out of the wrapper
            raw = extract_strip(tifp)
            open(os.path.join(d, f"{name}_{label}.bin"), "wb").write(raw)
            os.remove(tifp)
        open(os.path.join(d, f"{name}.pix"), "wb").write(px)
        open(os.path.join(d, f"{name}.dims"), "w").write(f"{cols} {rows}\n")
    print("generated", len(FIXTURES) * 3, "libtiff streams in", d)
    return 0


def extract_strip(path):
    data = open(path, "rb").read()
    endian = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    (n,) = struct.unpack_from(endian + "H", data, ifd_off)
    off = bc = None
    for i in range(n):
        tag, typ, cnt, val = struct.unpack_from(endian + "HHII", data, ifd_off + 2 + 12 * i)
        if typ == 3:
            val &= 0xffff
        if tag == T_STRIPOFF:
            off = val
        if tag == T_STRIPBC:
            bc = val
    return data[off:off + bc]


if __name__ == "__main__":
    cmd, d = sys.argv[1], sys.argv[2]
    sys.exit(check(d) if cmd == "check" else gen(d))
