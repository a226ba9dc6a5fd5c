#!/usr/bin/env python3
"""Dev-time VP8 conformance harness (driver-side tooling, like the
DuckDB oracle — NOT part of the library).

Two directions:
  check <dir>   every <name>.webp in <dir> is decoded with the SYSTEM
                libwebp (WebPDecodeYUVInto) and its Y/U/V planes are
                compared byte-exactly against <name>.yuv dumped by
                graft.Vp8ConformanceDump (this repo's decoder). Proves
                the from-scratch encoder+decoder pair is bitstream-
                conformant, not merely self-consistent.
  gen <dir>     encodes deterministic RGB images with the system
                libwebp encoder (WebPEncodeRGB at several qualities),
                writes <name>.webp plus libwebp's own decoded planes as
                <name>.yuv — third-party streams this repo's decoder
                must match (pinned forever by Vp8ConformanceSpec).
"""
import ctypes, os, struct, sys

lib = ctypes.CDLL("libwebp.so.7")

lib.WebPGetInfo.restype = ctypes.c_int
lib.WebPGetInfo.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                              ctypes.c_float,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def libwebp_decode_yuv(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    if not y:
        return None
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    ys = bytes(bytearray(y[r * stride.value:r * stride.value + W] for r in range(0)))  # placeholder
    yp = b"".join(bytes(y[r * stride.value:r * stride.value + W]) for r in range(H))
    up = b"".join(bytes(u[r * uv_stride.value:r * uv_stride.value + cw]) for r in range(ch))
    vp = b"".join(bytes(v[r * uv_stride.value:r * uv_stride.value + cw]) for r in range(ch))
    lib.WebPFree(y)
    return W, H, yp, up, vp


def read_dump(path):
    raw = open(path, 'rb').read()
    w, h = struct.unpack('<HH', raw[:4])
    cw, ch = (w + 1) // 2, (h + 1) // 2
    n = w * h
    return w, h, raw[4:4 + n], raw[4 + n:4 + n + cw * ch], raw[4 + n + cw * ch:4 + n + 2 * cw * ch]


def first_diff(a, b):
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            return i, x, y
    return None


def check(d):
    names = sorted(f[:-5] for f in os.listdir(d) if f.endswith('.webp'))
    bad = 0
    for n in names:
        data = open(os.path.join(d, n + '.webp'), 'rb').read()
        got = libwebp_decode_yuv(data)
        if got is None:
            print(f"FAIL {n}: libwebp refused the stream")
            bad += 1
            continue
        W, H, yp, up, vp = got
        w2, h2, ye, ue, ve = read_dump(os.path.join(d, n + '.yuv'))
        if (W, H) != (w2, h2):
            print(f"FAIL {n}: dims libwebp={W}x{H} ours={w2}x{h2}")
            bad += 1
            continue
        ok = True
        for plane, a, b in (("Y", yp, ye), ("U", up, ue), ("V", vp, ve)):
            if a != b:
                fd = first_diff(a, b)
                print(f"FAIL {n}: {plane} differs at {fd} ({sum(1 for x,y in zip(a,b) if x!=y)}/{len(a)} bytes)")
                ok = False
        if ok:
            print(f"OK   {n} ({W}x{H})")
        else:
            bad += 1
    print(f"{len(names) - bad}/{len(names)} conformant")
    return 1 if bad else 0


def det_rgb(seed, w, h):
    # deterministic smooth-ish RGB (LCG + bilinear blobs)
    out = bytearray(w * h * 3)
    state = seed & 0xffffffffffffffff
    def nxt():
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) & 0xffffffffffffffff
        return (state >> 33) & 0xff
    anchors = [[nxt() for _ in range(3)] for _ in range(4)]
    for y in range(h):
        for x in range(w):
            fx = x / max(1, w - 1); fy = y / max(1, h - 1)
            for c in range(3):
                v = (anchors[0][c] * (1 - fx) * (1 - fy) + anchors[1][c] * fx * (1 - fy) +
                     anchors[2][c] * (1 - fx) * fy + anchors[3][c] * fx * fy)
                out[(y * w + x) * 3 + c] = int(v) & 0xff
    # sprinkle deterministic detail so coefficients are non-trivial
    for i in range(w * h // 4):
        px = nxt() % w; py = nxt() % h
        out[(py * w + px) * 3] = nxt()
    return bytes(out)


def gen(d):
    os.makedirs(d, exist_ok=True)
    cases = [
        ("lw_q10_64x48", 64, 48, 1001, 10.0),
        ("lw_q50_64x48", 64, 48, 1002, 50.0),
        ("lw_q85_80x56", 80, 56, 1003, 85.0),
        ("lw_q95_33x25", 33, 25, 1004, 95.0),
        ("lw_q75_128x96", 128, 96, 1005, 75.0),
        ("lw_q60_17x13", 17, 13, 1006, 60.0),
    ]
    for name, w, h, seed, q in cases:
        rgb = det_rgb(seed, w, h)
        outp = ctypes.POINTER(ctypes.c_uint8)()
        sz = lib.WebPEncodeRGB(rgb, w, h, w * 3, q, ctypes.byref(outp))
        assert sz > 0, name
        data = bytes(outp[:sz])
        lib.WebPFree(outp)
        assert data[12:16] == b'VP8 ', (name, data[12:16])  # lossy stream
        open(os.path.join(d, name + '.webp'), 'wb').write(data)
        W, H, yp, up, vp = libwebp_decode_yuv(data)
        assert (W, H) == (w, h)
        with open(os.path.join(d, name + '.yuv'), 'wb') as f:
            f.write(struct.pack('<HH', W, H))
            f.write(yp); f.write(up); f.write(vp)
        print(f"gen {name}: {sz} bytes")


if __name__ == '__main__':
    mode, d = sys.argv[1], sys.argv[2]
    sys.exit(check(d) if mode == 'check' else gen(d))
