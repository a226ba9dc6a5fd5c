#!/usr/bin/env python3
"""Dev-time VP8L (lossless WebP) conformance harness (driver-side
tooling, like the DuckDB oracle — NOT part of the library).

Two directions:
  check <dir>   every <name>.webp in <dir> is decoded with the SYSTEM
                libwebp (WebPDecodeRGBA) and compared byte-exactly
                against <name>.rgba (this repo's expected plane —
                WebpWriterEx.plane for writer streams). Proves the
                writer emits streams strict third-party decoders
                accept (complete prefix codes, correct transform
                chains incl. palette+spatial).
  gen <dir>     encodes deterministic RGB images with the system
                libwebp lossless encoder, writes <name>.webp plus
                libwebp's own RGBA decode as <name>.rgba — third-party
                streams this repo's decoder must match (pinned by
                Vp8lConformanceSpec from src/test/resources/vp8l).
"""
import ctypes, os, random, sys, zlib

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
    ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def decode_rgba(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    out = bytes(ctypes.cast(p, ctypes.POINTER(ctypes.c_uint8 * (w.value * h.value * 4))).contents)
    lib.WebPFree(p)
    return out


def check(d):
    bad = 0
    for f in sorted(os.listdir(d)):
        if not f.endswith(".webp"):
            continue
        data = open(os.path.join(d, f), "rb").read()
        exp = open(os.path.join(d, f[:-5] + ".rgba"), "rb").read()
        got = decode_rgba(data)
        if got is None:
            print(f, "LIBWEBP REJECTED"); bad += 1
        elif got != exp:
            print(f, "MISMATCH"); bad += 1
        else:
            print(f, "EXACT")
    print("ALL EXACT" if bad == 0 else f"{bad} FAILURES")
    return 1 if bad else 0


FIXTURES = {
    "noise_33x25": (33, 25, "noise"), "smooth_64x48": (64, 48, "smooth"),
    "pal_40x30": (40, 30, "pal"), "flat_17x13": (17, 13, "flat"),
    "grad_128x96": (128, 96, "grad")}


def gen(d):
    os.makedirs(d, exist_ok=True)
    for name, (w, h, kind) in FIXTURES.items():
        rnd = random.Random(zlib.crc32(name.encode()))  # stable across runs
        rgb = bytearray()
        for y in range(h):
            for x in range(w):
                if kind == "noise":
                    px = (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
                elif kind == "smooth":
                    px = ((x * 3 + y * 2) % 256, (x + y * 5) % 256, (x * 7) % 256)
                elif kind == "pal":
                    px = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
                          (16, 32, 64)][(x // 4 + y // 3) % 5]
                elif kind == "flat":
                    px = (77, 130, 200)
                else:
                    px = (x % 256, y % 256, (x ^ y) % 256)
                rgb += bytes(px)
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.WebPEncodeLosslessRGB(bytes(rgb), w, h, w * 3, ctypes.byref(out))
        assert n > 0, name
        data = bytes(ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents)
        lib.WebPFree(out)
        open(os.path.join(d, name + ".webp"), "wb").write(data)
        open(os.path.join(d, name + ".rgba"), "wb").write(decode_rgba(data))
        print(name, n, "bytes")


if __name__ == "__main__":
    if len(sys.argv) != 3 or sys.argv[1] not in ("check", "gen"):
        print(__doc__); sys.exit(2)
    sys.exit(check(sys.argv[2]) if sys.argv[1] == "check" else gen(sys.argv[2]) or 0)
