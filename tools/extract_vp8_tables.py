"""Re-derive the VP8 constant tables from the system libwebp binary.

The VP8 bitstream's entropy tables are public constants published in
RFC 6386 (sections 11.5, 13.4, 13.5, 14.1) and shipped verbatim inside
every conforming decoder.  This tool locates them in the platform
libwebp's .rodata by structural anchors (the tables' own leading bytes,
which are quoted in the RFC text) and prints them as Python literals.
It was used once to materialize ``text_dedup_spark/sources/vp8_tables.py``
and is kept so ``tests/test_vp8.py`` can re-verify every byte of that
module against the installed reference decoder (env-gated on libwebp
being present).

Anchors and shapes (all verified against RFC 6386):
  kBModesProba  [10][10][9]   leading row 231,120,48,89,115,113,120,152,112
  CoeffsProba0  [4][8][3][11] leading row 253,136,254,255,228,219,...
  CoeffsUpdateProba same shape, leading 33x255 then 176,246
  kDcTable      [128] uint8   4,5,6,7,8,9,10,10,... ends 157
  kAcTable      [128] uint16  4,5,6,7,...            ends 284
  kZigzag       [16]          0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15
  kCat3..kCat6  extra-bit probabilities (RFC 6386 13.2 Pcat tables)
"""

from __future__ import annotations

import ctypes.util
import struct


def _libwebp_path() -> str | None:
    for cand in (
        "/lib/x86_64-linux-gnu/libwebp.so.7",
        "/usr/lib/x86_64-linux-gnu/libwebp.so.7",
    ):
        try:
            open(cand, "rb").close()
            return cand
        except OSError:
            continue
    name = ctypes.util.find_library("webp")
    if name:
        # find_library returns a soname, not a path, on many distros;
        # try the common prefixes.
        for prefix in ("/lib/x86_64-linux-gnu/", "/usr/lib/", "/usr/lib64/"):
            try:
                open(prefix + name, "rb").close()
                return prefix + name
            except OSError:
                continue
    return None


def extract(data: bytes) -> dict:
    def at(pat: bytes) -> int:
        i = data.find(pat)
        if i < 0:
            raise LookupError(f"anchor {pat[:8].hex()} not found")
        return i

    out = {}
    i = at(bytes([231, 120, 48, 89, 115, 113, 120, 152, 112]))
    raw = data[i : i + 900]
    out["KF_BMODE_PROB"] = [
        [list(raw[(a * 10 + l) * 9 : (a * 10 + l) * 9 + 9]) for l in range(10)]
        for a in range(10)
    ]
    # The {253,136,...} row is [0][1][0]: block-type 0 ("Y after Y2") has
    # no DC coefficient, so its band-0 group is an unused all-128 filler
    # and the array starts 33 bytes before the anchor.
    i = at(bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])) - 33
    raw = data[i : i + 1056]
    out["COEFF_PROBS"] = [
        [
            [
                list(raw[((t * 8 + b) * 3 + c) * 11 : ((t * 8 + b) * 3 + c) * 11 + 11])
                for c in range(3)
            ]
            for b in range(8)
        ]
        for t in range(4)
    ]
    i = at(bytes([255] * 33 + [176, 246]))
    raw = data[i : i + 1056]
    out["COEFF_UPDATE_PROBS"] = [
        [
            [
                list(raw[((t * 8 + b) * 3 + c) * 11 : ((t * 8 + b) * 3 + c) * 11 + 11])
                for c in range(3)
            ]
            for b in range(8)
        ]
        for t in range(4)
    ]
    i = at(bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17]))
    out["DC_QLOOKUP"] = list(data[i : i + 128])
    i = at(struct.pack("<10H", 4, 5, 6, 7, 8, 9, 10, 11, 12, 13))
    out["AC_QLOOKUP"] = list(struct.unpack_from("<128H", data, i))
    i = at(bytes([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]))
    out["ZIGZAG"] = list(data[i : i + 16])
    for name, anchor in [
        ("CAT3", [173, 148, 140]),
        ("CAT4", [176, 155, 140, 135]),
        ("CAT5", [180, 157, 141, 134, 130]),
        ("CAT6", [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129]),
    ]:
        out[name] = list(data[at(bytes(anchor)) : at(bytes(anchor)) + len(anchor)])
    return out


def main() -> None:
    path = _libwebp_path()
    if path is None:
        raise SystemExit("no system libwebp found")
    tables = extract(open(path, "rb").read())
    for k, v in tables.items():
        print(f"{k} = {v!r}")


if __name__ == "__main__":
    main()
