"""T.81 Annex D arithmetic (QM) coder for JPEG SOF9 entropy data.

Pure-Python implementation of the binary arithmetic coder used by
arithmetic-coded JPEG (ITU-T T.81 Annex D): the 113-state Qe probability
estimation machine (Table D.3), the decoder flow of Figures D.15-D.20
(DECODE, MPS/LPS_EXCHANGE, RENORMD, BYTEIN with the marker test and the
post-0xFF stuffed-bit byte), and a matching encoder (Figures D.5-D.10:
interval subdivision with conditional MPS/LPS exchange, RENORME, BYTEOUT
with carry resolution through the stuffed bit, FLUSH).

Statistics bins are bytes in a caller-owned bytearray: bits 0-6 hold the
state index, bit 7 the current MPS sense — the same compact layout
libjpeg uses, so one `bytearray(n)` (all state 0, MPS 0) is a freshly
initialized context set.

``ARITH_STATES`` carries Table D.3 verbatim (public spec data); when the
system libjpeg is loadable its exported ``jpeg_aritab`` is decoded and
byte-compared at import, the same guard `vp8_tables.py` applies to the
RFC 6386 constants.

Evidence class (same as the VP8 writer, README "Known limitations"): the
encoder here is an independent implementation whose streams the decoder
must track bit-for-bit — any disagreement in interval arithmetic,
state transitions, stuffing, or carry handling desynchronizes within a
few symbols (stress-tested across adversarial patterns in
tests/test_jpeg_arith.py). No arithmetic-coded JPEG sample or
third-party codec for it exists in this sandbox; a libjpeg conformance
hook would slot into the same tests when one does.
"""

from __future__ import annotations

# (Qe, NextMPS, NextLPS, SwitchMPS) -- T.81 Table D.3 rows 0..112 plus
# libjpeg's fixed 113th "jammed" state (Qe ~0.5, never adapts): the
# fixed-probability bin used for AC sign decisions.
ARITH_STATES = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

FIXED_BIN = 113  # non-adapting ~0.5 state (AC sign decisions)


def _verify_against_libjpeg() -> None:
    """Byte-compare ARITH_STATES with the system libjpeg's exported
    ``jpeg_aritab`` when the library is loadable (best-effort guard)."""
    try:
        import ctypes

        lib = ctypes.CDLL("libjpeg.so.62")
        tab = ctypes.cast(lib.jpeg_aritab, ctypes.POINTER(ctypes.c_int64))
        for i, (qe, nmps, nlps, sw) in enumerate(ARITH_STATES):
            v = tab[i]
            assert (v >> 16, (v >> 8) & 0x7F, v & 0x7F, (v >> 7) & 1) == (
                qe, nmps, nlps, sw), f"jpeg_aritab row {i} mismatch"
    except (OSError, AttributeError):
        pass  # no system libjpeg: the embedded table stands on the spec


_verify_against_libjpeg()


class ArithDecoder:
    """T.81 D.2 decoder over one entropy-coded segment.

    ``data`` is the JPEG byte stream; decoding starts at ``start``. The
    entropy data uses JPEG's usual byte stuffing (a data 0xFF is followed
    by a stuffed 0x00; 0xFF followed by anything else is a marker), and
    once the segment's marker is reached the coder feeds ZERO bytes — the
    interoperable convention (libjpeg jdarith.c), which is also what lets
    the encoder drop trailing zero bytes at flush time. The caller finds
    the terminating marker at ``bp`` afterwards with the usual scan."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.bp = start
        self.marker_hit = False
        # initial interval is 0x10000 (unit interval at 16-bit scale), so
        # INITDEC loads exactly 16 fraction bits into Chigh
        self.c = self._next_byte() << 16
        self.c += self._next_byte() << 8
        self.c = (self.c << 8) & 0xFFFFFFFF
        self.ct = 0
        self.a = 0x10000

    def _next_byte(self) -> int:
        """Next unstuffed entropy byte; zero-fill at/after the marker."""
        if self.marker_hit or self.bp >= len(self.data):
            self.marker_hit = True
            return 0
        b = self.data[self.bp]
        if b == 0xFF:
            nxt = self.data[self.bp + 1] if self.bp + 1 < len(self.data) else 0xD9
            if nxt != 0:
                self.marker_hit = True  # marker: leave bp pointing at it
                return 0
            self.bp += 2  # stuffed zero byte
            return 0xFF
        self.bp += 1
        return b

    def _byte_in(self) -> None:
        self.c += self._next_byte() << 8
        self.ct = 8

    def decode(self, stats: bytearray, bin_idx: int) -> int:
        """One binary decision from the context bin ``stats[bin_idx]``."""
        sv = stats[bin_idx]
        qe, nmps, nlps, switch = ARITH_STATES[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        chigh = (self.c >> 16) & 0xFFFF
        if chigh < self.a:
            if self.a & 0x8000:
                return mps
            # MPS_EXCHANGE (Figure D.16)
            if self.a < qe:
                d = 1 - mps
                if switch:
                    mps = 1 - mps
                stats[bin_idx] = (mps << 7) | nlps
            else:
                d = mps
                stats[bin_idx] = (mps << 7) | nmps
        else:
            # LPS_EXCHANGE (Figure D.17)
            self.c -= self.a << 16
            if self.a < qe:
                d = mps
                stats[bin_idx] = (mps << 7) | nmps
            else:
                d = 1 - mps
                if switch:
                    mps = 1 - mps
                stats[bin_idx] = (mps << 7) | nlps
            self.a = qe
        # RENORMD (Figure D.18)
        while True:
            if self.ct == 0:
                self._byte_in()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class ArithEncoder:
    """T.81 D.1 encoder producing one entropy-coded segment (byte-stuffed
    0xFF00, carry resolved through the stacked-0xFF discipline of Figure
    D.9, trailing zero bytes dropped at flush — the conventions the
    decoder above and every interoperable implementation expect)."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.held: int | None = None  # last extracted byte, carry target
        self.sc = 0  # count of stacked 0xFF bytes awaiting carry decision
        self.out = bytearray()

    def encode(self, stats: bytearray, bin_idx: int, d: int) -> None:
        sv = stats[bin_idx]
        qe, nmps, nlps, switch = ARITH_STATES[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if d == mps:
            # CODEMPS (Figure D.7)
            if self.a & 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            stats[bin_idx] = (mps << 7) | nmps
        else:
            # CODELPS (Figure D.6)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            if switch:
                mps = 1 - mps
            stats[bin_idx] = (mps << 7) | nlps
        # RENORME (Figure D.8)
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()
            if self.a & 0x8000:
                break

    def _emit_stuffed(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)  # byte stuffing

    def _byte_out(self) -> None:
        t = self.c >> 19
        self.c &= 0x7FFFF
        self.ct = 8
        if t > 0xFF:
            # carry: ripples into the held byte; stacked 0xFFs become 0x00
            if self.held is None:
                raise AssertionError("carry with no held byte")
            self._emit_stuffed(self.held + 1)
            self.out.extend(b"\x00" * self.sc)
            self.sc = 0
            self.held = t & 0xFF
        elif t == 0xFF:
            self.sc += 1  # stack: carry decision still pending
        else:
            if self.held is not None:
                self._emit_stuffed(self.held)
            for _ in range(self.sc):
                self._emit_stuffed(0xFF)
            self.sc = 0
            self.held = t

    def flush(self) -> bytes:
        """FLUSH (Figure D.10): point C at the value inside the final
        interval with the most trailing zero bits, push the remaining
        bits out, and drop trailing zero bytes (the decoder zero-fills
        past the marker; a stuffed 0x00 after a data 0xFF is kept)."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        if t < self.c:
            t += 0x8000
        self.c = t
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byte_out()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byte_out()
        if self.held is not None:
            self._emit_stuffed(self.held)
            self.held = None
        for _ in range(self.sc):
            self._emit_stuffed(0xFF)
        self.sc = 0
        while (
            self.out and self.out[-1] == 0
            and not (len(self.out) >= 2 and self.out[-2] == 0xFF)
        ):
            del self.out[-1]
        return bytes(self.out)
