"""Arithmetic-coded JPEG (ITU-T T.81 Annex D/F, process SOF9).

The reference decodes wild JPEGs through the `image`/`zune-jpg` crates
(utils/image.rs:65-88); arithmetic entropy coding is the rarer half of
the sequential DCT process — DICOM archives and patent-era encoders
emit it — and rounds out this engine's JPEG surface next to baseline,
progressive, multi-scan and lossless (functions/jpeg.py).

Two layers, both written against the public spec:

- The QM binary arithmetic coder (Annex D): 16-bit interval register A,
  code register C with the Annex-D bit layout (output byte at bits
  19-26, carry at 27), the Table D.3 probability-estimation state
  machine (113 adaptive states + the non-adapting near-0.5 state used
  for fixed decisions), conditional MPS/LPS exchange, 0x00 stuffing
  after 0xFF, and marker-terminated zero-fill on the decode side
  (D.2.7). The encoder resolves carries by rippling through the byte
  buffer — byte-identical output to the streaming stack formulation of
  D.1.6, without its bookkeeping.

- The DCT-coefficient conditioning layer (Annex F, F.1.4.4/F.2.4):
  statistics areas laid out per Tables F.4/F.5 — DC: 5 contexts × 4
  bins chosen by the previous diff's classification against the L/U
  conditioning bounds, magnitude-category chain X1.. at bin 20,
  magnitude bits at +14; AC: 3 bins per zigzag index k (EOB,
  zero/nonzero, first magnitude decisions), category chains at bin 189
  (k <= Kx) / 217 (k > Kx), sign via the fixed equiprobable state.
  Conditioning bounds come from the DAC marker (defaults L=0, U=1,
  Kx=5 per F.1.4.4.1.2/F.1.4.4.2).

encode_jpeg_arith writes SOF9 streams (grey or YCbCr with any of the
4:4:4/4:2:2/4:4:0/4:2:0 layouts, restart intervals) from the SAME
quantized coefficients as encode_jpeg, so
decode(encode_jpeg_arith(img, q)) == decode(encode_jpeg(img, q))
EXACTLY — the contract the progressive and multi-scan fixture writers
also uphold.

PROGRESSIVE-arithmetic (SOF10, T.81 Annex G.2) is the fourth corner of
the (Huffman|arithmetic) × (sequential|progressive) entropy matrix:
the same spectral-selection + successive-approximation scan scripts as
the SOF2 encoder, with the QM coder underneath — DC first scans code
point-transformed diffs through the Annex-F DC model, DC refinements
code one fixed-estimate bit per block, AC first scans run the
sequential AC model band-limited with the value scaled by 2^Al, and AC
refinement scans follow figure G.10's three-way decision per
coefficient (EOB beyond the previous scan's band end, correction bit
for previously-nonzero coefficients via the k-th +2 bin, newly-nonzero
via the +1 bin with a fixed-estimate sign). encode_jpeg_arith_
progressive mirrors encode_jpeg_progressive's scan script, so
decode(SOF10) == decode(baseline) EXACTLY. Differential processes stay
declared NotImplementedError in decode_jpeg.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg_arith", "encode_jpeg_arith_progressive"]

# ITU-T T.81 Table D.3 — Qe values and the probability-estimation state
# machine: (Qe, next index after LPS, next index after MPS, MPS switch
# flag). Row 113 is the non-adapting near-0.5 state for fixed-
# probability decisions (the AC sign, F.1.4.4.2).
_QM_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
)

_DC_STATS_SIZE = 49  # 5 contexts × 4 + X1..X15 (20..34) + bit bins (+14)
_AC_STATS_SIZE = 256  # 3·63 + chains at 189/217 + bit bins (+14)


class _Stats:
    """One statistics area: per-bin adaptation index + current MPS
    sense (plain lists — scalar-indexed hot path)."""

    def __init__(self, n: int):
        self.idx = [0] * n
        self.mps = [0] * n
        self._n = n

    def reset(self) -> None:
        self.idx = [0] * self._n
        self.mps = [0] * self._n


class _QMEncoder:
    """T.81 Annex D encoder (D.1): A = 16-bit interval, C accumulates
    code bits with the output byte at bits 19-26, CT shifts until a
    byte is ready (11 initially — the three spacer bits — then 8)."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.out = bytearray()

    def encode(self, stats: _Stats, i: int, bit: int) -> None:
        qe, nlps, nmps, switch = _QM_TABLE[stats.idx[i]]
        mps = stats.mps[i]
        self.a -= qe
        if bit == mps:
            if self.a & 0x8000:
                return  # no renorm needed: no adaptation either (D.1.4)
            if self.a < qe:  # conditional exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            stats.idx[i] = nmps
        else:
            if self.a >= qe:  # LPS codes the top subinterval
                self.c += self.a
                self.a = qe
            # else exchange: LPS keeps the (smaller) bottom interval
            if switch:
                stats.mps[i] = 1 - mps
            stats.idx[i] = nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()

    def encode_fixed(self, bit: int) -> None:
        """One decision with the non-adapting near-0.5 state; 0 is the
        (never-switching) MPS."""
        qe = 0x5A1D
        self.a -= qe
        if bit == 0:
            if self.a & 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
        else:
            if self.a >= qe:
                self.c += self.a
                self.a = qe
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()

    def _byte_out(self) -> None:
        t = self.c >> 19
        if t > 0xFF:  # carry: ripple into the already-buffered bytes
            j = len(self.out) - 1
            while self.out[j] == 0xFF:
                self.out[j] = 0
                j -= 1
            self.out[j] += 1
            t &= 0xFF
        self.out.append(t)
        self.c &= 0x7FFFF
        self.ct = 8

    def flush(self) -> bytes:
        """D.1.8-9: point C at the value in [C, C+A) with the most
        trailing zeros, emit the last two bytes, drop trailing 0x00
        (the decoder zero-fills past the marker), stuff 0x00 after
        every 0xFF."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = (t + 0x8000 if t < self.c else t) << self.ct
        if self.c >> 27:  # final carry
            j = len(self.out) - 1
            while self.out[j] == 0xFF:
                self.out[j] = 0
                j -= 1
            self.out[j] += 1
            self.c &= (1 << 27) - 1
        self.out.append((self.c >> 19) & 0xFF)
        self.out.append((self.c >> 11) & 0xFF)
        while self.out and self.out[-1] == 0x00:
            self.out.pop()
        stuffed = bytearray()
        for b in self.out:
            stuffed.append(b)
            if b == 0xFF:
                stuffed.append(0x00)
        return bytes(stuffed)


class _QMDecoder:
    """T.81 Annex D decoder (D.2): C holds the code window whose top
    bits align with A through CT pending low bits; BYTEIN un-stuffs
    0xFF 0x00 and zero-fills once a marker is reached (D.2.7)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.hit_marker = False
        self.c = (self._next_byte() << 8) | self._next_byte()
        self.ct = 0
        self.a = 0x10000

    def _next_byte(self) -> int:
        if self.hit_marker:
            return 0
        d = self.data
        b = d[self.pos] if self.pos < len(d) else 0xFF
        if b != 0xFF:
            self.pos += 1
            return b
        nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
        if nxt == 0x00:
            self.pos += 2
            return 0xFF
        self.hit_marker = True  # leave pos AT the marker for the caller
        return 0

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                self.c = (self.c << 8) | self._next_byte()
                self.ct += 8
            self.a <<= 1

    def decode(self, stats: _Stats, i: int) -> int:
        qe, nlps, nmps, switch = _QM_TABLE[stats.idx[i]]
        mps = stats.mps[i]
        self._renorm()
        self.a -= qe
        a_sub = self.a
        top = a_sub << self.ct
        if self.c < top:
            if a_sub & 0x8000:
                return mps  # mirror of the encoder's short path
            if a_sub < qe:  # exchange: bottom region is the LPS
                bit = 1 - mps
                if switch:
                    stats.mps[i] = bit
                stats.idx[i] = nlps
            else:
                bit = mps
                stats.idx[i] = nmps
        else:
            self.c -= top
            self.a = qe
            if a_sub < qe:  # exchange: top region is the MPS
                bit = mps
                stats.idx[i] = nmps
            else:
                bit = 1 - mps
                if switch:
                    stats.mps[i] = bit
                stats.idx[i] = nlps
        return bit

    def decode_fixed(self) -> int:
        qe = 0x5A1D
        self._renorm()
        self.a -= qe
        a_sub = self.a
        top = a_sub << self.ct
        if self.c < top:
            if a_sub & 0x8000:
                return 0
            return 1 if a_sub < qe else 0
        self.c -= top
        self.a = qe
        return 0 if a_sub < qe else 1


# ---------------------------------------------------------------------------
# DCT-coefficient conditioning (Annex F) — shared bin arithmetic
# ---------------------------------------------------------------------------


def _encode_magnitude(enc, st, sp_bin, chain, v, double_at_sp):
    """Encode V = |value|-1 through the category chain + bit pattern
    (F.1.4.4, figures F.8/F.9). `double_at_sp`: AC repeats the second
    decision at SP before moving to the chain; DC chains from X1."""
    if v == 0:
        enc.encode(st, sp_bin, 0)
        return
    enc.encode(st, sp_bin, 1)
    m = 1
    pos = sp_bin if double_at_sp else chain
    if double_at_sp:
        if v < 2:
            enc.encode(st, sp_bin, 0)
            return  # m = 1 → no magnitude bits
        enc.encode(st, sp_bin, 1)
        m = 2
        pos = chain
    while (m << 1) <= v:
        enc.encode(st, pos, 1)
        m <<= 1
        pos += 1
    enc.encode(st, pos, 0)
    bit_bin = pos + 14
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(st, bit_bin, 1 if v & mm else 0)


def _decode_magnitude(dec, st, sp_bin, chain, double_at_sp):
    """Mirror of _encode_magnitude → V (=|value|-1)."""
    if dec.decode(st, sp_bin) == 0:
        return 0
    m = 1
    pos = sp_bin if double_at_sp else chain
    if double_at_sp:
        if dec.decode(st, sp_bin) == 0:
            return 1
        m = 2
        pos = chain
    while dec.decode(st, pos):
        m <<= 1
        if m == 0x8000:
            raise ValueError("arithmetic JPEG magnitude category overflow")
        pos += 1
    bit_bin = pos + 14
    v = m
    mm = m
    while mm > 1:
        mm >>= 1
        if dec.decode(st, bit_bin):
            v |= mm
    return v


def _classify_dc(m: int, sign: int, lo: int, hi: int) -> int:
    """F.1.4.4.1.2: next block's DC context group from this diff's
    final category m against the L/U conditioning bounds."""
    if m < (1 << lo) >> 1:
        return 0
    if m > (1 << hi) >> 1:
        return 12 + 4 * sign
    return 4 + 4 * sign


def _encode_dc(enc, st, ctx, diff, lo, hi):
    base = ctx
    if diff == 0:
        enc.encode(st, base, 0)
        return 0
    enc.encode(st, base, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, base + 1, sign)
    v = (-diff if sign else diff) - 1
    _encode_magnitude(enc, st, base + 2 + sign, 20, v, double_at_sp=False)
    m = 0 if v == 0 else 1 << (v.bit_length() - 1)
    return _classify_dc(m, sign, lo, hi)


def _decode_dc(dec, st, ctx, lo, hi):
    """→ (diff, next context group)."""
    base = ctx
    if dec.decode(st, base) == 0:
        return 0, 0
    sign = dec.decode(st, base + 1)
    v = _decode_magnitude(dec, st, base + 2 + sign, 20, double_at_sp=False)
    m = 0 if v == 0 else 1 << (v.bit_length() - 1)
    diff = v + 1
    return (-diff if sign else diff), _classify_dc(m, sign, lo, hi)


def _encode_ac(enc, st, coefs, kx):
    """coefs: (64,) zigzag block (index 0 ignored) → AC decisions."""
    ke = 63
    while ke and coefs[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        b3 = 3 * (k - 1)
        enc.encode(st, b3, 0)  # not EOB
        while coefs[k] == 0:
            enc.encode(st, b3 + 1, 0)
            k += 1
            b3 += 3
        enc.encode(st, b3 + 1, 1)
        val = int(coefs[k])
        sign = 1 if val < 0 else 0
        enc.encode_fixed(sign)
        chain = 189 if k <= kx else 217
        _encode_magnitude(enc, st, b3 + 2, chain, abs(val) - 1, double_at_sp=True)
        k += 1
    if ke < 63:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _decode_ac(dec, st, out, kx):
    """Fill out[1:64] (zigzag) from the AC decision stream."""
    k = 1
    while k <= 63:
        b3 = 3 * (k - 1)
        if dec.decode(st, b3):  # EOB
            return
        while dec.decode(st, b3 + 1) == 0:
            k += 1
            if k > 63:
                raise ValueError("arithmetic JPEG AC run overflows block")
            b3 += 3
        sign = dec.decode_fixed()
        chain = 189 if k <= kx else 217
        v = _decode_magnitude(dec, st, b3 + 2, chain, double_at_sp=True) + 1
        out[k] = -v if sign else v
        k += 1


# ---------------------------------------------------------------------------
# scan layer (decode side — called from jpeg.decode_jpeg)
# ---------------------------------------------------------------------------


def _skip_to_marker(data: bytes, pos: int) -> int:
    """Advance past any unread entropy bytes to the next real marker
    (entropy data contains 0xFF only as the stuffed 0xFF 0x00 pair)."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            return pos
        pos += 1
    raise ValueError("arithmetic JPEG entropy segment ends without a marker")


def decode_arith_scan(
    data: bytes,
    pos: int,
    body: bytes,
    comp_info: list,
    comp_ids: list,
    conditioning: dict,
    restart_interval: int,
    mcux: int,
    mcuy: int,
) -> list:
    """One interleaved SOF9 scan → per-component (nblocks, 64) zigzag
    coefficient arrays in MCU SCAN order (caller applies _mcu_perm and
    the shared raster assembly). Restart markers re-initialize the
    coder, every statistics area, the DC predictors and contexts
    (F.2.1.3.1)."""
    ncomp = body[0]
    if ncomp != len(comp_info):
        raise NotImplementedError(
            "arithmetic JPEG with non-interleaved multi-scan layout not supported"
        )
    comp_tbls = []
    for c in range(ncomp):
        cid, tbl_byte = body[1 + 2 * c], body[2 + 2 * c]
        if cid not in comp_ids:
            raise ValueError(f"arithmetic scan names unknown component id {cid}")
        comp_tbls.append((tbl_byte >> 4, tbl_byte & 0x0F))
    dc_ids = sorted({t for t, _ in comp_tbls})
    ac_ids = sorted({t for _, t in comp_tbls})
    dc_stats = {t: _Stats(_DC_STATS_SIZE) for t in dc_ids}
    ac_stats = {t: _Stats(_AC_STATS_SIZE) for t in ac_ids}
    dc_cond = {t: conditioning.get((0, t), (0, 1)) for t in dc_ids}
    ac_cond = {t: conditioning.get((1, t), 5) for t in ac_ids}

    nmcu = mcux * mcuy
    outs = [
        np.zeros((nmcu * hc * vc, 64), dtype=np.int64) for hc, vc, _ in comp_info
    ]
    preds = [0] * ncomp
    dc_ctx = [0] * ncomp
    dec = _QMDecoder(data, pos)
    n = 0
    seg_i = 0
    while n < nmcu:
        limit = min(nmcu, n + restart_interval) if restart_interval else nmcu
        while n < limit:
            for c in range(ncomp):
                hc, vc, _ = comp_info[c]
                dt, at = comp_tbls[c]
                lo, hi = dc_cond[dt]
                sd, sa = dc_stats[dt], ac_stats[at]
                out = outs[c]
                base = n * hc * vc
                for r in range(hc * vc):
                    diff, dc_ctx[c] = _decode_dc(dec, sd, dc_ctx[c], lo, hi)
                    preds[c] += diff
                    row = out[base + r]
                    row[0] = preds[c]
                    _decode_ac(dec, sa, row, ac_cond[at])
            n += 1
        if n < nmcu:
            mpos = _skip_to_marker(data, dec.pos)
            want = 0xD0 + (seg_i % 8)
            if data[mpos + 1] != want:
                raise ValueError(
                    f"expected RST{seg_i % 8} marker at offset {mpos}"
                )
            seg_i += 1
            dec = _QMDecoder(data, mpos + 2)
            for s in dc_stats.values():
                s.reset()
            for s in ac_stats.values():
                s.reset()
            preds = [0] * ncomp
            dc_ctx = [0] * ncomp
    return outs


def _dc_units(comps, comp_info, st, restart_interval):
    """Progressive DC scan unit list [(comp idx, raster row, dc tbl)]
    plus units-per-restart — the same enumeration the Huffman
    progressive path uses (interleaved MCU order for multi-component
    scans, the component's own grid otherwise)."""
    from .jpeg import _mcu_perm, _noninterleaved_grid

    mcux, mcuy = st["mcux"], st["mcuy"]
    if len(comps) > 1:
        perms = {
            idx: _mcu_perm(mcuy, mcux, comp_info[idx][1], comp_info[idx][0])
            for idx, _d, _a in comps
        }
        units = []
        for m in range(mcux * mcuy):
            for idx, dc_t, _ in comps:
                bpm = comp_info[idx][0] * comp_info[idx][1]
                for r in range(bpm):
                    units.append((idx, int(perms[idx][m * bpm + r]), dc_t))
        per_ri = restart_interval * sum(
            comp_info[idx][0] * comp_info[idx][1] for idx, _d, _a in comps
        )
    else:
        idx, dc_t, _ = comps[0]
        hc_, vc_, _ = comp_info[idx]
        bh_n, bw_n, stride = _noninterleaved_grid(
            hc_, vc_, st["h"], st["w"], st["hmax"], st["vmax"], st["mcux"]
        )
        units = [
            (idx, r * stride + c, dc_t) for r in range(bh_n) for c in range(bw_n)
        ]
        per_ri = restart_interval
    return units, per_ri


def _expect_arith_rst(data: bytes, pos: int, seg_i: int) -> int:
    """Skip to the next marker, require RST(seg_i%8), return the offset
    just past it (F.2.1.3.1: fresh coder + statistics follow)."""
    mpos = _skip_to_marker(data, pos)
    want = 0xD0 + (seg_i % 8)
    if data[mpos + 1] != want:
        raise ValueError(f"expected RST{seg_i % 8} marker at offset {mpos}")
    return mpos + 2


def decode_arith_progressive_scan(
    data: bytes,
    pos: int,
    body: bytes,
    st: dict,
    comp_info: list,
    conditioning: dict,
    restart_interval: int,
) -> int:
    """Decode one progressive-ARITHMETIC (SOF10) scan into st['coefs']
    (the raster block layout shared with the Huffman progressive path)
    per T.81 G.2: DC first/refinement scans, band-limited AC first
    scans, figure-G.10 AC refinement. Statistics reset per scan and at
    every restart marker. Returns the offset of the marker that ends
    the scan's entropy data."""
    from .jpeg import _noninterleaved_grid, _scan_params

    comps, ss, se, ah, al = _scan_params(body, st["ids"])

    if ss == 0:  # ---- DC scan ------------------------------------------
        if se != 0:
            raise ValueError("JPEG DC scan with Se != 0")
        units, per_ri = _dc_units(comps, comp_info, st, restart_interval)
        dc_ids = sorted({dc_t for _i, dc_t, _a in comps})
        stats = {t: _Stats(_DC_STATS_SIZE) for t in dc_ids}
        preds: dict[int, int] = {}
        ctx: dict[int, int] = {}
        dec = _QMDecoder(data, pos)
        i = 0
        seg_i = 0
        while i < len(units):
            limit = min(len(units), i + per_ri) if restart_interval else len(units)
            while i < limit:
                idx, row, dc_t = units[i]
                coef = st["coefs"][idx]
                if ah == 0:  # first DC scan: QM-coded diff of (DC >> Al)
                    lo, hi = conditioning.get((0, dc_t), (0, 1))
                    diff, ctx[idx] = _decode_dc(
                        dec, stats[dc_t], ctx.get(idx, 0), lo, hi
                    )
                    preds[idx] = preds.get(idx, 0) + diff
                    coef[row, 0] = preds[idx] << al
                else:  # refinement: one fixed-estimate bit at bit Al
                    if dec.decode_fixed():
                        coef[row, 0] |= 1 << al
                i += 1
            if i < len(units):
                dec = _QMDecoder(data, _expect_arith_rst(data, dec.pos, seg_i))
                seg_i += 1
                for s in stats.values():
                    s.reset()
                preds = {}
                ctx = {}
        return _skip_to_marker(data, dec.pos)

    # ---- AC scan (single component, T.81 G.2.3/G.2.4) -------------------
    if len(comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not 1 <= ss <= se <= 63:
        raise ValueError(f"bad spectral band {ss}..{se}")
    idx, _dc_t, ac_t = comps[0]
    kx = conditioning.get((1, ac_t), 5)
    hc_, vc_, _ = comp_info[idx]
    bh_n, bw_n, stride = _noninterleaved_grid(
        hc_, vc_, st["h"], st["w"], st["hmax"], st["vmax"], st["mcux"]
    )
    rows = [r * stride + c for r in range(bh_n) for c in range(bw_n)]
    coef = st["coefs"][idx]
    stats = _Stats(_AC_STATS_SIZE)
    dec = _QMDecoder(data, pos)
    p1, m1 = 1 << al, -1 << al
    i = 0
    seg_i = 0
    while i < len(rows):
        limit = min(len(rows), i + restart_interval) if restart_interval else len(rows)
        while i < limit:
            row = rows[i]
            if ah == 0:  # first scan for this band (G.2.3): sequential
                # AC model band-limited, decoded value scaled by 2^Al
                k = ss
                while k <= se:
                    b3 = 3 * (k - 1)
                    if dec.decode(stats, b3):
                        break  # EOB
                    while dec.decode(stats, b3 + 1) == 0:
                        k += 1
                        if k > se:
                            raise ValueError(
                                "arithmetic JPEG AC run overflows band"
                            )
                        b3 += 3
                    sign = dec.decode_fixed()
                    chain = 189 if k <= kx else 217
                    v = _decode_magnitude(
                        dec, stats, b3 + 2, chain, double_at_sp=True
                    ) + 1
                    coef[row, k] = (-v << al) if sign else (v << al)
                    k += 1
            else:  # refinement scan (figure G.10)
                kex = se  # band end of the PREVIOUS scan (nonzero state)
                while kex >= ss and coef[row, kex] == 0:
                    kex -= 1
                k = ss
                while k <= se:
                    b3 = 3 * (k - 1)
                    if k > kex and dec.decode(stats, b3):
                        break  # EOB
                    while True:
                        cur = int(coef[row, k])
                        if cur != 0:  # previously nonzero: correction bit
                            if dec.decode(stats, b3 + 2):
                                coef[row, k] = cur + (p1 if cur > 0 else m1)
                            break
                        if dec.decode(stats, b3 + 1):  # newly nonzero
                            coef[row, k] = m1 if dec.decode_fixed() else p1
                            break
                        b3 += 3
                        k += 1
                        if k > se:
                            raise ValueError(
                                "arithmetic JPEG AC refinement overflows band"
                            )
                    k += 1
            i += 1
        if i < len(rows):
            dec = _QMDecoder(data, _expect_arith_rst(data, dec.pos, seg_i))
            seg_i += 1
            stats.reset()
    return _skip_to_marker(data, dec.pos)


# ---------------------------------------------------------------------------
# encoder (fixture writer — the contract twin of encode_jpeg)
# ---------------------------------------------------------------------------


def _encode_entropy(comps, nmcu, conditioning, restart_interval):
    """comps: [(zz_in_scan_order, blocks_per_mcu, dc_tbl, ac_tbl)] →
    stuffed entropy bytes with RSTn markers."""
    dc_ids = sorted({c[2] for c in comps})
    ac_ids = sorted({c[3] for c in comps})

    def fresh():
        return (
            {t: _Stats(_DC_STATS_SIZE) for t in dc_ids},
            {t: _Stats(_AC_STATS_SIZE) for t in ac_ids},
            [0] * len(comps),
            [0] * len(comps),
            _QMEncoder(),
        )

    dc_stats, ac_stats, preds, dc_ctx, enc = fresh()
    out = bytearray()
    seg_i = 0
    for n in range(nmcu):
        if restart_interval and n and n % restart_interval == 0:
            out += enc.flush()
            out += bytes([0xFF, 0xD0 + (seg_i % 8)])
            seg_i += 1
            dc_stats, ac_stats, preds, dc_ctx, enc = fresh()
        for c, (zz, bpm, dt, at) in enumerate(comps):
            lo, hi = conditioning.get((0, dt), (0, 1))
            kx = conditioning.get((1, at), 5)
            sd, sa = dc_stats[dt], ac_stats[at]
            base = n * bpm
            for r in range(bpm):
                row = zz[base + r]
                dc = int(row[0])
                dc_ctx[c] = _encode_dc(enc, sd, dc_ctx[c], dc - preds[c], lo, hi)
                preds[c] = dc
                _encode_ac(enc, sa, row, kx)
    out += enc.flush()
    return bytes(out)


def encode_jpeg_arith(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H,W) uint8 grey or (H,W,3) uint8 RGB → arithmetic-coded
    sequential JPEG (SOF9). Same DCT/quantization pipeline as
    encode_jpeg — identical quantized coefficients, so decode equals
    the baseline stream's decode EXACTLY; only the entropy layer
    differs (QM-coded, typically ~5-10% smaller than Huffman). Writes
    an explicit DAC segment with the default conditioning."""
    from .jpeg import (
        JPEG_SOI,
        _box_downsample,
        _mcu_perm,
        _plane_zz,
        _rgb_to_ycbcr,
        _scaled_qtable,
        _seg,
        _SUBSAMPLING_FACTORS,
        _QTABLE_K2,
        _ZIGZAG,
    )

    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError(
            f"encode_jpeg_arith expects uint8 (H,W) or (H,W,3), got "
            f"{img.dtype} {img.shape}"
        )
    seg = _seg
    out = bytearray(JPEG_SOI)
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if img.ndim == 2:
        if subsampling != "444":
            raise ValueError("subsampling applies to color images only")
        h, w = img.shape
        if h == 0 or w == 0:
            raise ValueError("empty image")
        q = _scaled_qtable(quality)
        zz = _plane_zz(img, q)
        entropy = _encode_entropy([(zz, 1, 0, 0)], len(zz), {}, restart_interval)
        out += seg(0xFFDB, b"\x00" + bytes(q.reshape(-1)[_ZIGZAG].astype(np.uint8)))
        out += seg(0xFFC9, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
        out += seg(0xFFCC, bytes([0x00, 0x10, 0x10, 5]))  # DC0 L=0 U=1; AC0 Kx=5
        if restart_interval > 0:
            out += seg(0xFFDD, struct.pack(">H", restart_interval))
        out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
        out += entropy
        out += b"\xff\xd9"
        return bytes(out)

    if img.shape[2] != 3:
        raise ValueError(f"encode_jpeg_arith expects 3 channels, got {img.shape}")
    if subsampling not in _SUBSAMPLING_FACTORS:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMPLING_FACTORS)}")
    hY, vY = _SUBSAMPLING_FACTORS[subsampling]
    h, w = img.shape[0], img.shape[1]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ycc = _rgb_to_ycbcr(img)
    q_lum = _scaled_qtable(quality)
    q_chr = _scaled_qtable(quality, _QTABLE_K2)
    mcux, mcuy = -(-w // (8 * hY)), -(-h // (8 * vY))
    zz_y = _plane_zz(ycc[..., 0], q_lum, grid=(mcuy * vY, mcux * hY))
    zz_y = zz_y[_mcu_perm(mcuy, mcux, vY, hY)]
    comps = [(zz_y, hY * vY, 0, 0)]
    for comp in (1, 2):
        sub = _box_downsample(ycc[..., comp], hY, vY)
        comps.append((_plane_zz(sub, q_chr, grid=(mcuy, mcux)), 1, 1, 1))
    entropy = _encode_entropy(comps, mcux * mcuy, {}, restart_interval)
    out += seg(0xFFDB, b"\x00" + bytes(q_lum.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    out += seg(0xFFDB, b"\x01" + bytes(q_chr.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    out += seg(
        0xFFC9,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([0x01, (hY << 4) | vY, 0x00])
        + b"\x02\x11\x01"
        + b"\x03\x11\x01",
    )
    # DAC: DC/AC conditioning for both table ids (defaults, explicit)
    out += seg(0xFFCC, bytes([0x00, 0x10, 0x01, 0x10, 0x10, 5, 0x11, 5]))
    if restart_interval > 0:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (fixture writer — twin of decode_arith_progressive_scan)
# ---------------------------------------------------------------------------


def _emit_arith_ac_first(enc, st, coefv, ss, se, al, kx):
    """One block's band Ss..Se in an AC FIRST scan (G.2.3): the
    sequential AC decision tree on the point-transformed magnitudes."""
    ke = se
    while ke >= ss and (abs(int(coefv[ke])) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        b3 = 3 * (k - 1)
        enc.encode(st, b3, 0)  # not EOB
        while (abs(int(coefv[k])) >> al) == 0:
            enc.encode(st, b3 + 1, 0)
            k += 1
            b3 += 3
        enc.encode(st, b3 + 1, 1)
        val = int(coefv[k])
        enc.encode_fixed(1 if val < 0 else 0)
        chain = 189 if k <= kx else 217
        _encode_magnitude(
            enc, st, b3 + 2, chain, (abs(val) >> al) - 1, double_at_sp=True
        )
        k += 1
    if ke < se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _emit_arith_ac_refine(enc, st, coefv, ss, se, al):
    """One block's band in an AC REFINEMENT scan (figure G.10): EOB
    decisions beyond the previous scan's band end (kex), correction
    bits for previously-nonzero coefficients, fixed-estimate signs for
    newly-nonzero ones."""
    ke = se  # band end at THIS precision
    while ke >= ss and (abs(int(coefv[ke])) >> al) == 0:
        ke -= 1
    kex = ke  # band end at the PREVIOUS precision
    while kex >= ss and (abs(int(coefv[kex])) >> (al + 1)) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        b3 = 3 * (k - 1)
        if k > kex:
            enc.encode(st, b3, 0)  # not EOB yet
        while True:
            val = int(coefv[k])
            mag = abs(val) >> al
            if mag:
                if mag >> 1:  # previously nonzero: correction bit
                    enc.encode(st, b3 + 2, mag & 1)
                else:  # newly nonzero at this precision
                    enc.encode(st, b3 + 1, 1)
                    enc.encode_fixed(1 if val < 0 else 0)
                break
            enc.encode(st, b3 + 1, 0)
            b3 += 3
            k += 1
        k += 1
    if ke < se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _emit_arith_progressive_scan(
    zz, samp, comps, ss, se, ah, al, mcux, mcuy, h, w, restart_interval
):
    """One SOF10 scan's entropy bytes (RSTn-separated segments when
    restart_interval > 0). Mirrors decode_arith_progressive_scan; DC
    table id is 0 for luma / 1 for chroma (the DAC layout the frame
    writer emits), default conditioning (L=0, U=1, Kx=5)."""
    from .jpeg import _mcu_perm, _noninterleaved_grid

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    segments: list[bytes] = []
    if ss == 0:  # DC scan
        if len(comps) > 1:
            perms = {
                i: _mcu_perm(mcuy, mcux, samp[i][1], samp[i][0]) for i in comps
            }
            units = []
            for m in range(mcux * mcuy):
                for i in comps:
                    bpm = samp[i][0] * samp[i][1]
                    for r in range(bpm):
                        units.append((i, int(perms[i][m * bpm + r])))
            per_ri = restart_interval * sum(
                samp[i][0] * samp[i][1] for i in comps
            )
        else:
            i = comps[0]
            hc, vc = samp[i]
            bh_n, bw_n, stride = _noninterleaved_grid(hc, vc, h, w, hmax, vmax, mcux)
            units = [(i, r * stride + c) for r in range(bh_n) for c in range(bw_n)]
            per_ri = restart_interval
        chunk = per_ri if restart_interval else len(units)
        for start in range(0, len(units), max(chunk, 1)):
            enc = _QMEncoder()
            stats = {t: _Stats(_DC_STATS_SIZE) for t in {0, 1} if t <= max(comps)}
            preds: dict[int, int] = {}
            ctx: dict[int, int] = {}
            for i, row in units[start : start + chunk]:
                v = int(zz[i][row, 0]) >> al  # arithmetic shift (G.1.2.1)
                if ah == 0:
                    tbl = 0 if i == 0 else 1
                    diff = v - preds.get(i, 0)
                    preds[i] = v
                    ctx[i] = _encode_dc(
                        enc, stats[tbl], ctx.get(i, 0), diff, 0, 1
                    )
                else:
                    enc.encode_fixed(v & 1)
            segments.append(enc.flush())
    else:  # AC scan: single component
        i = comps[0]
        hc, vc = samp[i]
        bh_n, bw_n, stride = _noninterleaved_grid(hc, vc, h, w, hmax, vmax, mcux)
        rows = [r * stride + c for r in range(bh_n) for c in range(bw_n)]
        chunk = restart_interval if restart_interval else len(rows)
        for start in range(0, len(rows), max(chunk, 1)):
            enc = _QMEncoder()
            stats = _Stats(_AC_STATS_SIZE)
            for row in rows[start : start + chunk]:
                if ah == 0:
                    _emit_arith_ac_first(enc, stats, zz[i][row], ss, se, al, 5)
                else:
                    _emit_arith_ac_refine(enc, stats, zz[i][row], ss, se, al)
            segments.append(enc.flush())
    out = bytearray()
    for k, s in enumerate(segments):
        if k:
            out += bytes([0xFF, 0xD0 + ((k - 1) % 8)])
        out += s
    return bytes(out)


def encode_jpeg_arith_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H,W) grey / (H,W,3) RGB → PROGRESSIVE arithmetic-coded JPEG
    (SOF10) — the fourth corner of the entropy matrix. Same scan
    script, quantized coefficients and grids as encode_jpeg_progressive
    (DC first at Al=1 + refinement, banded AC first scans at Al=2/1 +
    refinement scans to Al=0), same QM conditioning layout as
    encode_jpeg_arith, so decode(SOF10) == decode(baseline) EXACTLY."""
    from .jpeg import (
        JPEG_SOI,
        _box_downsample,
        _plane_zz,
        _rgb_to_ycbcr,
        _scaled_qtable,
        _seg,
        _SUBSAMPLING_FACTORS,
        _QTABLE_K2,
        _ZIGZAG,
    )

    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError(
            f"encode_jpeg_arith_progressive expects uint8 (H,W) or (H,W,3), "
            f"got {img.dtype} {img.shape}"
        )
    grey = img.ndim == 2
    h, w = img.shape[0], img.shape[1]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    q_lum = _scaled_qtable(quality)
    if grey:
        if subsampling != "444":
            raise ValueError("subsampling applies to color images only")
        mcux, mcuy = -(-w // 8), -(-h // 8)
        zz = [_plane_zz(img, q_lum, grid=(mcuy, mcux))]  # raster order
        samp = [(1, 1)]
    else:
        if img.shape[2] != 3:
            raise ValueError(
                f"encode_jpeg_arith_progressive expects 3 channels, got {img.shape}"
            )
        if subsampling not in _SUBSAMPLING_FACTORS:
            raise ValueError(
                f"subsampling must be one of {sorted(_SUBSAMPLING_FACTORS)}"
            )
        hY, vY = _SUBSAMPLING_FACTORS[subsampling]
        q_chr = _scaled_qtable(quality, _QTABLE_K2)
        ycc = _rgb_to_ycbcr(img)
        mcux, mcuy = -(-w // (8 * hY)), -(-h // (8 * vY))
        zz = [_plane_zz(ycc[..., 0], q_lum, grid=(mcuy * vY, mcux * hY))]
        for comp in (1, 2):
            sub = _box_downsample(ycc[..., comp], hY, vY)
            zz.append(_plane_zz(sub, q_chr, grid=(mcuy, mcux)))
        samp = [(hY, vY), (1, 1), (1, 1)]

    if grey:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([1], 1, 63, 0, 1),
            ([2], 1, 63, 0, 1),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([2], 1, 63, 1, 0),
        ]

    seg = _seg
    out = bytearray(JPEG_SOI)
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(q_lum.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    if not grey:
        out += seg(
            0xFFDB, b"\x01" + bytes(q_chr.reshape(-1)[_ZIGZAG].astype(np.uint8))
        )
    sof = struct.pack(">BHHB", 8, h, w, 1 if grey else 3)
    for c, (hc, vc) in enumerate(samp):
        sof += bytes([c + 1, (hc << 4) | vc, 0 if c == 0 else 1])
    out += seg(0xFFCA, sof)  # SOF10: progressive DCT, arithmetic coding
    if grey:
        out += seg(0xFFCC, bytes([0x00, 0x10, 0x10, 5]))
    else:
        out += seg(0xFFCC, bytes([0x00, 0x10, 0x01, 0x10, 0x10, 5, 0x11, 5]))
    if restart_interval > 0:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))

    for comps, ss, se, ah, al in script:
        hdr = bytes([len(comps)])
        for idx in comps:
            tblc = 0 if idx == 0 else 1
            hdr += bytes([idx + 1, (tblc << 4) | tblc])
        hdr += bytes([ss, se, (ah << 4) | al])
        out += seg(0xFFDA, hdr)
        out += _emit_arith_progressive_scan(
            zz, samp, comps, ss, se, ah, al, mcux, mcuy, h, w, restart_interval
        )
    out += b"\xff\xd9"
    return bytes(out)
