"""Third-opinion audit, batch 22 (r17): JPEG — an independent T.81
entropy decoder (baseline sequential, progressive, lossless) with no
product helpers.

The product both writes and reads these streams, so matched spec
misreadings (canonical-Huffman assembly, EXTEND sign rule, EOB-run
counting, AC-refinement correction bits, restart resets, predictor
edge rules) would cancel in the oracle gate. This decoder is typed
independently from the spec: own byte-unstuffing bit reader, own
canonical Huffman table builder (code lengths -> codes), DC
prediction with restart resets, ZRL/EOB run-length AC, progressive
spectral selection + successive approximation for DC and AC
(EOB runs spanning blocks, positionally-consumed correction bits),
and the SOF3 lossless DPCM with all seven predictors and the T.81
H.1 edge rules.

The jpeg/jpeg420/jpeg_prog entries pin DEQUANTIZED COEFFICIENT
statistics (the IDCT is not part of the oracle surface), so the
independent decode stops at the coefficient store — compared both
against the documented closed-form synthesis (restated here) and
against the entries' Spark rows. The lossless entry is exact, so its
pixels are compared to the image closed form.

Entries audited here: multimodal_decode_jpeg,
multimodal_decode_jpeg420, multimodal_decode_jpeg_prog,
multimodal_decode_jpeg_lossless.
"""

from __future__ import annotations

import pytest

from duckdb_redis_olap_scanner_spark.operators import jpeg as J
from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR

DOC_IDS = list(range(0, 36)) + [97, 101, 211, 509]


# ---------------------------------------------------------------------------
# independent zigzag + closed forms (restated, not imported)
# ---------------------------------------------------------------------------

def _zigzag() -> list[int]:
    """zigzag index k -> natural row*8+col index, by diagonal walk."""
    out = []
    for s in range(15):
        rng = range(s + 1)
        for i in (rng if s % 2 else reversed(rng)):
            r, c = i, s - i
            if r < 8 and c < 8:
                out.append(r * 8 + c)
    return out


ZIG = _zigzag()


def ref_quant(c: int) -> list[int]:
    if c == 0:
        return [1 + (5 * z) % 16 for z in range(64)]
    return [2 + (3 * z) % 24 for z in range(64)]


def ref_coefs(d: int, b: int, c: int) -> dict[int, int]:
    out = {0: ((d * 5 + b * 11 + c * 23) % 61) - 30}
    z1 = 1 + ((d + b + c) % 9)
    v1 = ((d + 7 * b + 13 * c) % 19) - 9
    if v1:
        out[z1] = v1
    z2 = 20 + ((d * 3 + b * 7 + c * 5) % 40)
    v2 = ((d * 7 + 3 * b + 5 * c) % 13) - 6
    if v2:
        out[z2] = v2
    return out


def ref_image(d: int) -> tuple[int, int, list[int]]:
    w, h = 4 + d % 13, 2 + d % 7
    return w, h, [(d * 7 + k) % 256 for k in range(w * h * 3)]


# ---------------------------------------------------------------------------
# independent entropy-coded-segment bit reader (byte unstuffing,
# restart markers surfaced to the caller)
# ---------------------------------------------------------------------------

class ScanBits:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                else:
                    raise AssertionError(
                        f"marker 0xFF{nxt:02X} inside entropy data"
                    )
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        self.n -= nbits
        v = (self.acc >> self.n) & ((1 << nbits) - 1)
        return v

    def at_restart(self) -> int | None:
        """If the next (byte-aligned) bytes are an RSTn marker, return
        n and consume it."""
        self.acc, self.n = 0, 0  # byte-align, discard pad bits
        if (self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            n = self.data[self.pos + 1] - 0xD0
            self.pos += 2
            return n
        return None


class Huff:
    def __init__(self, counts: list[int], symbols: bytes) -> None:
        # canonical assembly: codes of length L are consecutive,
        # starting from (prev_start + prev_count) << 1
        self.map: dict[tuple[int, int], int] = {}
        code, si = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.map[(length, code)] = symbols[si]
                si += 1
                code += 1
            code <<= 1

    def decode(self, bits: ScanBits) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | bits.read(1)
            length += 1
            sym = self.map.get((length, code))
            if sym is not None:
                return sym
        raise AssertionError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# independent full decoder -> coefficient store (+ lossless pixels)
# ---------------------------------------------------------------------------

def ind_decode_jpeg(payload: bytes):
    assert payload[:2] == b"\xff\xd8"
    pos = 2
    qt: dict[int, list[int]] = {}
    huffs: dict[tuple[int, int], Huff] = {}
    sof = None
    mode = None
    dri = 0
    # coefficient store: comp id -> {block (by,bx) -> [64 zigzag]}
    coef: dict[int, dict[tuple[int, int], list[int]]] = {}
    eobrun = 0
    lossless_planes = None

    def sof_geometry():
        _p, h, w, comps = sof
        hmax = max(hi for _cid, hi, _vi, _tq in comps)
        vmax = max(vi for _cid, _hi, vi, _tq in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        return w, h, comps, hmax, vmax, mcux, mcuy

    while pos < len(payload):
        assert payload[pos] == 0xFF
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + seg_len]
        pos_after = pos + seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                assert pq == 0
                qt[tq] = list(seg[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                huffs[(tc, th)] = Huff(counts, seg[i + 17 : i + 17 + n])
                i += 17 + n
        elif marker in (0xC0, 0xC2, 0xC3):  # SOF0/SOF2/SOF3
            mode = {0xC0: "baseline", 0xC2: "progressive",
                    0xC3: "lossless"}[marker]
            p, h, w = seg[0], int.from_bytes(seg[1:3], "big"), \
                int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + 3 * i]))
            sof = (p, h, w, comps)
            for cid, *_rest in comps:
                coef[cid] = {}
        elif marker == 0xDD:  # DRI
            dri = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for i in range(ns):
                cid = seg[1 + 2 * i]
                tt = seg[2 + 2 * i]
                sel.append((cid, tt >> 4, tt & 0xF))
            Ss, Se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            Ah, Al = ahal >> 4, ahal & 0xF
            bits = ScanBits(payload, pos_after)
            if mode == "lossless":
                lossless_planes = _lossless_scan(
                    bits, sof, sel, Ss, huffs
                )
            else:
                eobrun = _dct_scan(
                    bits, sof_geometry(), sel, Ss, Se, Ah, Al,
                    huffs, coef, dri, mode,
                )
            pos_after = bits.pos
            pos = pos_after
            continue
        pos = pos_after

    if mode == "lossless":
        _p, h, w, comps = sof
        px = [
            lossless_planes[c][y][x]
            for y in range(h) for x in range(w)
            for c in range(len(comps))
        ]
        return mode, sof, None, px

    # stats in the product's documented MCU-major block order
    w, h, comps, hmax, vmax, mcux, mcuy = sof_geometry()
    sum_dc = sum_ac = checksum = 0
    blk = 0
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for cid, hi, vi, tq in comps:
            q = qt[tq]
            for v in range(vi):
                for hh in range(hi):
                    zz = coef[cid].get((my * vi + v, mx * hi + hh),
                                       [0] * 64)
                    dq = [zz[z] * q[z] for z in range(64)]
                    sum_dc += dq[0]
                    sum_ac += sum(dq[1:])
                    checksum += sum(
                        (blk * 64 + z + 1) * dq[z] for z in range(64)
                    )
                    blk += 1
    return mode, sof, (w, h, blk, sum_dc, sum_ac, checksum), None


def _dct_scan(bits, geom, sel, Ss, Se, Ah, Al, huffs, coef, dri, mode):
    w, h, comps, hmax, vmax, mcux, mcuy = geom
    byid = {cid: (hi, vi) for cid, hi, vi, _tq in comps}
    pred = {cid: 0 for cid, *_r in sel}
    eobrun = 0
    interleaved = len(sel) > 1

    if not interleaved:
        cid, td, ta = sel[0]
        hi, vi = byid[cid]
        bw = mcux * hi if (hi, vi) != (hmax, vmax) or True else 0
        # non-interleaved scan: the component's own block grid
        bw = -(-w * hi // (8 * hmax))
        bh = -(-h * vi // (8 * vmax))
        order = [(by, bx) for by in range(bh) for bx in range(bw)]
    else:
        order = None

    def get_block(cid, key):
        return coef[cid].setdefault(key, [0] * 64)

    def decode_dc_first(block, td, cid):
        s = huffs[(0, td)].decode(bits)
        diff = _extend(bits.read(s), s) if s else 0
        pred[cid] += diff
        block[0] = pred[cid] << Al

    def decode_dc_refine(block):
        if bits.read(1):
            block[0] |= 1 << Al

    def decode_ac_first(block, ta):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = Ss
        while k <= Se:
            rs = huffs[(1, ta)].decode(bits)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += bits.read(r)
                break
            k += r
            block[k] = _extend(bits.read(s), s) << Al
            k += 1

    def decode_ac_refine(block, ta):
        nonlocal eobrun
        p1, m1 = 1 << Al, -1 << Al
        k = Ss
        if eobrun == 0:
            while k <= Se:
                rs = huffs[(1, ta)].decode(bits)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r)
                        if r:
                            eobrun += bits.read(r)
                        break
                else:
                    assert s == 1
                    val = p1 if bits.read(1) else m1
                while k <= Se:
                    if block[k] != 0:
                        if bits.read(1) and (block[k] & p1) == 0:
                            block[k] += p1 if block[k] > 0 else m1
                    else:
                        if r == 0:
                            if val:
                                block[k] = val
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun > 0:
            while k <= Se:
                if block[k] != 0:
                    if bits.read(1) and (block[k] & p1) == 0:
                        block[k] += p1 if block[k] > 0 else m1
                k += 1
            eobrun -= 1

    def decode_baseline(block, td, ta, cid):
        decode_dc_first(block, td, cid)
        k = 1
        while k <= 63:
            rs = huffs[(1, ta)].decode(bits)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break
            k += r
            block[k] = _extend(bits.read(s), s)
            k += 1

    def do_block(cid, key, td, ta):
        block = get_block(cid, key)
        if mode == "baseline":
            decode_baseline(block, td, ta, cid)
        elif Ss == 0:  # progressive DC
            if Ah == 0:
                decode_dc_first(block, td, cid)
            else:
                decode_dc_refine(block)
        else:  # progressive AC
            if Ah == 0:
                decode_ac_first(block, ta)
            else:
                decode_ac_refine(block, ta)

    n_units = mcux * mcuy if interleaved else len(order)
    since_restart = 0
    expected_rst = 0
    for u in range(n_units):
        if dri and since_restart == dri:
            nonzero_eob = eobrun
            got = bits.at_restart()
            assert got == expected_rst, (got, expected_rst)
            expected_rst = (expected_rst + 1) % 8
            for c in pred:
                pred[c] = 0
            eobrun = 0
            since_restart = 0
            del nonzero_eob
        if interleaved:
            my, mx = divmod(u, mcux)
            for cid, td, ta in sel:
                hi, vi = byid[cid]
                for v in range(vi):
                    for hh in range(hi):
                        do_block(cid, (my * vi + v, mx * hi + hh),
                                 td, ta)
        else:
            cid, td, ta = sel[0]
            do_block(cid, order[u], td, ta)
        since_restart += 1
    return eobrun


def _lossless_scan(bits, sof, sel, predictor, huffs):
    _p, h, w, comps = sof
    planes = {c: [[0] * w for _ in range(h)]
              for c in range(len(comps))}
    td_of = {cid: td for cid, td, _ta in sel}
    ids = [cid for cid, *_r in comps]
    for y in range(h):
        for x in range(w):
            for c, cid in enumerate(ids):
                pl = planes[c]
                if y == 0 and x == 0:
                    pr = 128
                elif y == 0:
                    pr = pl[y][x - 1]
                elif x == 0:
                    pr = pl[y - 1][x]
                else:
                    ra, rb, rc = pl[y][x - 1], pl[y - 1][x], \
                        pl[y - 1][x - 1]
                    pr = {
                        1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                        5: ra + ((rb - rc) >> 1),
                        6: rb + ((ra - rc) >> 1),
                        7: (ra + rb) >> 1,
                    }[predictor]
                s = huffs[(0, td_of[cid])].decode(bits)
                d = _extend(bits.read(s), s) if s else 0
                pl[y][x] = pr + d
    return planes


# ---------------------------------------------------------------------------
# the audits
# ---------------------------------------------------------------------------

def _expected_stats(d: int, mode: str):
    """Stats from the documented closed-form synthesis, restated."""
    if mode == "444":
        w, h = 8 * (1 + d % 3), 8 * (1 + d % 2)
        n_mcu = (w // 8) * (h // 8)
        blocks = [(b * 3 + c, b, c)
                  for b in range(n_mcu) for c in range(3)]
    else:  # 420
        w, h = 16 * (1 + d % 2), 16 * (1 + d % 3)
        n_mcu = (w // 16) * (h // 16)
        blocks = []
        i = 0
        for _m in range(n_mcu):
            for c in (0, 0, 0, 0, 1, 2):
                blocks.append((i, i, c))
                i += 1
    sum_dc = sum_ac = checksum = 0
    for blk, b, c in blocks:
        q = ref_quant(c)
        for z, v in ref_coefs(d, b, c).items():
            dq = v * q[z]
            if z == 0:
                sum_dc += dq
            else:
                sum_ac += dq
            checksum += (blk * 64 + z + 1) * dq
    return w, h, len(blocks), sum_dc, sum_ac, checksum


@pytest.mark.parametrize("d", DOC_IDS)
@pytest.mark.parametrize("variant", ["444", "420", "prog"])
def test_jpeg_independent_decoder_matches_closed_form(d, variant):
    payload = J.encode_jpeg_payload(d, variant if variant != "444"
                                    else "444")
    mode, _sof, stats, _px = ind_decode_jpeg(payload)
    assert mode == ("progressive" if variant == "prog" else "baseline")
    want = _expected_stats(d, "444" if variant == "prog" else variant)
    assert stats == want, (variant, d)


@pytest.mark.parametrize("d", DOC_IDS)
def test_jpeg_lossless_independent_decoder(d):
    w, h, v = ref_image(d)
    payload = J.encode_jpeg_lossless_payload(d)
    mode, sof, _stats, px = ind_decode_jpeg(payload)
    assert mode == "lossless"
    assert px == v


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401

    return catalog.registry()


@pytest.mark.parametrize(
    "name,variant",
    [("multimodal_decode_jpeg", "444"),
     ("multimodal_decode_jpeg420", "420"),
     ("multimodal_decode_jpeg_prog", "prog")],
)
def test_entry_jpeg_rows_match_independent_decode(reg, spark, name,
                                                  variant):
    rows = {
        int(r[0]): tuple(r)
        for r in reg[name].fn(spark, SF_DIR).collect()
    }
    assert len(rows) > 0
    for did, row in sorted(rows.items())[:16]:
        payload = J.encode_jpeg_payload(did, variant)
        _mode, _sof, stats, _px = ind_decode_jpeg(payload)
        assert row == (did, *stats), f"{name} doc {did}"


def test_entry_jpeg_lossless_rows_match_independent_decode(reg, spark):
    rows = {
        int(r[0]): tuple(r)
        for r in reg["multimodal_decode_jpeg_lossless"]
        .fn(spark, SF_DIR).collect()
    }
    assert len(rows) > 0
    for did, row in sorted(rows.items())[:16]:
        _m, _sof, _st, px = ind_decode_jpeg(
            J.encode_jpeg_lossless_payload(did)
        )
        w, h = 4 + did % 13, 2 + did % 7
        assert row == (
            did, w, h, 1 + did % 7,
            sum(px[0::3]), sum(px[1::3]), sum(px[2::3]),
            sum((i + 1) * x for i, x in enumerate(px)),
        ), f"lossless doc {did}"


@pytest.mark.parametrize("variant", ["444", "prog"])
@pytest.mark.parametrize("d", [0, 7])
def test_audit_has_teeth_corruption_is_detected(d, variant):
    """Corrupting entropy-coded data must change the independent
    coefficient store or make the decode raise."""
    p = bytearray(J.encode_jpeg_payload(d, variant))
    sos = bytes(p).index(b"\xff\xda")
    ns = p[sos + 4]
    scan_start = sos + 2 + 2 + 1 + 2 * ns + 3
    p[scan_start + 1] ^= 0x55
    want = _expected_stats(d, "444" if variant == "prog" else variant)
    try:
        _m, _sof, stats, _px = ind_decode_jpeg(bytes(p))
        detected = stats != want
    except (AssertionError, IndexError, KeyError):
        detected = True
    assert detected
