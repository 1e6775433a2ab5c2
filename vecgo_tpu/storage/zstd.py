"""ZSTD block compression for segment sections.

Reference analogue: the reference ships LZ4 *and* ZSTD block compression of
DiskANN sections (/root/reference/internal/segment/diskann/compression.go:15-65).
This image ships no Python `zstandard` module, but libzstd.so is a base-system
library on effectively every Linux — the codec binds it with ctypes (one-shot
ZSTD_compress / ZSTD_decompress). Mirroring storage/lz4.py's contract:

- If libzstd is unavailable at WRITE time, pack_container degrades "zstd" to
  deflate (data stays readable everywhere).
- READS never require the native library: `_decompress_py` is a complete
  pure-Python RFC 8878 zstd frame decoder (FSE + Huffman + sequences), so any
  zstd-compressed segment stays readable on a machine with no libzstd at all.
  ~100x slower than native — a durability guarantee, not a fast path.

API: compress(bytes, level=3) -> bytes, decompress(bytes, raw_n) -> bytes,
available() -> bool. Malformed input raises ValueError, never crashes
(fuzz bar: reference engine/fuzz_test.go).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import logging
import threading
from typing import List, Optional, Tuple

logger = logging.getLogger("vecgo_tpu")

_lock = threading.Lock()
_lib = None
_tried = False

_MAGIC = 0xFD2FB528
_MAX_BLOCK = 1 << 17  # zstd block size cap (128 KiB)


def _load() -> Optional[ctypes.CDLL]:
    for name in ("libzstd.so.1", "libzstd.so", ctypes.util.find_library("zstd")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
            lib.ZSTD_compressBound.restype = ctypes.c_size_t
            lib.ZSTD_compress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ]
            lib.ZSTD_compress.restype = ctypes.c_size_t
            lib.ZSTD_decompress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t,
            ]
            lib.ZSTD_decompress.restype = ctypes.c_size_t
            lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
            lib.ZSTD_isError.restype = ctypes.c_uint
            return lib
        except OSError:
            continue
    logger.warning("libzstd not found; zstd writes fall back, reads use python")
    return None


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        with _lock:
            if _lib is None and not _tried:
                _lib = _load()
                _tried = True
    return _lib


def available() -> bool:
    return _get() is not None


def compress(data: bytes, level: int = 3) -> bytes:
    """One-shot zstd frame compress. Raises RuntimeError if libzstd is
    unavailable (pack_container then falls back to deflate)."""
    lib = _get()
    if lib is None:
        raise RuntimeError("native zstd codec unavailable")
    n = len(data)
    cap = lib.ZSTD_compressBound(n)
    out = ctypes.create_string_buffer(cap)
    wrote = lib.ZSTD_compress(out, cap, data, n, level)
    if lib.ZSTD_isError(wrote):
        raise RuntimeError("zstd compression failed")
    return out.raw[:wrote]


def decompress(data: bytes, raw_n: int) -> bytes:
    """Decompress a zstd frame of known raw size. Raises ValueError on any
    malformed input."""
    if raw_n < 0 or raw_n > (1 << 33):
        raise ValueError("zstd: bad raw size")
    lib = _get()
    if lib is not None:
        out = ctypes.create_string_buffer(max(raw_n, 1))
        wrote = lib.ZSTD_decompress(out, raw_n, data, len(data))
        if lib.ZSTD_isError(wrote) or wrote != raw_n:
            raise ValueError("zstd: malformed frame")
        return out.raw[:raw_n]
    return _decompress_py(data, raw_n)


# =========================================================================
# Pure-Python RFC 8878 frame decoder (fallback reader).
# =========================================================================


class _RBits:
    """Backward bitstream: zstd entropy payloads are read from the LAST byte,
    top padding bit first. `read` is strict; `read_zf` zero-fills past the end
    (FSE state flush semantics) and lets `n` go negative to signal overrun."""

    __slots__ = ("v", "n")

    def __init__(self, buf):
        if len(buf) == 0:
            raise ValueError("zstd: empty bitstream")
        self.v = int.from_bytes(buf, "little")
        bl = self.v.bit_length()
        if bl == 0:
            raise ValueError("zstd: missing bitstream start marker")
        self.n = bl - 1  # drop the 1-marker padding bit

    def read(self, k: int) -> int:
        if k > self.n:
            raise ValueError("zstd: bitstream underrun")
        self.n -= k
        return (self.v >> self.n) & ((1 << k) - 1)

    def read_zf(self, k: int) -> int:
        if k == 0:
            return 0
        if k <= self.n:
            self.n -= k
            return (self.v >> self.n) & ((1 << k) - 1)
        have = max(self.n, 0)
        out = (self.v & ((1 << have) - 1)) << (k - have) if have else 0
        self.n -= k
        return out


class _FBits:
    """Forward LSB-first bitstream (FSE table descriptions)."""

    __slots__ = ("v", "pos", "nbits")

    def __init__(self, buf):
        self.v = int.from_bytes(buf, "little")
        self.pos = 0
        self.nbits = len(buf) * 8

    def peek(self, k: int) -> int:
        return (self.v >> self.pos) & ((1 << k) - 1)

    def skip(self, k: int) -> None:
        self.pos += k
        if self.pos > self.nbits:
            raise ValueError("zstd: FSE description underrun")

    def read(self, k: int) -> int:
        out = self.peek(k)
        self.skip(k)
        return out

    def consumed_bytes(self) -> int:
        return (self.pos + 7) // 8


def _fse_read_ncount(fb: _FBits, max_sym: int, max_log: int):
    """Read a normalized-count table description (RFC 8878 §4.1.1)."""
    accuracy_log = fb.read(4) + 5
    if accuracy_log > max_log:
        raise ValueError("zstd: FSE accuracy too large")
    size = 1 << accuracy_log
    remaining = size + 1
    threshold = size
    nb = accuracy_log + 1
    norm: List[int] = []
    prev0 = False
    while remaining > 1 and len(norm) <= max_sym:
        if prev0:
            # runs of zero counts: 2-bit repeat codes, 0xFFFF mega-repeats
            n0 = len(norm)
            while fb.peek(16) == 0xFFFF:
                n0 += 24
                fb.skip(16)
            while fb.peek(2) == 3:
                n0 += 3
                fb.skip(2)
            n0 += fb.read(2)
            if n0 > max_sym + 1:
                raise ValueError("zstd: FSE symbol overflow")
            while len(norm) < n0:
                norm.append(0)
            prev0 = False
            continue
        mx = (2 * threshold - 1) - remaining
        if fb.peek(nb - 1) < mx:
            count = fb.read(nb - 1)
        else:
            count = fb.read(nb)
            if count >= threshold:
                count -= mx
        count -= 1  # stored +1; -1 encodes "less than one" probability
        remaining -= -count if count < 0 else count
        norm.append(count)
        prev0 = count == 0
        while remaining < threshold:
            nb -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("zstd: corrupt FSE normalized counts")
    return norm, accuracy_log


def _fse_build(norm: List[int], accuracy_log: int):
    """Decode-table build (symbol spread + baseline/bits, RFC 8878 §4.1.1)."""
    size = 1 << accuracy_log
    tsym = [0] * size
    hi = size - 1
    for s, p in enumerate(norm):
        if p == -1:
            tsym[hi] = s
            hi -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, p in enumerate(norm):
        for _ in range(max(p, 0)):
            tsym[pos] = s
            pos = (pos + step) & mask
            while pos > hi:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: corrupt FSE table spread")
    nxt = [1 if p == -1 else max(p, 0) for p in norm]
    nbits = [0] * size
    base = [0] * size
    for st in range(size):
        s = tsym[st]
        c = nxt[s]
        nxt[s] += 1
        b = accuracy_log - (c.bit_length() - 1)
        nbits[st] = b
        base[st] = (c << b) - size
    return tsym, nbits, base, accuracy_log


def _fse_rle_table(symbol: int):
    return [symbol], [0], [0], 0


def _fse_decode_weights(buf: bytes) -> List[int]:
    """FSE-compressed Huffman weights: two interleaved states decode until the
    backward stream exhausts (RFC 8878 §4.2.1.2)."""
    fb = _FBits(buf)
    norm, alog = _fse_read_ncount(fb, 255, 6)
    tsym, nbits, base, _ = _fse_build(norm, alog)
    payload = buf[fb.consumed_bytes():]
    br = _RBits(payload)
    s1 = br.read(alog)
    s2 = br.read(alog)
    out: List[int] = []

    def step(st: int) -> Tuple[int, int]:
        sym = tsym[st]
        return sym, base[st] + br.read_zf(nbits[st])

    while True:
        if len(out) > 255:
            raise ValueError("zstd: too many Huffman weights")
        sym, s1 = step(s1)
        out.append(sym)
        if br.n < 0:
            out.append(tsym[s2])
            break
        sym, s2 = step(s2)
        out.append(sym)
        if br.n < 0:
            out.append(tsym[s1])
            break
    return out


def _huff_build(weights: List[int]):
    """Canonical Huffman decode table from explicit weights; the last
    symbol's weight is implied (completes a power of two)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: empty Huffman weights")
    # Kraft: sum of 2^(w-1) over ALL symbols == 2^tableLog; the implied last
    # weight completes to the smallest power of two STRICTLY above total
    # (bit_length gives exactly that, including when total is a power of 2).
    tlog = total.bit_length()
    left = (1 << tlog) - total
    if left <= 0 or (left & (left - 1)):
        raise ValueError("zstd: corrupt Huffman weights")
    weights = list(weights) + [left.bit_length()]  # log2(left) + 1
    if tlog > 11:
        raise ValueError("zstd: Huffman table too large")
    size = 1 << tlog
    sym_tbl = bytearray(size)
    nb_tbl = bytearray(size)
    pos = 0
    for w in range(1, tlog + 1):
        span = 1 << (w - 1)
        for s, ws in enumerate(weights):
            if ws == w:
                if pos + span > size:
                    raise ValueError("zstd: corrupt Huffman weights")
                nb = tlog + 1 - w
                for i in range(pos, pos + span):
                    sym_tbl[i] = s
                    nb_tbl[i] = nb
                pos += span
    if pos != size:
        raise ValueError("zstd: Huffman weights do not fill the table")
    return sym_tbl, nb_tbl, tlog


def _read_weights(src: memoryview, ip: int):
    """Huffman tree description: FSE-compressed or direct 4-bit weights."""
    hbyte = src[ip]
    ip += 1
    if hbyte < 128:
        weights = _fse_decode_weights(bytes(src[ip : ip + hbyte]))
        ip += hbyte
    else:
        n = hbyte - 127
        nb = (n + 1) // 2
        weights = []
        for i in range(nb):
            b = src[ip + i]
            weights.append(b >> 4)
            weights.append(b & 15)
        weights = weights[:n]
        ip += nb
    return _huff_build(weights), ip


def _huff_decode_stream(buf: bytes, table, n_out: int) -> bytearray:
    sym_tbl, nb_tbl, tlog = table
    br = _RBits(buf)
    out = bytearray(n_out)
    mask = (1 << tlog) - 1
    v, n = br.v, br.n
    for i in range(n_out):
        if n >= tlog:
            idx = (v >> (n - tlog)) & mask
        elif n > 0:
            idx = (v << (tlog - n)) & mask
        else:
            raise ValueError("zstd: Huffman stream underrun")
        out[i] = sym_tbl[idx]
        n -= nb_tbl[idx]
    return out


def _decode_literals(src: memoryview, ip: int, huff_prev):
    """Literals section (RFC 8878 §3.1.1.3.1). Returns (literals, ip, huff)."""
    h0 = src[ip]
    btype = h0 & 3
    sf = (h0 >> 2) & 3
    if btype in (0, 1):  # raw | RLE
        if sf in (0, 2):
            regen = h0 >> 3
            ip += 1
        elif sf == 1:
            regen = (h0 >> 4) | (src[ip + 1] << 4)
            ip += 2
        else:
            regen = (h0 >> 4) | (src[ip + 1] << 4) | (src[ip + 2] << 12)
            ip += 3
        if btype == 0:
            lit = bytearray(src[ip : ip + regen])
            if len(lit) != regen:
                raise ValueError("zstd: truncated raw literals")
            ip += regen
        else:
            lit = bytearray([src[ip]]) * regen
            ip += 1
        return lit, ip, huff_prev
    # compressed (2) | treeless (3)
    if sf == 0:
        n_streams = 1
        regen = (h0 >> 4) | ((src[ip + 1] & 0x3F) << 4)
        csize = (src[ip + 1] >> 6) | (src[ip + 2] << 2)
        ip += 3
    elif sf == 1:
        n_streams = 4
        regen = (h0 >> 4) | ((src[ip + 1] & 0x3F) << 4)
        csize = (src[ip + 1] >> 6) | (src[ip + 2] << 2)
        ip += 3
    elif sf == 2:
        n_streams = 4
        regen = (h0 >> 4) | (src[ip + 1] << 4) | ((src[ip + 2] & 3) << 12)
        csize = (src[ip + 2] >> 2) | (src[ip + 3] << 6)
        ip += 4
    else:
        n_streams = 4
        regen = (h0 >> 4) | (src[ip + 1] << 4) | ((src[ip + 2] & 0x3F) << 12)
        csize = (src[ip + 2] >> 6) | (src[ip + 3] << 2) | (src[ip + 4] << 10)
        ip += 5
    end = ip + csize
    if end > len(src):
        raise ValueError("zstd: truncated literals")
    if btype == 2:
        huff, ip = _read_weights(src, ip)
    else:
        if huff_prev is None:
            raise ValueError("zstd: treeless literals without prior table")
        huff = huff_prev
    if n_streams == 1:
        lit = _huff_decode_stream(bytes(src[ip:end]), huff, regen)
    else:
        if end - ip < 6:
            raise ValueError("zstd: truncated stream jump table")
        s1 = src[ip] | (src[ip + 1] << 8)
        s2 = src[ip + 2] | (src[ip + 3] << 8)
        s3 = src[ip + 4] | (src[ip + 5] << 8)
        ip += 6
        starts = [ip, ip + s1, ip + s1 + s2, ip + s1 + s2 + s3]
        ends = starts[1:] + [end]
        per = (regen + 3) // 4
        sizes = [per, per, per, regen - 3 * per]
        if sizes[3] < 0:
            raise ValueError("zstd: bad 4-stream split")
        lit = bytearray()
        for st, en, sz in zip(starts, ends, sizes):
            if en > end or st > en:
                raise ValueError("zstd: bad stream bounds")
            if sz == 0 and st == en:
                continue
            lit += _huff_decode_stream(bytes(src[st:en]), huff, sz)
    if len(lit) != regen:
        raise ValueError("zstd: literal size mismatch")
    return lit, end, huff


# Predefined sequence-code distributions (RFC 8878 §3.1.1.3.2.2).
_LL_DEFAULT = ([4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2,
                2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1], 6)
_ML_DEFAULT = ([1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1], 6)
_OF_DEFAULT = ([1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, -1, -1, -1, -1, -1], 5)

# Literal-length code -> (baseline, extra bits). Codes 0-15 are identity.
_LL_EXTRA = [(16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
             (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9),
             (1024, 10), (2048, 11), (4096, 12), (8192, 13), (16384, 14),
             (32768, 15), (65536, 16)]
# Match-length code -> (baseline, extra bits). Codes 0-31 are code+3.
_ML_EXTRA = [(35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
             (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
             (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
             (32771, 15), (65539, 16)]

_MAX_LOG = {"ll": 9, "of": 8, "ml": 9}
_MAX_SYM = {"ll": 35, "of": 31, "ml": 52}
_DEFAULTS = {"ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT}


def _seq_table(src: memoryview, ip: int, mode: int, kind: str, prev):
    if mode == 0:
        norm, alog = _DEFAULTS[kind]
        return _fse_build(norm, alog), ip
    if mode == 1:
        sym = src[ip]
        if sym > _MAX_SYM[kind]:
            raise ValueError("zstd: RLE sequence symbol out of range")
        return _fse_rle_table(sym), ip + 1
    if mode == 2:
        fb = _FBits(bytes(src[ip : min(ip + 512, len(src))]))
        norm, alog = _fse_read_ncount(fb, _MAX_SYM[kind], _MAX_LOG[kind])
        return _fse_build(norm, alog), ip + fb.consumed_bytes()
    if prev is None:
        raise ValueError("zstd: repeat sequence table without prior table")
    return prev, ip


def _ll_value(code: int, br: _RBits) -> int:
    if code < 16:
        return code
    if code > 35:
        raise ValueError("zstd: bad LL code")
    b, nb = _LL_EXTRA[code - 16]
    return b + br.read_zf(nb)


def _ml_value(code: int, br: _RBits) -> int:
    if code < 32:
        return code + 3
    if code > 52:
        raise ValueError("zstd: bad ML code")
    b, nb = _ML_EXTRA[code - 32]
    return b + br.read_zf(nb)


def _decode_block(src: memoryview, out: bytearray, rep: List[int],
                  huff_prev, seq_prev: dict, raw_n: int):
    """One compressed block: literals + sequences (RFC 8878 §3.1.1.3)."""
    lit, ip, huff = _decode_literals(src, 0, huff_prev)
    # --- sequences header ---
    if ip >= len(src):
        raise ValueError("zstd: missing sequences header")
    b0 = src[ip]
    ip += 1
    if b0 == 0:
        n_seq = 0
    elif b0 < 128:
        n_seq = b0
    elif b0 < 255:
        n_seq = ((b0 - 128) << 8) + src[ip]
        ip += 1
    else:
        n_seq = src[ip] + (src[ip + 1] << 8) + 0x7F00
        ip += 2
    if n_seq == 0:
        out += lit
        if len(out) > raw_n:
            raise ValueError("zstd: output overflow")
        return huff
    modes = src[ip]
    ip += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence mode bits set")
    ll_t, ip = _seq_table(src, ip, (modes >> 6) & 3, "ll", seq_prev.get("ll"))
    of_t, ip = _seq_table(src, ip, (modes >> 4) & 3, "of", seq_prev.get("of"))
    ml_t, ip = _seq_table(src, ip, (modes >> 2) & 3, "ml", seq_prev.get("ml"))
    seq_prev["ll"], seq_prev["of"], seq_prev["ml"] = ll_t, of_t, ml_t

    br = _RBits(bytes(src[ip:]))
    ll_sym, ll_nb, ll_base, ll_log = ll_t
    of_sym, of_nb, of_base, of_log = of_t
    ml_sym, ml_nb, ml_base, ml_log = ml_t
    s_ll = br.read(ll_log)
    s_of = br.read(of_log)
    s_ml = br.read(ml_log)
    lit_pos = 0
    for i in range(n_seq):
        of_code = of_sym[s_of]
        if of_code > 31:
            raise ValueError("zstd: bad offset code")
        of_value = (1 << of_code) + br.read_zf(of_code) if of_code else 1
        ml = _ml_value(ml_sym[s_ml], br)
        ll = _ll_value(ll_sym[s_ll], br)
        if i + 1 < n_seq:  # last sequence: no state update
            s_ll = ll_base[s_ll] + br.read_zf(ll_nb[s_ll])
            s_ml = ml_base[s_ml] + br.read_zf(ml_nb[s_ml])
            s_of = of_base[s_of] + br.read_zf(of_nb[s_of])
        # resolve repeat offsets
        if of_code == 0:
            of_value = 1  # code 0 -> value 1 (rep0 when ll>0)
        if of_value > 3:
            offset = of_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = of_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:  # ll == 0 and of_value == 3
                offset = rep[0] - 1
                if offset <= 0:
                    raise ValueError("zstd: repeat offset underflow")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        # execute: literals then match copy
        if lit_pos + ll > len(lit):
            raise ValueError("zstd: literal overrun")
        out += lit[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ValueError("zstd: match offset beyond window")
        if len(out) + ml > raw_n:
            raise ValueError("zstd: output overflow")
        if offset >= ml:
            start = len(out) - offset
            out += out[start : start + ml]
        else:
            start = len(out) - offset
            for j in range(ml):
                out.append(out[start + j])
    if br.n < 0:
        raise ValueError("zstd: sequence bitstream underrun")
    out += lit[lit_pos:]
    if len(out) > raw_n:
        raise ValueError("zstd: output overflow")
    return huff


def _decompress_py(data: bytes, raw_n: int) -> bytes:
    """Pure-Python zstd frame decoder (fallback reader)."""
    try:
        return _decompress_py_inner(data, raw_n)
    except IndexError:  # defensive: truncated reads must raise, never crash
        raise ValueError("zstd: truncated input") from None


def _decompress_py_inner(data: bytes, raw_n: int) -> bytes:
    src = memoryview(data)
    if len(src) < 5 or int.from_bytes(src[:4], "little") != _MAGIC:
        raise ValueError("zstd: bad magic")
    ip = 4
    fhd = src[ip]
    ip += 1
    if fhd & 0x08:
        raise ValueError("zstd: reserved frame header bit set")
    did_size = (0, 1, 2, 4)[fhd & 3]
    has_checksum = (fhd >> 2) & 1
    single_seg = (fhd >> 5) & 1
    fcs_code = fhd >> 6
    if not single_seg:
        ip += 1  # window descriptor (size hints only)
    ip += did_size
    fcs_size = ((1 if single_seg else 0), 2, 4, 8)[fcs_code]
    fcs = None
    if fcs_size:
        fcs = int.from_bytes(src[ip : ip + fcs_size], "little")
        if fcs_size == 2:
            fcs += 256
        ip += fcs_size
    if fcs is not None and fcs != raw_n:
        raise ValueError("zstd: frame content size mismatch")
    out = bytearray()
    rep = [1, 4, 8]
    huff = None
    seq_prev: dict = {}
    while True:
        if ip + 3 > len(src):
            raise ValueError("zstd: truncated block header")
        bh = int.from_bytes(src[ip : ip + 3], "little")
        ip += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            if ip + bsize > len(src) or len(out) + bsize > raw_n:
                raise ValueError("zstd: raw block overrun")
            out += src[ip : ip + bsize]
            ip += bsize
        elif btype == 1:  # RLE: bsize = regenerated size, 1 stored byte
            if ip >= len(src) or len(out) + bsize > raw_n:
                raise ValueError("zstd: RLE block overrun")
            out += bytes([src[ip]]) * bsize
            ip += 1
        elif btype == 2:
            if bsize > _MAX_BLOCK or ip + bsize > len(src):
                raise ValueError("zstd: bad compressed block size")
            huff = _decode_block(
                src[ip : ip + bsize], out, rep, huff, seq_prev, raw_n
            )
            ip += bsize
        else:
            raise ValueError("zstd: reserved block type")
        if last:
            break
    if has_checksum:
        ip += 4  # xxhash64 low bits — integrity is the container CRC's job
    if len(out) != raw_n:
        raise ValueError("zstd: size mismatch")
    return bytes(out)
