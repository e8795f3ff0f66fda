"""Parallel inflate for arbitrary single-stream gzip (driver side).

rapidgzip/pugz design over the native core (native/pinflate.cpp): speculative
deflate-block boundary discovery splits the compressed stream into chunks
that decode CONCURRENTLY with 16-bit marker outputs for references into the
unknown 32 KB pre-chunk window; a sequential resolution pass patches markers
with each predecessor's final window; the gzip trailer CRC32 verifies the
assembled output. Any failure — no boundary found, decode error, chunk ends
not meeting the next boundary, CRC mismatch — returns None and the caller
falls back to sequential zlib, so this path can only be faster, never wrong.

Reference capability parity: C4 RapidgzipReader (readers.mojo:380-443),
"up to 5x speedup" (reference CHANGELOG.md:40) from the same design.
"""

from __future__ import annotations

import ctypes
import os
import struct
import zlib
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import numpy as np

from .. import native

_WSIZE = 32768
_PZ_OUTCAP = 4


def _parse_gzip_header(buf: bytes) -> Optional[int]:
    """Byte offset where the deflate stream starts, or None if not gzip."""
    if len(buf) < 18 or buf[0] != 0x1F or buf[1] != 0x8B or buf[2] != 8:
        return None
    flg = buf[3]
    pos = 10
    if flg & 4:  # FEXTRA
        if pos + 2 > len(buf):
            return None
        xlen = struct.unpack_from("<H", buf, pos)[0]
        pos += 2 + xlen
    if flg & 8:  # FNAME
        end = buf.find(b"\x00", pos)
        if end < 0:
            return None
        pos = end + 1
    if flg & 16:  # FCOMMENT
        end = buf.find(b"\x00", pos)
        if end < 0:
            return None
        pos = end + 1
    if flg & 2:  # FHCRC
        pos += 2
    return pos if pos < len(buf) else None


def parallel_inflate(comp: bytes, parallelism: int,
                     chunk_bytes: int = 4 * 1024 * 1024) -> Optional[bytes]:
    """Decompress a (possibly multi-member) gzip buffer using `parallelism`
    threads. Returns the decompressed bytes, or None when the parallel path
    cannot be used safely (caller falls back to sequential zlib)."""
    lib = native.pinflate_lib()
    if lib is None or parallelism < 2 or not comp:
        return None
    out_parts: List[bytes] = []
    pos = 0
    while pos < len(comp):
        hdr = _parse_gzip_header(comp[pos:])
        if hdr is None:
            return None
        member = _inflate_member(lib, comp, pos + hdr, parallelism,
                                 chunk_bytes)
        if member is None:
            return None
        data, end_byte = member
        # trailer: CRC32 + ISIZE
        if end_byte + 8 > len(comp):
            return None
        crc, isize = struct.unpack_from("<II", comp, end_byte)
        if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
            return None
        if (len(data) & 0xFFFFFFFF) != isize:
            return None
        out_parts.append(data)
        pos = end_byte + 8
    return b"".join(out_parts)


def _inflate_member(lib, comp: bytes, deflate_start: int, parallelism: int,
                    chunk_bytes: int):
    """Inflate one member whose deflate stream starts at byte deflate_start.
    Returns (bytes, end_byte_offset) or None."""
    comp_arr = np.frombuffer(comp, dtype=np.uint8)
    p_comp = comp_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    nbits = 8 * len(comp)

    # --- phase 1: boundary discovery (parallel) -----------------------------
    targets = list(range(deflate_start + chunk_bytes, len(comp), chunk_bytes))
    # cap the chunk count: more chunks than threads x4 only adds overhead
    max_chunks = max(parallelism * 4, 1)
    if len(targets) + 1 > max_chunks:
        stride = (len(comp) - deflate_start) // max_chunks + 1
        targets = list(range(deflate_start + stride, len(comp), stride))

    def find(byte_off: int) -> int:
        scratch = np.empty(1 << 18, dtype=np.uint16)
        return lib.pz_find_block(
            p_comp, nbits, 8 * byte_off, 8 * chunk_bytes, 1 << 18,
            scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            len(scratch))

    with ThreadPoolExecutor(max_workers=parallelism) as pool:
        found = list(pool.map(find, targets))
    starts = [8 * deflate_start]
    for f in found:
        if f > starts[-1]:
            starts.append(int(f))
    bounds = starts + [nbits]

    def decode_range(bit_start: int, bit_limit: int):
        cap = max((bit_limit - bit_start) // 8 * _PZ_OUTCAP, 1 << 16)
        for _ in range(8):  # grow on OUTCAP
            out = np.empty(int(cap), dtype=np.uint16)
            end_bit = ctypes.c_int64(0)
            saw_final = ctypes.c_int32(0)
            err = ctypes.c_int32(0)
            n = lib.pz_decode_chunk(
                p_comp, nbits, bit_start, bit_limit,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                len(out), ctypes.byref(end_bit), ctypes.byref(saw_final),
                ctypes.byref(err))
            if err.value == 4:  # OUTCAP
                cap *= 2
                continue
            if err.value != 0:
                return None
            return out[:n], end_bit.value, bool(saw_final.value)
        return None

    # --- phase 2: optimistic parallel decode of [bound_i, bound_i+1) --------
    with ThreadPoolExecutor(max_workers=parallelism) as pool:
        optimistic = list(pool.map(
            lambda i: decode_range(bounds[i], bounds[i + 1]),
            range(len(bounds) - 1)))
    by_start = {bounds[i]: optimistic[i] for i in range(len(bounds) - 1)
                if optimistic[i] is not None}

    # --- phase 3: chain walk with repair ------------------------------------
    # A speculative boundary can be a false positive (a mid-block bit offset
    # that happens to decode plausibly); then the predecessor overshoots it
    # and its true end bit is not a known start. Repair that link by decoding
    # from the true end to the next optimistic bound — later links usually
    # rejoin the precomputed chain, so repairs stay local.
    chain: List[np.ndarray] = []
    cur = 8 * deflate_start
    end_bit_final = None
    for _ in range(4 * len(bounds) + 4):  # hard bound on chain length
        res = by_start.get(cur)
        if res is None:
            nxt = next((b for b in bounds if b > cur), nbits)
            res = decode_range(cur, nxt)
            if res is None:
                return None
        syms, end_bit, saw_final = res
        chain.append(syms)
        if saw_final:
            end_bit_final = end_bit
            break
        if end_bit <= cur or end_bit >= nbits:
            return None
        cur = end_bit
    if end_bit_final is None:
        return None

    # --- phase 4: sequential marker resolution ------------------------------
    datas: List[bytes] = []
    prev_win = np.zeros(_WSIZE, dtype=np.uint8)
    for syms in chain:
        dst = np.empty(len(syms), dtype=np.uint8)
        rc = lib.pz_resolve(
            syms.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), len(syms),
            prev_win.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            return None
        if len(dst) >= _WSIZE:
            prev_win = dst[-_WSIZE:].copy()
        else:
            prev_win = np.concatenate([prev_win[len(dst):], dst])
        datas.append(dst.tobytes())
    end_byte = (end_bit_final + 7) // 8
    return b"".join(datas), end_byte
