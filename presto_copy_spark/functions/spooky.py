"""SpookyHash V2 (Bob Jenkins, public domain) in pure Python.

Backs the Presto names ``spooky_hash_v2_32`` / ``spooky_hash_v2_64``
(VarbinaryFunctions.java), registered as Arrow-batched pandas UDFs —
off the hot path like the other stdlib-backed binary functions.

The short path (< 192 bytes) is verified against the reference's own
published vectors (presto-main/.../TestVarbinaryFunctions.java:383-386:
'' -> 6BF50919 / 232706FC6BF50919, 'hello' -> D382E6CA /
3768826AD382E6CA).  The long path transcribes the same public
algorithm; no independent in-container vector exists for it (documented
— the container has no second implementation to cross-check against).
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_SC_CONST = 0xDEADBEEFDEADBEEF


def _rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (64 - k))) & _MASK


def _short_mix(a: int, b: int, c: int, d: int):
    c = _rot(c, 50); c = (c + d) & _MASK; a ^= c
    d = _rot(d, 52); d = (d + a) & _MASK; b ^= d
    a = _rot(a, 30); a = (a + b) & _MASK; c ^= a
    b = _rot(b, 41); b = (b + c) & _MASK; d ^= b
    c = _rot(c, 54); c = (c + d) & _MASK; a ^= c
    d = _rot(d, 48); d = (d + a) & _MASK; b ^= d
    a = _rot(a, 38); a = (a + b) & _MASK; c ^= a
    b = _rot(b, 37); b = (b + c) & _MASK; d ^= b
    c = _rot(c, 62); c = (c + d) & _MASK; a ^= c
    d = _rot(d, 34); d = (d + a) & _MASK; b ^= d
    a = _rot(a, 5); a = (a + b) & _MASK; c ^= a
    b = _rot(b, 36); b = (b + c) & _MASK; d ^= b
    return a, b, c, d


def _short_end(a: int, b: int, c: int, d: int):
    d ^= c; c = _rot(c, 15); d = (d + c) & _MASK
    a ^= d; d = _rot(d, 52); a = (a + d) & _MASK
    b ^= a; a = _rot(a, 26); b = (b + a) & _MASK
    c ^= b; b = _rot(b, 51); c = (c + b) & _MASK
    d ^= c; c = _rot(c, 28); d = (d + c) & _MASK
    a ^= d; d = _rot(d, 9); a = (a + d) & _MASK
    b ^= a; a = _rot(a, 47); b = (b + a) & _MASK
    c ^= b; b = _rot(b, 54); c = (c + b) & _MASK
    d ^= c; c = _rot(c, 32); d = (d + c) & _MASK
    a ^= d; d = _rot(d, 25); a = (a + d) & _MASK
    b ^= a; a = _rot(a, 63); b = (b + a) & _MASK
    return a, b, c, d


def _u64(data: bytes, off: int) -> int:
    return int.from_bytes(data[off:off + 8], "little")


def _short_hash(data: bytes, seed1: int = 0, seed2: int = 0):
    length = len(data)
    remainder = length % 32
    a, b, c, d = seed1, seed2, _SC_CONST, _SC_CONST
    u = 0
    if length > 15:
        end = (length // 32) * 32
        while u < end:
            c = (c + _u64(data, u)) & _MASK
            d = (d + _u64(data, u + 8)) & _MASK
            a, b, c, d = _short_mix(a, b, c, d)
            a = (a + _u64(data, u + 16)) & _MASK
            b = (b + _u64(data, u + 24)) & _MASK
            u += 32
        if remainder >= 16:
            c = (c + _u64(data, u)) & _MASK
            d = (d + _u64(data, u + 8)) & _MASK
            a, b, c, d = _short_mix(a, b, c, d)
            u += 16
            remainder -= 16
    d = (d + (length << 56)) & _MASK
    t = data[u:]
    if remainder == 0:
        c = (c + _SC_CONST) & _MASK
        d = (d + _SC_CONST) & _MASK
    else:
        # the reference's fall-through switch: bytes 8..14 accumulate
        # into d (with word 8-11 as one little-endian u32 when >= 12),
        # bytes 0..7 into c
        if remainder >= 12:
            hi = 0
            if remainder >= 15:
                hi = (hi + (t[14] << 48)) & _MASK
            if remainder >= 14:
                hi = (hi + (t[13] << 40)) & _MASK
            if remainder >= 13:
                hi = (hi + (t[12] << 32)) & _MASK
            hi = (hi + int.from_bytes(t[8:12], "little")) & _MASK
            d = (d + hi) & _MASK
            c = (c + _u64(data, u)) & _MASK
        elif remainder >= 9:
            hi = t[8]
            if remainder >= 11:
                hi += t[10] << 16
            if remainder >= 10:
                hi += t[9] << 8
            d = (d + hi) & _MASK
            c = (c + _u64(data, u)) & _MASK
        elif remainder == 8:
            c = (c + _u64(data, u)) & _MASK
        elif remainder >= 4:
            lo = int.from_bytes(t[0:4], "little")
            if remainder >= 7:
                lo += t[6] << 48
            if remainder >= 6:
                lo += t[5] << 40
            if remainder >= 5:
                lo += t[4] << 32
            c = (c + lo) & _MASK
        else:
            lo = t[0]
            if remainder >= 3:
                lo += t[2] << 16
            if remainder >= 2:
                lo += t[1] << 8
            c = (c + lo) & _MASK
    a, b, c, d = _short_end(a, b, c, d)
    return a, b


def _mix_block(data: bytes, off: int, h: list[int]) -> None:
    rots = (11, 32, 43, 31, 17, 28, 39, 57, 55, 54, 22, 46)
    for i in range(12):
        h[i] = (h[i] + _u64(data, off + 8 * i)) & _MASK
        h[(i + 2) % 12] ^= h[(i + 10) % 12]
        h[(i + 11) % 12] ^= h[i]
        h[i] = _rot(h[i], rots[i])
        h[(i + 11) % 12] = (h[(i + 11) % 12] + h[(i + 1) % 12]) & _MASK


def _end_partial(h: list[int]) -> None:
    rots = (44, 15, 34, 21, 38, 33, 10, 13, 38, 53, 42, 54)
    for i in range(12):
        h[(i + 11) % 12] = (h[(i + 11) % 12] + h[(i + 1) % 12]) & _MASK
        h[(i + 2) % 12] ^= h[(i + 11) % 12]
        h[(i + 1) % 12] = _rot(h[(i + 1) % 12], rots[i])


def spooky_hash128(data: bytes, seed1: int = 0, seed2: int = 0):
    """(hash1, hash2) of SpookyHash V2."""
    length = len(data)
    if length < 192:
        return _short_hash(data, seed1, seed2)
    h = [seed1, seed2, _SC_CONST] * 4
    end = (length // 96) * 96
    off = 0
    while off < end:
        _mix_block(data, off, h)
        off += 96
    remainder = length - end
    buf = data[end:] + b"\x00" * (96 - remainder)
    buf = buf[:95] + bytes([remainder])
    for i in range(12):
        h[i] = (h[i] + _u64(buf, 8 * i)) & _MASK
    for _ in range(3):
        _end_partial(h)
    return h[0], h[1]


def spooky_hash_v2_64(data: bytes) -> bytes:
    """Presto spooky_hash_v2_64(varbinary) -> 8 bytes (big-endian h1)."""
    h1, _ = spooky_hash128(bytes(data))
    return h1.to_bytes(8, "big")


def spooky_hash_v2_32(data: bytes) -> bytes:
    """Presto spooky_hash_v2_32(varbinary) -> low 32 bits, big-endian."""
    h1, _ = spooky_hash128(bytes(data))
    return (h1 & 0xFFFFFFFF).to_bytes(4, "big")
