"""Column compression codec.

The reference compresses column payloads with LZ4-with-length-prefix
(LZ4CompressorWithLength — compressWithLZ4B K:641-652, compressValues
K:727-757), explicitly documented as incompatible with raw LZ4 framing
(docs/keyspaces/README.MD:237-240).

This container has no lz4 package, so the codec is pluggable:
  * 'lz4'  — 4-byte little-endian length prefix + LZ4 block, matching
    LZ4CompressorWithLength's wire format (available when the lz4
    package is installed; import-gated).
  * 'zlib' — same length-prefix convention over zlib (always available).
Payloads are tagged with a 1-byte codec id so decompress is
self-describing; the reference's raw format (no tag) can be produced
with tag=False for wire compatibility when lz4 is present.
"""

from __future__ import annotations

import struct
import zlib

try:
    import lz4.block as _lz4block  # type: ignore
except ImportError:  # pragma: no cover - environment-dependent
    _lz4block = None

_CODEC_LZ4 = b"\x01"
_CODEC_ZLIB = b"\x02"


def default_codec() -> str:
    return "lz4" if _lz4block is not None else "zlib"


def compress(data: bytes, codec: str | None = None, tag: bool = True) -> bytes:
    codec = codec or default_codec()
    prefix = struct.pack("<I", len(data))  # decompressed-length prefix
    if codec == "lz4":
        if _lz4block is None:
            raise RuntimeError("lz4 package not available; use codec='zlib'")
        body = prefix + _lz4block.compress(data, store_size=False)
        return (_CODEC_LZ4 + body) if tag else body
    if codec == "zlib":
        body = prefix + zlib.compress(data)
        return (_CODEC_ZLIB + body) if tag else body
    raise ValueError(f"unknown codec {codec!r}")


def decompress(blob: bytes) -> bytes:
    codec_id, body = blob[:1], blob[1:]
    (length,) = struct.unpack("<I", body[:4])
    payload = body[4:]
    if codec_id == _CODEC_LZ4:
        if _lz4block is None:
            raise RuntimeError("lz4 payload but lz4 package not available")
        return _lz4block.decompress(payload, uncompressed_size=length)
    if codec_id == _CODEC_ZLIB:
        out = zlib.decompress(payload)
        if len(out) != length:
            raise ValueError("length prefix mismatch")
        return out
    raise ValueError(f"unknown codec tag {codec_id!r}")
