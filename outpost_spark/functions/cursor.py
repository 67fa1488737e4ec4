"""Byte-compatible cursor codec (internal/cursor/cursor.go:22-80).

Format: ``{resource}v{version:02d}:{data}`` base62-encoded via big-int over
the raw bytes.  Go's ``big.Int.Text(62)`` digit set is
``0-9 a-z A-Z`` (lowercase first) — replicated exactly so cursors produced
by the reference decode here and vice versa.

Position payload for log-store lists: ``{unix_ms}::{id}``
(chlogstore.go:120-122).
"""

from __future__ import annotations

_ALPHABET = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
_INDEX = {c: i for i, c in enumerate(_ALPHABET)}


class InvalidCursorError(ValueError):
    pass


class CursorVersionMismatchError(ValueError):
    pass


def base62_encode(s: str) -> str:
    if s == "":
        return ""
    num = int.from_bytes(s.encode("utf-8"), "big")
    if num == 0:
        return "0"
    out = []
    while num > 0:
        num, r = divmod(num, 62)
        out.append(_ALPHABET[r])
    return "".join(reversed(out))


def base62_decode(s: str) -> str:
    if s == "":
        return ""
    num = 0
    for c in s:
        if c not in _INDEX:
            raise InvalidCursorError(f"invalid base62 char {c!r}")
        num = num * 62 + _INDEX[c]
    if num == 0:
        return ""
    return num.to_bytes((num.bit_length() + 7) // 8, "big").decode("utf-8", errors="strict")


def encode(resource: str, version: int, data: str) -> str:
    return base62_encode(f"{resource}v{version:02d}:{data}")


def decode(encoded: str, resource: str, version: int) -> str:
    if encoded == "":
        return ""
    raw = base62_decode(encoded)
    expected = f"{resource}v{version:02d}:"
    if not raw.startswith(expected):
        if raw.startswith(resource + "v"):
            raise CursorVersionMismatchError(f"expected version {version:02d}")
        raise InvalidCursorError("invalid cursor")
    return raw[len(expected):]


def encode_position(resource: str, version: int, unix_ms: int, item_id: str) -> str:
    """List-cursor helper: position is ``{unix_ms}::{id}`` (chlogstore.go:120-122)."""
    return encode(resource, version, f"{unix_ms}::{item_id}")


def decode_position(encoded: str, resource: str, version: int) -> tuple[int, str]:
    data = decode(encoded, resource, version)
    ms, _, item_id = data.partition("::")
    if not ms or not item_id:
        raise InvalidCursorError(f"invalid position {data!r}")
    return int(ms), item_id
