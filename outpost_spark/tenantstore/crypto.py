"""Credential encryption at rest (AES-256-GCM) for the tenant store.

Mirrors the reference cipher contract
(internal/tenantstore/redistenantstore/cipher.go):

- **Key derivation** (cipher.go:61-65): the AES key is the 32-character
  hex md5 of the configured secret — the hex *string's* bytes, which
  makes it an AES-256 key.
- **Wire format** (cipher.go:16-30): ``random 12-byte nonce ||
  ciphertext || 16-byte GCM tag`` — ``aead.Seal(nonce, nonce, pt, nil)``
  prepends the nonce and GCM appends the tag.  This is byte-identical to
  Spark's ``aes_encrypt(..., 'GCM')`` layout, so values written by the
  reference store decrypt here and vice versa.
- **What is encrypted** (serialization.go:124-135): the JSON
  serialization of the destination ``credentials`` map and the
  ``delivery_metadata`` blob; all other destination fields stay
  plaintext and filterable.

Everything is a native Column expression (JVM codegen — no Python in the
path), so encrypt-on-write and decrypt-on-read add no shuffle and keep
the destinations dimension broadcastable.  Nonces come from the JVM's
secure RNG per row per call: re-encrypting the same plaintext yields a
different ciphertext, exactly like the reference (equality joins on the
ciphertext are therefore meaningless by design — decrypt first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: columns the reference encrypts (serialization.go:124-135)
DEFAULT_SECRET_COLS = ("credentials", "delivery_metadata")

#: how each default column decrypts: a type string -> from_json into that
#: type; None -> the sealed value was a plain string, return it verbatim.
#: Mirrors encrypt_destination_secrets, which JSON-serializes map/struct
#: columns but seals string columns as-is — so the default round-trip is
#: the identity for BOTH shapes.
DEFAULT_SECRET_SCHEMAS: dict = {
    "credentials": "map<string,string>",
    "delivery_metadata": None,
}

_GCM = "GCM"


def cipher_key_expr(secret: str) -> Column:
    """hex(md5(secret)) — 32 ASCII chars used as the AES-256 key
    (cipher.go:61-65)."""
    return F.md5(F.lit(secret))


def encrypt_expr(plaintext: Column, secret: str) -> Column:
    """AES-256-GCM encrypt a string column -> binary (nonce||ct||tag)."""
    return F.aes_encrypt(plaintext, cipher_key_expr(secret), F.lit(_GCM))


def decrypt_expr(ciphertext: Column, secret: str) -> Column:
    """Decrypt back to the string plaintext.

    Raises at execution time (GCM tag mismatch) on a wrong key or
    tampered ciphertext — the strict analog of ``aead.Open`` returning an
    error (cipher.go:41-44).  Use :func:`try_decrypt_expr` for a
    null-on-failure scan.
    """
    return F.aes_decrypt(ciphertext, cipher_key_expr(secret), F.lit(_GCM)).cast(
        "string"
    )


def try_decrypt_expr(ciphertext: Column, secret: str) -> Column:
    """Like :func:`decrypt_expr` but yields NULL on auth failure instead of
    failing the job — for audit scans over stores with rotated keys."""
    return F.try_aes_decrypt(
        ciphertext, cipher_key_expr(secret), F.lit(_GCM)
    ).cast("string")


def encrypt_destination_secrets(
    df: DataFrame,
    secret: str,
    cols: tuple[str, ...] = DEFAULT_SECRET_COLS,
) -> DataFrame:
    """Encrypt-on-write projection: each secret column becomes a binary
    ``<col>`` holding AES-GCM(json(col)).

    Map/struct-typed columns are JSON-serialized first (the reference
    marshals the credentials map to JSON before sealing,
    serialization.go:45-57); string columns are sealed as-is.
    """
    dtypes = dict(df.dtypes)
    for c in cols:
        if c not in dtypes:
            continue
        src = F.col(c) if dtypes[c] == "string" else F.to_json(F.col(c))
        df = df.withColumn(c, encrypt_expr(src, secret))
    return df


def decrypt_destination_secrets(
    df: DataFrame,
    secret: str,
    cols: tuple[str, ...] = DEFAULT_SECRET_COLS,
    *,
    schemas: dict | None = None,
    strict: bool = True,
) -> DataFrame:
    """Decrypt-on-read projection back to each column's pre-seal shape
    (parseDestinationHash, serialization.go:124-135).

    ``schemas`` maps column -> type string (``from_json`` target) or None
    (the column was sealed as a plain string — returned verbatim); the
    default mirrors :func:`encrypt_destination_secrets` so
    encrypt-then-decrypt is the identity for every default column.
    ``strict=False`` swaps in :func:`try_decrypt_expr`, leaving NULL for
    rows sealed under a different key instead of failing the scan.
    """
    if schemas is None:
        schemas = DEFAULT_SECRET_SCHEMAS
    dtypes = dict(df.dtypes)
    dec = decrypt_expr if strict else try_decrypt_expr
    for c in cols:
        if c not in dtypes:
            continue
        schema = schemas.get(c)
        plain = dec(F.col(c), secret)
        df = df.withColumn(c, plain if schema is None else F.from_json(plain, schema))
    return df
