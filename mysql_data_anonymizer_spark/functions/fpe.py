"""Format-preserving, Luhn-valid card-number masking.

The reference can only SUBSTITUTE a card number with a freshly generated one
(src/helpers/StringHelpers.php / the Faker card formatter) — the masked
value shares nothing with the original, so systems that route on BIN or
match on last-4 break. This operator is the anonymization-grade upgrade:

- BIN (digits 1-6) and last-4 (digits 13-16, INCLUDING the original Luhn
  check digit) survive verbatim — routing, display ("**** 1234"), and
  reconciliation keep working;
- middle digits 7-11 are re-derived deterministically from
  md5(seed, card) — same seed, same token (auditable, joinable), a fresh
  seed is a fresh tokenization;
- digit 12 absorbs the Luhn residue, so the masked number still validates
  against the ORIGINAL check digit. Digit 12 sits at an even (non-doubled)
  position in the 16-digit Luhn layout, so its contribution is the digit
  itself and the absorber is a plain mod-10 complement — no doubled-digit
  inverse table needed.

Everything is a pure Column expression (JVM-side, whole-stage codegen, zero
shuffle, zero Python) and bit-reproducible in plain SQL, so the DuckDB
oracle recomputes the identical mask and the driver hash-matches the
released tokens themselves.

NOT encryption: like all deterministic tokenization it's a keyed PRF by
construction (md5 here — collision-adequate for masking, not a security
boundary). Swap the digest for HMAC-SHA256(secret) in a hostile-adversary
deployment; the Luhn-absorber algebra is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mysql_data_anonymizer_spark.functions.generator import _hex_val


def _digit(card: Column, pos: int) -> Column:
    """Integer value of the decimal digit at 1-based ``pos``.

    try_cast, not cast: under ANSI mode a plain cast of a non-digit (or of
    the EMPTY string a short PAN yields beyond its length) would crash the
    whole job — a malformed card must instead propagate NULL, so
    ``luhn_valid`` returns NULL and ``fpe_mask_card`` masks to NULL
    (fuzz/ADVICE r7 hardening; same discipline as the money casts)."""
    return F.substring(card, pos, 1).try_cast("int")


def _contrib(dig: Column, pos: int) -> Column:
    """Luhn contribution of ``dig`` at 1-based position ``pos`` (16-digit
    layout, check digit at 16): odd positions double-and-fold."""
    if pos % 2 == 1:
        dbl = dig * F.lit(2)
        return F.when(dbl > 9, dbl - F.lit(9)).otherwise(dbl)
    return dig


def luhn_valid(card: Column) -> Column:
    """True iff the 16-digit string satisfies the Luhn checksum."""
    total: Column = F.lit(0)
    for pos in range(1, 17):
        total = total + _contrib(_digit(card, pos), pos)
    return (total % F.lit(10)) == F.lit(0)


def fpe_mask_card(card: Column, seed: str = "fpe") -> Column:
    """Masked 16-digit card: BIN + last-4 preserved, digits 7-11 from the
    keyed digest, digit 12 = Luhn absorber (see module docstring)."""
    d = F.md5(F.concat(F.lit(f"{seed}:"), card))
    mids = {pos: _hex_val(d, pos - 6) % F.lit(10) for pos in range(7, 12)}
    total: Column = F.lit(0)
    for pos in list(range(1, 7)) + list(range(13, 17)):
        total = total + _contrib(_digit(card, pos), pos)
    for pos, dig in mids.items():
        total = total + _contrib(dig, pos)
    absorber = (F.lit(10) - total % F.lit(10)) % F.lit(10)  # pos 12: identity
    return F.concat(
        F.substring(card, 1, 6),
        *[mids[p].cast("string") for p in range(7, 12)],
        absorber.cast("string"),
        F.substring(card, 13, 4),
    )
