"""Per-lane poison-fixture ORACLE contract (r16 verdict items 1+2).

Every registered lane with an oracle must PASS the full oracle
comparison on the poison fixture — the oracles are poison-hardened
mirrors of each lane's defined degenerate-input contract (see
ORACLES.md for the mirroring idioms). A lane may appear here ONLY
with a documented, verified reason why exact oracle equality on
poison is impossible; tools/poison_oracle_sweep.py fails on any lane
that diverges without an entry (undecided) AND on any entry that no
longer diverges (stale — shrink-only discipline, same as the plan
whitelists).

Classes:
  "divergence": the lane's value genuinely cannot be expressed in
      DuckDB SQL; the sweep requires the lane to still RUN clean and
      the mismatch to be confined to the documented shape.
"""

# lane -> (class, reason)
EXPECTATIONS: dict[str, tuple[str, str]] = {
    "multimodal_resize": (
        "divergence",
        "content_md5 hashes the BYTE-cycled media payload truncated to "
        "30 bytes; a multibyte (e.g. CJK) document's truncation splits "
        "a UTF-8 character, and DuckDB's md5() accepts VARCHAR only — "
        "a byte-level hash of invalid UTF-8 is not expressible in the "
        "oracle. Verified: exactly one row (the multibyte poison doc) "
        "mismatches, on content_md5 only; NULL/empty-payload edges ARE "
        "mirrored (explicit guards + the md5-of-30-NUL-bytes constant).",
    ),
}
