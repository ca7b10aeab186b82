"""F7: runtime-learned blacklist.

The reference's NFT parser LEARNS which code hashes are not NFTs (the
emulator exits 11/32) and stops spending emulator time on them
(nfts_parser.py:29,35-38,133-138). The analogue here: repos whose
upsert payloads are ALWAYS structurally malformed ("bot repos" — e.g. a
mirroring bot pushing garbage) are detected at runtime and their events
are excluded before the expensive Arrow decode.

Parity-safety is the design constraint: dropping an event that would
have decoded fine would corrupt the lake. The promotion rule is
therefore conservative:

  * a repo becomes SUSPECT when a batch contains malformed upserts for
    it and no well-formed ones;
  * one well-formed upsert, ever, exempts the repo permanently;
  * a suspect is promoted to the active blacklist only after
    `min_batches` distinct batches of malformed-only evidence.

A structurally-random 1% malformed rate cannot promote a healthy repo
(it would need several consecutive batches with >=1 malformed and zero
well-formed events — probability ~0 for any repo that actually emits
data). Blacklisted events never carried decodable content, so the final
table state is byte-identical with the blacklist on or off; the saving
is decode work and bucket-rewrite churn.

The per-batch evidence rides the pipeline's existing control-plane
aggregation (bounded: suspects only), costing zero extra jobs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


class LearnedBlacklist:
    def __init__(self, min_batches: int = 3, max_active: int = 100_000):
        self.min_batches = min_batches
        self.max_active = max_active
        self._exempt: set[str] = set()
        self._suspect_batches: dict[str, int] = {}
        self.active: set[str] = set()
        self.skipped_events = 0

    def suspects(self) -> list[str]:
        return sorted(self._suspect_batches)

    def exclusion_expr(self) -> Column | None:
        """Filter to EXCLUDE blacklisted upserts (None when inactive).
        The active set is small (it only ever holds always-malformed
        repos) so an isin literal is fine; swap for a broadcast anti-join
        past ~10^4 entries."""
        if not self.active:
            return None
        return ~(
            (F.col("event_type") == "file_upsert")
            & F.col("repo").isin(sorted(self.active))
        )

    def observe(self, bad_repos: list[str], ok_repos: list[str]) -> None:
        """Feed one batch's evidence (from the control aggregation):
        repos with malformed upserts, and repos among current suspects
        that produced a well-formed upsert."""
        for r in ok_repos or []:
            self._exempt.add(r)
            self._suspect_batches.pop(r, None)
            self.active.discard(r)  # never triggers if promotion is sound
        for r in bad_repos or []:
            if r in self._exempt or r in self.active:
                continue
            n = self._suspect_batches.get(r, 0) + 1
            self._suspect_batches[r] = n
            if n >= self.min_batches and len(self.active) < self.max_active:
                self.active.add(r)
                self._suspect_batches.pop(r)
