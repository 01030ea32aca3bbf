"""TagIndex: the global key/value string<->int dictionaries.

Reimplements the semantics of ``/root/reference/src/index/tag.go``:

- one key dictionary (key string -> key index);
- per key, a value dictionary sorted with the natural ordering
  (``tag.go:58-67``) so comparison operators work on value indices;
- ``GetNextLowerValueIndexForKey`` (``tag.go:215-230``) used by the parser's
  comparison rewrite (``src/parser/parser.go:413-444``);
- save/load as a small text artifact with escaping (``tag.go:276-317``,
  format ``key=v1|v2|...`` with ``$$PIPE$$/$$NEWLINE$$/$$EQUAL$$``).

The TagIndex is tiny driver-side state; it is broadcast to workers via
``ray.put`` once and used read-only inside ``map_batches`` stages (SURVEY.md
ST1) — it is never shuffled.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from ..model import NOT_FOUND
from .natural_sort import is_less_than, natural_sorted

_ESC = [("|", "$$PIPE$$"), ("\n", "$$NEWLINE$$"), ("=", "$$EQUAL$$")]


def _escape(s: str) -> str:
    for raw, esc in _ESC:
        s = s.replace(raw, esc)
    return s


def _unescape(s: str) -> str:
    for raw, esc in _ESC:
        s = s.replace(esc, raw)
    return s


@dataclass
class TagIndex:
    keys: list[str] = field(default_factory=list)
    values: list[list[str]] = field(default_factory=list)  # values[key_index]

    def __post_init__(self) -> None:
        self._rebuild_reverse()

    def _rebuild_reverse(self) -> None:
        self._key_rev = {k: i for i, k in enumerate(self.keys)}
        self._val_rev = [{v: i for i, v in enumerate(vs)} for vs in self.values]
        # Sorted-value arrays for vectorized encode (np.searchsorted needs the
        # dictionary's own order, which IS sorted by the natural ordering but
        # not necessarily by plain np ordering — so keep dict lookups for
        # encode and use arrays only for decode).
        self._val_arr = [np.asarray(vs, dtype=object) for vs in self.values]

    # --- build -----------------------------------------------------------
    @classmethod
    def from_tag_lists(cls, per_key_values: dict[str, list[str]]) -> "TagIndex":
        """Build from {key: [distinct values]} with natural-sorted value dicts.

        Mirrors TagIndexCreator.Done (tag.go:58-67): values sorted per key;
        key order is first-appearance order of the input dict.
        """
        keys = list(per_key_values.keys())
        values = [natural_sorted(list(dict.fromkeys(per_key_values[k]))) for k in keys]
        return cls(keys=keys, values=values)

    def extended_with(self, per_key_values: dict[str, list[str]]) -> "TagIndex":
        """Evolve the dictionary for incremental maintenance: existing KEY
        indices never move (key order carries no semantics — only value
        order does), new keys append at the end; each key's value list is
        the natural-sorted union of old and new values (value order IS
        semantic — the comparison rewrite maps ``> >= < <=`` to index
        ranges over the sorted list — so a brand-new value can shift later
        value indices of ITS key; the cascade stays bounded to features
        carrying that key, instead of a full-dictionary re-index shifting
        every key that happens to sort after a new one).

        With no novel pairs the result encodes identically to ``self``
        (pinned by test) — refresh_index then rewrites nothing.

        Append-only means DELETED keys/values persist across refreshes
        (harmless: no feature references them; predicates on them match
        nothing). A dictionary bloated by many dead entries compacts on
        the next full re-import, which rebuilds from scratch."""
        keys = list(self.keys)
        values = [list(vs) for vs in self.values]
        rev = {k: i for i, k in enumerate(keys)}
        for k in per_key_values:
            new_vals = per_key_values[k]
            if k in rev:
                ki = rev[k]
                merged = list(dict.fromkeys(values[ki] + list(new_vals)))
                if len(merged) != len(values[ki]):
                    values[ki] = natural_sorted(merged)
            else:
                rev[k] = len(keys)
                keys.append(k)
                values.append(natural_sorted(list(dict.fromkeys(new_vals))))
        return TagIndex(keys=keys, values=values)

    # --- lookups (reference tag.go:172-230) ------------------------------
    def key_index(self, key: str) -> int:
        return self._key_rev.get(key, NOT_FOUND)

    def value_index(self, key: str, value: str) -> int:
        ki = self.key_index(key)
        if ki == NOT_FOUND:
            return NOT_FOUND
        return self._val_rev[ki].get(value, NOT_FOUND)

    def next_lower_value_index(self, key_index: int, value: str) -> tuple[int, bool]:
        """(index, exact): next lower existing value for a literal.

        Reference GetNextLowerValueIndexForKey (tag.go:215-230): returns the
        exact index with True when present; otherwise the index of the largest
        dictionary value smaller than ``value`` (−1 if the literal sorts below
        everything).
        """
        if key_index == NOT_FOUND or key_index >= len(self.values):
            return NOT_FOUND, False
        for idx, v in enumerate(self.values[key_index]):
            if v == value:
                return idx, True
            if is_less_than(value, v):
                return idx - 1, False
        return len(self.values[key_index]) - 1, False

    def key_string(self, key_index: int) -> str:
        return self.keys[key_index]

    def value_string(self, key_index: int, value_index: int) -> str:
        if key_index >= len(self.values):
            return ""
        vs = self.values[key_index]
        if value_index >= len(vs):
            return ""
        return vs[value_index]

    # --- encode / decode (vectorized) ------------------------------------
    def encode_column(self, key: str, string_values: np.ndarray) -> np.ndarray:
        """Encode one key's string column to value indices (vectorized).

        Unknown values map to NOT_FOUND. Used by the synthetic feature
        derivation where every row carries the same fixed keys.
        """
        ki = self.key_index(key)
        if ki == NOT_FOUND:
            return np.full(len(string_values), NOT_FOUND, dtype=np.int32)
        rev = self._val_rev[ki]
        return np.fromiter(
            (rev.get(v, NOT_FOUND) for v in string_values), dtype=np.int32, count=len(string_values)
        )

    def decode_pairs(self, key_idx: np.ndarray, val_idx: np.ndarray) -> list[tuple[str, str]]:
        return [
            (self.keys[k], self.values[k][v]) for k, v in zip(key_idx, val_idx)
        ]

    # --- persistence (reference tag.go:111-170, 276-317) ------------------
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            for ki, key in enumerate(self.keys):
                vals = "|".join(_escape(v) for v in self.values[ki])
                f.write(f"{_escape(key)}={vals}\n")

    @classmethod
    def load(cls, path: str) -> "TagIndex":
        keys: list[str] = []
        values: list[list[str]] = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                key, _, vals = line.partition("=")
                keys.append(_unescape(key))
                values.append([_unescape(v) for v in vals.split("|")] if vals else [])
        return cls(keys=keys, values=values)
