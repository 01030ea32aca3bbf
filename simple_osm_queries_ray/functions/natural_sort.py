"""Natural (number-prefix-aware) string ordering used for tag-value dictionaries.

Reimplements the comparator of ``/root/reference/src/common/sort.go:10-118``:

- every digit, ``-`` and ``.`` character of the string (from *anywhere* in the
  string, in order) is collected; if the collected text forms a valid number
  (optional leading ``-``, at most one ``.``), the string "contains a number
  prefix" with that numeric value;
- two strings that both contain number prefixes order by the numeric value;
  ties order the pure number before the number-with-text;
- otherwise plain lexicographic ordering.

The value dictionary of every tag key is sorted with this ordering at build
time (``src/index/tag.go:58-67``) so that range operators compare dictionary
indices as integers (``src/query/filter.go:117-124``).
"""

from __future__ import annotations

import functools


def _extract_number_prefix(s: str) -> str:
    # Collect digits / '-' / '.' from the whole string (reference
    # extractNumberPrefix, src/common/sort.go:78-91 — note: not only a prefix).
    collected = "".join(c for c in s if c.isdigit() or c in "-.")
    return collected if _is_number(collected) else ""


def _is_number(s: str) -> bool:
    if not s:
        return False
    seen_dot = False
    for i, c in enumerate(s):
        if c == "-":
            if i != 0:
                return False
        elif c == ".":
            if seen_dot:
                return False
            seen_dot = True
        elif not c.isdigit():
            return False
    # "-" or "." alone parse as numbers by the loop above but not by ParseFloat;
    # Go's isNumber accepts them and ParseFloat then fails silently -> value 0.
    return True


def _sortable(s: str):
    prefix = _extract_number_prefix(s)
    contains = prefix != ""
    is_number = contains and len(prefix) == len(s)
    try:
        number = float(prefix) if contains else 0.0
    except ValueError:
        number = 0.0
    return (s, contains, is_number, number)


def is_less_than(a: str, b: str) -> bool:
    """True iff ``a`` sorts before ``b`` (reference IsLessThan, sort.go:71-76)."""
    sa, sb = _sortable(a), _sortable(b)
    if sa[1] and sb[1]:
        if sa[3] == sb[3]:
            return sa[2]  # the pure number wins ties (sort.go:19-24)
        return sa[3] < sb[3]
    return sa[0] < sb[0]


def natural_sorted(values: list[str]) -> list[str]:
    """Sort values with the natural ordering (reference Sort, sort.go:46-69).

    The reference trims whitespace of every value before sorting and keeps the
    trimmed value (``sort.go:49``).
    """
    trimmed = [v.strip() for v in values]

    def cmp(a: str, b: str) -> int:
        if is_less_than(a, b):
            return -1
        if is_less_than(b, a):
            return 1
        return 0

    return sorted(trimmed, key=functools.cmp_to_key(cmp))
