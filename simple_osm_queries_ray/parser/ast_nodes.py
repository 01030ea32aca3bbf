"""AST for the soq query language.

Mirrors the expression classes of the reference
(``/root/reference/src/query/statement.go``, ``src/query/filter.go``,
``src/query/location.go``) but as inert dataclasses: compilation to a Ray
Data plan happens in ``pipelines/query.py`` instead of a per-feature
interpreter.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Union


class BinOp(enum.Enum):
    EQ = "="
    NEQ = "!="
    GT = ">"
    GTE = ">="
    LT = "<"
    LTE = "<="

    @property
    def is_comparison(self) -> bool:
        # reference operator.go:36-39: > >= < <= but not = / !=
        return self in (BinOp.GT, BinOp.GTE, BinOp.LT, BinOp.LTE)


class LogicOp(enum.Enum):
    AND = "AND"
    OR = "OR"


@dataclass(frozen=True)
class BboxLocation:
    minlon: float
    minlat: float
    maxlon: float
    maxlat: float


@dataclass(frozen=True)
class ContextAwareLocation:
    """`this` — candidate cells derive from the outer feature's geometry.

    ``buffer_deg`` implements the reference's PLANNED ``this.buffer(5m)``
    location modifier (``/root/reference/README.md:155-181`` — documented
    but never built there; the `LocationExpression` seam at
    ``src/query/location.go:14-19`` is where it would have gone): when set,
    the sub-statement matches inner features within that planar-degree
    radius of the outer feature instead of by membership. ``5m`` in query
    text is converted at parse time (meters / 111320, the flat-earth
    approximation our degree-space geometry uses throughout)."""

    buffer_deg: float | None = None


@dataclass(frozen=True)
class CircleLocation:
    """``circle(lon, lat, r[m])`` — an engine extension through the seam the
    reference reserved for new location types (``GeometryIndex`` /
    ``LocationExpression``, ``src/query/location.go:14-19``; its README
    names bbox as merely the first of the planned location expressions).
    Radius is planar degrees (``m`` suffix converts at parse time,
    meters / 111320, the engine-wide flat-earth convention). Nodes match by
    point-in-circle; ways/relations by closest-point-of-bbox distance —
    both exact in degree space."""

    lon: float
    lat: float
    radius_deg: float

    def enclosing_bbox(self) -> "BboxLocation":
        return BboxLocation(
            self.lon - self.radius_deg,
            self.lat - self.radius_deg,
            self.lon + self.radius_deg,
            self.lat + self.radius_deg,
        )


Location = Union[BboxLocation, CircleLocation, ContextAwareLocation]


@dataclass(frozen=True)
class TagFilter:
    """key <op> value on dictionary-encoded tags (filter.go:103-128).

    ``key_index`` / ``value_index`` are resolved dictionary indices
    (NOT_FOUND = -1 when the string is absent). A feature without the key
    never matches — including for ``!=``.
    """

    key_index: int
    value_index: int
    op: BinOp


@dataclass(frozen=True)
class KeyFilter:
    """key=* / key!=* — key presence (filter.go:150-156)."""

    key_index: int
    should_be_set: bool


@dataclass(frozen=True)
class LogicalFilter:
    a: "FilterExpr"
    b: "FilterExpr"
    op: LogicOp


@dataclass(frozen=True)
class NegatedFilter:
    base: "FilterExpr"


@dataclass(frozen=True)
class SubStatementFilter:
    """this.<type>{...} semi-join (filter.go:182-337)."""

    statement: "Statement"


FilterExpr = Union[TagFilter, KeyFilter, LogicalFilter, NegatedFilter, SubStatementFilter]


@dataclass(frozen=True)
class Statement:
    location: Location
    query_type: str  # nodes | ways | relations | child_relations
    filter: FilterExpr


@dataclass(frozen=True)
class Query:
    statements: tuple[Statement, ...]


def required_key_indices(expr: "FilterExpr") -> frozenset:
    """Key indices every matching feature MUST carry, derived conservatively
    from the filter tree. Both tag predicates and ``key=*`` require presence
    (the reference's no-key => false rule holds even for ``!=``,
    filter.go:103-128); AND unions, OR intersects, NOT and sub-statements
    contribute nothing. Used for zone-map partition skipping — a partition
    whose key set lacks a required key cannot hold a match."""
    if isinstance(expr, TagFilter):
        return frozenset([expr.key_index]) if expr.key_index >= 0 else frozenset()
    if isinstance(expr, KeyFilter):
        if expr.should_be_set and expr.key_index >= 0:
            return frozenset([expr.key_index])
        return frozenset()
    if isinstance(expr, LogicalFilter):
        a = required_key_indices(expr.a)
        b = required_key_indices(expr.b)
        return a | b if expr.op is LogicOp.AND else a & b
    return frozenset()


def and_level_tag_constraints(expr: "FilterExpr") -> dict:
    """{key_index: [(op_str, value_index), ...]} for every TagFilter
    reachable through AND edges only (OR/NOT/sub-statements stop the
    descent — a constraint under OR is not required of every match).
    Drives value-RANGE zone-map pruning; != contributes only presence
    (its complement spans the whole range)."""
    out: dict = {}
    stack = [expr]
    while stack:
        e = stack.pop()
        if isinstance(e, TagFilter) and e.key_index >= 0:
            if e.op is not BinOp.NEQ and e.value_index >= 0:
                out.setdefault(e.key_index, []).append((e.op.value, e.value_index))
            else:
                out.setdefault(e.key_index, [])
        elif isinstance(e, KeyFilter) and e.should_be_set and e.key_index >= 0:
            out.setdefault(e.key_index, [])
        elif isinstance(e, LogicalFilter) and e.op is LogicOp.AND:
            stack.append(e.a)
            stack.append(e.b)
    return out
