"""Stat-descriptor DSL of the reference CLI: ``name=stat(values[,weights])``.

Reference parser: ``/root/reference/src/exactextract/src/utils.cpp:79-128``.
Descriptors resolve to entries of the Spark stat plan; the default result
name is ``{values}_{stat}[_{weights}]`` exactly as the CLI builds it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .stats import ALL_STATS

_RE = re.compile(r"^(?:(?P<name>\w+)=)?(?P<stat>\w+)\((?P<args>[\w,]+)\)$")


@dataclass(frozen=True)
class StatDescriptor:
    name: str
    stat: str
    values: str
    weights: str | None = None


def parse_stat_descriptor(descriptor: str) -> StatDescriptor:
    m = _RE.match(descriptor.strip())
    if not m:
        raise ValueError(f"Invalid stat descriptor: {descriptor!r}")
    stat = m.group("stat")
    if stat not in ALL_STATS:
        raise ValueError(f"unknown stat {stat!r} in descriptor {descriptor!r}")
    args = m.group("args").split(",")
    values = args[0]
    weights = args[1] if len(args) > 1 else None
    name = m.group("name")
    if not name:
        name = f"{values}_{stat}" + (f"_{weights}" if weights else "")
    return StatDescriptor(name=name, stat=stat, values=values, weights=weights)
