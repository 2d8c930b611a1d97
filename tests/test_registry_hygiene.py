"""Registry hygiene: the registry dict is last-wins on name
collisions, so a duplicated key silently SHADOWS an older entry — its
query callable is replaced and the old operator loses its correctness
surface without any error. Round 7 hit exactly this (a near-duplicate
session-window entry shadowed the original; caught only by comparing
decorator-name counts to registry size). This pins the audit.
"""

from __future__ import annotations

import collections
import glob
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "build_datawarehouse_demo_spark")


def _decorator_names() -> list[str]:
    names: list[str] = []
    for p in glob.glob(os.path.join(PKG, "registry_*.py")):
        src = open(p).read()
        names += re.findall(r'@register\(\s*\n?\s*"([a-z0-9_]+)"', src)
        names += re.findall(r'register_sql\(\s*\n?\s*"([a-z0-9_]+)"', src)
    return names


def test_no_duplicate_registry_names():
    names = _decorator_names()
    dups = [k for k, c in collections.Counter(names).items() if c > 1]
    assert not dups, (
        f"duplicate registry keys {dups}: the registry dict is last-wins, "
        "so one of each pair is silently shadowed — rename or remove"
    )


def test_registry_size_matches_registrations(spark):
    from build_datawarehouse_demo_spark import registry

    names = _decorator_names()
    q = registry.queries()
    assert len(q) == len(names), (
        f"{len(names)} registrations but {len(q)} registry keys — a "
        "collision or a registration function not wired into _load_all"
    )
    assert set(q) == set(names)


def test_every_query_has_an_oracle(spark):
    """Every entry is oracle-checked; genuinely non-SQL-expressible
    ops would go on an explicit allowlist here (currently empty — the
    full surface is hash-checked)."""
    from build_datawarehouse_demo_spark import registry

    rows_only_allowlist: set[str] = set()
    missing = set(registry.queries()) - set(registry.oracle_sql()) - rows_only_allowlist
    assert not missing, f"entries without an oracle: {sorted(missing)}"
