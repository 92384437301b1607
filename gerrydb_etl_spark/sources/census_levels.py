"""Per-level Census API predicate builder (source-config dispatch).

The reference maps each geographic level to its Census API geo query
plus the ID columns that compose the geography key
(pl_pop_tables.py:76-110, a 9-way if/elif). Here it is a declarative
dispatch table: level → (for-clause, in-clause template, id column
order). Pure config — the source layer formats the request and the
id columns feed the horizontal key concat (§2.4 row 4).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LevelQuery:
    for_clause: str  # Census API 'for=' component
    in_clause: str  # 'in=' template over {fips}
    id_cols: tuple[str, ...]  # columns whose concat is the geo key


LEVELS: dict[str, LevelQuery] = {
    "state": LevelQuery("state:{fips}", "", ("state",)),
    "county": LevelQuery("county:*", "state:{fips}", ("state", "county")),
    "cousub": LevelQuery(
        "county subdivision:*", "state:{fips}", ("state", "county", "county subdivision")
    ),
    "tract": LevelQuery("tract:*", "state:{fips}", ("state", "county", "tract")),
    "bg": LevelQuery(
        "block group:*",
        "state:{fips} county:*",
        ("state", "county", "tract", "block group"),
    ),
    "block": LevelQuery(
        "block:*", "state:{fips} county:*", ("state", "county", "tract", "block")
    ),
    "place": LevelQuery("place:*", "state:{fips}", ("state", "place")),
    "vtd": LevelQuery(
        "voting district:*", "state:{fips} county:*", ("state", "county", "voting district")
    ),
    "aiannh": LevelQuery(
        "american indian area/alaska native area/hawaiian home land:*",
        "state:{fips}",
        ("american indian area/alaska native area/hawaiian home land",),
    ),
}


def level_query(level: str, fips: str) -> tuple[dict[str, str], tuple[str, ...]]:
    """Build the API query params + key columns for one work unit."""
    if level not in LEVELS:
        raise KeyError(f"unknown level {level!r}; known: {sorted(LEVELS)}")
    spec = LEVELS[level]
    params = {"for": spec.for_clause.format(fips=fips)}
    if spec.in_clause:
        params["in"] = spec.in_clause.format(fips=fips)
    return params, spec.id_cols
