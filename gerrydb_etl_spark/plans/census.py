"""Census PL 94-171 column metadata functions (metadata plane).

Reimplements the behavioral contract of the reference's label parser
and alias generator (pl_pop_table_columns.py:66-116, 171-211):
longform variable labels → canonical demographic names, and the
three equivalent column-name formats across Census vintages. Pure
Python — this feeds dimension tables (column defs + alias maps), not
per-row dataflow.
"""

from __future__ import annotations

# public Census demographic label vocabulary → short names
COL_LABELS = {
    "Asian": "asian",
    "White": "white",
    "Black": "black",
    "Some Other Race": "other",
    "Black or African American": "black",
    "Native Hawaiian and Other Pacific Islander": "nhpi",
    "American Indian and Alaska Native": "amin",
    "Total": "total",
    "Population of one race": "one_race",
    "Population of two or more races": "two_or_more_races",
    "Population of two races": "two_races",
    "Population of three races": "three_races",
    "Population of four races": "four_races",
    "Population of five races": "five_races",
    "Population of six races": "six_races",
}

# overall-total columns duplicated across tables: (redundant → canonical)
REDUNDANT_TO_CANONICAL = {
    "P2_001N": "P1_001N",
    "P002001": "P001001",
    "P4_001N": "P3_001N",
    "P004001": "P003001",
}


def parse_label(label: str) -> tuple[str, str, bool | None]:
    """Parse a longform variable label into (cleaned label,
    canonical demographic name, hispanic flag).

    Semantics (pl_pop_table_columns.py:66-87): drop ':'; keep the
    last '!!' segment; strip 'alone'; repair the 2010 P004059 comma
    bug (', Some Other Race' → '; Some Other Race'); split on '; '
    and map each part through COL_LABELS. The hispanic flag is None
    unless the full label mentions Hispanic or Latino.
    """
    cleaned = label.replace(":", "").split("!!")[-1]
    cleaned = cleaned.replace("alone", "").strip()
    cleaned = cleaned.replace(", Some Other Race", "; Some Other Race")
    parts = cleaned.split("; ")
    canonical = "_".join(COL_LABELS.get(p, p) for p in parts)
    if "Hispanic or Latino" in label:
        hispanic = "Not Hispanic or Latino" not in label
    else:
        hispanic = None
    return cleaned, canonical, hispanic


def column_aliases(name: str) -> list[str] | None:
    """The three equivalent formats of a PL 94-171 column name:
    2020 'P1_001N', 2010 'P001001', and long 'P0010001'. Returns None
    if the format is unrecognized (pl_pop_table_columns.py:90-116).
    """
    if name.startswith("P") and len(name) == 7 and name[2] == "_" and name.endswith("N"):
        table, col = name[1], name[3:6]
        return [name, f"P00{table}{col}", f"P00{table}0{col}"]
    if name.startswith("P00") and len(name) == 7:
        table, col = name[3], name[4:]
        return [f"P{table}_{col}N", name, f"P00{table}0{col}"]
    if name.startswith("P00") and len(name) == 8 and name[4] == "0":
        table, col = name[3], name[5:]
        return [f"P{table}_{col}N", f"P00{table}{col}", name]
    return None


def column_name(
    canonical: str, table: str, hispanic: bool | None
) -> str:
    """Assemble the engine-facing column name: hispanic_/non_hispanic_
    prefix, _pop/_vap suffix by table, with the hispanic_hispanic_pop
    degeneracy avoided (pl_pop_table_columns.py:171-183)."""
    prefix = "" if hispanic is None else ("hispanic_" if hispanic else "non_hispanic_")
    suffix = "_vap" if table in ("P3", "P4") else "_pop"
    if canonical.endswith("Hispanic or Latino"):
        name = prefix + suffix[1:]
    else:
        name = prefix + canonical + suffix
    return name.replace(" ", "_").lower()
