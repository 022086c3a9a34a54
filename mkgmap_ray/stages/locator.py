"""Country-name normalization (``build/Locator.java`` +
``LocatorConfig.xml`` semantics).

The reference maps free-form country tag values (case variants, "The X"
forms, native spellings) to one canonical country record before address
indexing (``Locator.java:~100-200``, applied at
``MapBuilder.java:404-410``). Engine form: the variant table is built
driver-side (dimension-sized), broadcast via the task closure, and
applied vectorized with a pandas dict map inside ``map_batches``.
"""

from __future__ import annotations

import pandas as pd


def build_variants(canonical_names: list[str]) -> dict[str, str]:
    """Variant → canonical map: case-insensitive plus common prefix
    forms (the LocatorConfig variant-list analogue)."""
    out: dict[str, str] = {}
    for name in canonical_names:
        for v in (
            name,
            name.lower(),
            name.upper(),
            name.title(),
            f"The {name.title()}",
            f"the {name.lower()}",
        ):
            out[v.strip().lower()] = name
    return out


class Locator:
    def __init__(self, canonical_names: list[str]):
        self.variants = build_variants(canonical_names)

    def normalize(self, value: str | None) -> str | None:
        if value is None:
            return None
        return self.variants.get(value.strip().lower())

    def normalize_series(self, col: pd.Series) -> pd.Series:
        return (
            col.astype("string").str.strip().str.lower().map(self.variants)
        ).astype("string")
