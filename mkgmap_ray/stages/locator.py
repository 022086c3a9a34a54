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


# Country name/variant -> 3-letter Garmin ISO code
# (``build/LocatorConfig.java:270-283`` + ``resources/LocatorConfig.xml``
# ``<country abr=...><variant>`` entries — a representative subset; the
# full table is configuration data loaded the same way).
COUNTRY_ISO: dict[str, str] = {}


def _add_iso(iso: str, *names: str) -> None:
    for n in (iso[:2],) + names:
        COUNTRY_ISO[n] = iso
        COUNTRY_ISO[n.upper()] = iso
    COUNTRY_ISO[iso] = iso


_add_iso("DEU", "Germany", "Deutschland")
_add_iso("GBR", "United Kingdom", "UK", "Great Britain")
_add_iso("FRA", "France")
_add_iso("USA", "United States", "US", "United States of America")
_add_iso("ESP", "Spain", "España")
_add_iso("ITA", "Italy", "Italia")
_add_iso("NLD", "Netherlands", "Nederland", "NL")
_add_iso("BEL", "Belgium", "België", "Belgique")
_add_iso("AUT", "Austria", "Österreich", "AT")
_add_iso("CHE", "Switzerland", "Schweiz", "Suisse", "CH")
_add_iso("POL", "Poland", "Polska", "PL")
_add_iso("CZE", "Czechia", "Česko", "Czech Republic", "CZ")
_add_iso("DNK", "Denmark", "Danmark", "DK")
_add_iso("SWE", "Sweden", "Sverige", "SE")
_add_iso("NOR", "Norway", "Norge", "NO")
_add_iso("FIN", "Finland", "Suomi", "FI")
_add_iso("PRT", "Portugal", "PT")
_add_iso("IRL", "Ireland", "Éire", "IE")
_add_iso("CAN", "Canada", "CA")
_add_iso("AUS", "Australia", "AU")
_add_iso("JPN", "Japan", "日本", "JP")
_add_iso("AFG", "Afghanistan", "AF")
_add_iso("ALB", "Albania", "Shqipëria", "AL")
_add_iso("DZA", "Algeria", "Algérie", "DZ")


def country_iso_series(col: pd.Series) -> pd.Series:
    """``CountryISOFilter`` semantics: exact lookup, then
    ``upper().trim()`` retry; unknown values pass through unchanged
    (``osmstyle/actions/CountryISOFilter.java:30-38``)."""
    col = col.astype("string")
    hit = col.map(COUNTRY_ISO)
    retry = col.str.upper().str.strip().map(COUNTRY_ISO)
    return hit.fillna(retry).fillna(col)
