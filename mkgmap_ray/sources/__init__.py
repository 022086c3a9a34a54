"""Deterministic synthetic sources (the engine's ``ElementTestDataSource``
analogue, reference ``reader/test/ElementTestDataSource.java``) and IO
helpers."""

# --- source dispatch (MapReader.createMapReader analogue) --------------------


def reader_for(name: str):
    """Dispatch a resource name to its table reader
    (``reader/MapReader.createMapReader``, ``MapReader.java:38-66``: the
    loader list tries Polish, then synthetic, then OSM last; here the
    dispatch is by extension with OSM formats resolved exactly).

    Returns (kind, read_fn) where read_fn(paths, table="nodes"|...) →
    Dataset for the OSM family, and read_fn(paths) → Dataset for the
    Polish format.
    """
    low = name.lower()
    if low.endswith(".mp"):
        from .polish import read_mp

        return "polish", read_mp
    if low.endswith(".pbf"):
        from .pbf import read_pbf_table

        return "pbf", read_pbf_table
    if low.endswith(".o5m"):
        from .o5m import read_o5m_table

        return "o5m", read_o5m_table
    if low.endswith(".osm") or low.endswith(".osm.gz") or low.endswith(
        ".osm.xml"
    ):
        from .osmxml import read_osm_table

        return "osm", read_osm_table
    raise ValueError(f"don't know how to read {name!r}")
