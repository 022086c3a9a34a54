"""Canonical Arrow schemas for the engine's tables.

- ``FEATURES``: the geometry table (the analogue of the reference's
  ``MapPoint``/``MapLine``/``MapShape`` stream, ``general/MapElement.java``).
  Coordinates are high-precision fixed point (2^30 per 360°,
  ``imgfmt/app/Coord.java:27-58``), stored as list<int32> per feature.
- ``IMAGES``: the image+caption payload table per BASELINE.json input_hint.

Geometry stages must project away ``bytes`` (join back by ``image_id`` at
sinks) — the analogue of the reference's used-tags projection pushdown
(``reader/osm/OsmHandler.java:60-128``).
"""

from __future__ import annotations

import pyarrow as pa

KIND_POINT = 0
KIND_LINE = 1
KIND_SHAPE = 2

FEATURES = pa.schema(
    [
        pa.field("feature_id", pa.int64()),
        pa.field("kind", pa.int8()),
        pa.field("lat_hp", pa.list_(pa.int32())),
        pa.field("lon_hp", pa.list_(pa.int32())),
        pa.field("min_res", pa.int16()),
        pa.field("max_res", pa.int16()),
        pa.field("image_id", pa.string()),
    ]
)

IMAGES = pa.schema(
    [
        pa.field("image_id", pa.string()),
        pa.field("bytes", pa.binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
        pa.field("caption", pa.string()),
        pa.field("phash", pa.int64()),
    ]
)
