"""mkgmap_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the data-processing capabilities of
openstreetmap/mkgmap (reference at /root/reference, read-only) expressed as
Ray Data pipelines over zero-copy Arrow batches:

- fixed-point coordinate model mirroring ``imgfmt/app/Coord.java`` (map unit
  = 360/2^24 degrees, high precision = 2^30),
- Liang-Barsky / Sutherland-Hodgman clipping (``general/LineClipper.java``,
  ``util/ShapeSplitter.java``),
- Douglas-Peucker simplification with preserved points
  (``filters/DouglasPeuckerFilter.java``),
- MapSplitter-style quadtree tile refinement (``build/MapSplitter.java``),
- point-in-polygon and kNN joins via per-partition indexes in actor pools
  (``reader/osm/LocationHook.java``, ``util/KdTree.java``),
- plus large-scale training-data operators (dedup, MinHash-LSH, SimHash,
  ANN similarity search, text analysis) over image+caption tables.

Nothing here calls ``ray.init``; callers own the Ray session.
"""

__version__ = "0.1.0"
