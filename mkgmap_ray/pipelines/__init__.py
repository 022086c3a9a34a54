"""End-to-end pipelines (flagship tiling job, testdata-derived queries)."""
