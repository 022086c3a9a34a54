"""Run state: lineage manifests + resume (the reference's TDB-manifest
analogue, ``combiners/TdbBuilder.java``, plus the north rule's
resumable-checkpoint requirement)."""
