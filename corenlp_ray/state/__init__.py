"""Lineage manifests and checkpoint-resume (the noClobber analogue)."""
