"""Large-scale training-data operations: deduplication, similarity search,
text analysis, multimodal plumbing. First-class operators alongside the
annotation chain (they share the same Dataset/batch conventions)."""
