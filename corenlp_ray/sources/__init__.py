"""Sources: page readers and deterministic synthetic page generation."""
